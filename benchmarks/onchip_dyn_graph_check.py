"""On-chip compile + gradient check of the fused dynamic-graph kernel at
DGSTGCN stage shapes (wide no-edge, wide with edge attention, narrow).

Run from the repo root on the real TPU after any kernel/VMEM-plan change;
grad parity is asserted at the f32 noise floor measured against a float64
oracle (pallas and XLA deviate from f64 identically, ~1e-2 max-rel on dx2).
"""
import sys
sys.path.insert(0, ".")
import numpy as np, jax, jax.numpy as jnp, time
import dsgcn_tpu.ops.pallas.dyn_graph as dg

print("devices:", jax.devices())
rng = np.random.default_rng(0)

def run(N, T, V, K, Cm, edge_k=-1, label=""):
    KC = K*Cm
    pre = jnp.asarray(rng.standard_normal((N,T,V,KC)).astype(np.float32))
    x1 = jnp.asarray(rng.standard_normal((N,K,Cm,V)).astype(np.float32))
    x2 = jnp.asarray(rng.standard_normal((N,K,Cm,V)).astype(np.float32))
    A = jnp.asarray(rng.standard_normal((K,V,V)).astype(np.float32)*0.04)
    al = jnp.asarray(rng.uniform(-.5,.5,K).astype(np.float32))
    be = jnp.asarray(rng.uniform(-.5,.5,K).astype(np.float32))
    if edge_k >= 0:
        ew = jnp.asarray(rng.standard_normal((Cm,15*Cm)).astype(np.float32)*0.1)
        eb = jnp.asarray(rng.standard_normal((15*Cm,)).astype(np.float32)*0.05)
        from dsgcn_tpu.graph import Graph
        sel = jnp.asarray(dg.edge_onehot(Graph(layout="nturgb+d", mode="spatial").edge_type))
    else:
        ew = eb = sel = None
    kg, tt = dg._bwd_plan(T, V, K, Cm, edge_k >= 0)
    print(f"{label}: plan kg={kg} tt={tt}")
    def loss(pre, x1, x2, A, al, be):
        y = dg.fused_dyn_graph_agg(pre, x1, x2, A, al, be, ew, eb, sel, K, Cm, edge_k, 15, False)
        return jnp.sum(y**2)
    g = jax.jit(jax.grad(loss, argnums=(0,1,2,3,4,5)))
    t0=time.time(); out = g(pre,x1,x2,A,al,be); jax.block_until_ready(out)
    print(f"{label}: compiled+ran in {time.time()-t0:.1f}s")
    # parity vs XLA reference on-chip
    def loss_ref(pre, x1, x2, A, al, be):
        y = dg.reference_dyn_graph_agg(pre, x1, x2, A, al, be, ew, eb, sel, K=K, Cm=Cm, edge_k=edge_k)
        return jnp.sum(y**2)
    gr = jax.jit(jax.grad(loss_ref, argnums=(0,1,2,3,4,5)))(pre,x1,x2,A,al,be)
    for i,(a,b) in enumerate(zip(out,gr)):
        err = float(jnp.max(jnp.abs(a-b))/(jnp.max(jnp.abs(b))+1e-9))
        assert err < 3e-2, (label, i, err)
    print(f"{label}: grad parity ok")

# dgstgcn wide stage (the round-2 OOM): K=8, Cm=64, T=15 after /4 stride, clip 60
run(128, 15, 25, 8, 64, label="dgstgcn-wide b128")
# dsgcn flagship wide stage with edge attention
run(128, 15, 25, 8, 32, edge_k=1, label="dsgcn-wide-edge b128")
# narrow first stage
run(128, 60, 25, 8, 8, label="dgstgcn-narrow b128")
print("ALL OK")
