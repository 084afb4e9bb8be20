"""Probe: block-diagonal BD aggregation kernel (ops/pallas/bd_agg.py) vs the
round-3 fused dyn-graph kernel and the XLA reference.

Usage:
    python benchmarks/bd_agg_probe.py cpu    # interpret-mode numerics only
    python benchmarks/bd_agg_probe.py        # on-chip numerics + timing

Stage shapes are the DS-GCN (dgphgcn1, ratio=0.125) ladder; N=2048 matches
the round-3 mega-block ablation regime (b1024 x M=2).
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def make_inputs(rng, N, T, V, K, Cm, edge, dtype="float32"):
    f = lambda *s: rng.standard_normal(s).astype(dtype)  # noqa: E731
    KC = K * Cm
    d = dict(pre=f(N, T, V, KC), x1=f(N, K, Cm, V) * 0.3,
             x2=f(N, K, Cm, V) * 0.3, A=f(K, V, V) * 0.1,
             a=f(K) * 0.5, b=f(K) * 0.5)
    if edge:
        E = 15
        d["ew"] = f(Cm, E * Cm) * 0.2
        d["eb"] = f(E * Cm) * 0.1
        cls = rng.integers(0, E, size=(V, V))
        sel = np.zeros((E, V, V), dtype)
        for e in range(E):
            sel[e] = cls == e
        d["sel"] = sel
    return d


def run_ref(jnp, d, K, Cm, edge_k):
    from dsgcn_tpu.ops.pallas.dyn_graph import reference_dyn_graph_agg
    return reference_dyn_graph_agg(
        d["pre"], d["x1"], d["x2"], d["A"], d["a"], d["b"],
        d.get("ew"), d.get("eb"), d.get("sel"), K=K, Cm=Cm, edge_k=edge_k)


def bd_args(jnp, d, K, Cm, edge_k):
    """Host-side input transforms for the BD kernel (the XLA-fused part)."""
    N, T, V, KC = d["pre"].shape
    pre2 = d["pre"].reshape(N, T, V * KC)
    x1t = jnp.transpose(d["x1"], (0, 1, 3, 2))
    kw = dict(K=K, Cm=Cm, edge_k=edge_k)
    if edge_k >= 0:
        E = d["sel"].shape[0]
        q1 = d["x1"][:, edge_k]                       # (N, Cm, V)
        q2 = d["x2"][:, edge_k]
        p1 = jnp.einsum("ncv,cf->nfv", q1, d["ew"]).reshape(N, E, Cm, V)
        p2 = jnp.einsum("ncv,cf->nfv", q2, d["ew"]).reshape(N, E, Cm, V)
        p1t = jnp.transpose(p1, (0, 1, 3, 2))         # (N, E, V, Cm)
        ebias = jnp.einsum("evw,ec->vcw", d["sel"],
                           d["eb"].reshape(E, Cm))    # (V, Cm, W)
        kw.update(p1t=p1t, p2=p2, edge_sel=d["sel"], ebias=ebias)
    return (pre2, x1t, d["x2"], d["A"], d["a"], d["b"]), kw


def run_bd(jnp, d, K, Cm, edge_k, interpret=False):
    from dsgcn_tpu.ops.pallas.bd_agg import bd_dyn_graph_agg
    args, kw = bd_args(jnp, d, K, Cm, edge_k)
    N, T, V, KC = d["pre"].shape
    y2 = bd_dyn_graph_agg(*args, interpret=interpret, **kw)
    return y2.reshape(N, T, V, KC)


def run_bdps(jnp, d, K, Cm, interpret=False):
    from dsgcn_tpu.ops.pallas.bd_agg import bd_dyn_graph_agg_subset
    N, T, V, KC = d["pre"].shape
    pre2 = d["pre"].reshape(N, T, V * KC)
    x1t = jnp.transpose(d["x1"], (0, 1, 3, 2))
    y2 = bd_dyn_graph_agg_subset(pre2, x1t, d["x2"], d["A"], d["a"], d["b"],
                                 K=K, Cm=Cm, interpret=interpret)
    return y2.reshape(N, T, V, KC)


def run_old(jnp, d, K, Cm, edge_k):
    from dsgcn_tpu.ops.pallas.dyn_graph import fused_dyn_graph_agg
    return fused_dyn_graph_agg(
        d["pre"], d["x1"], d["x2"], d["A"], d["a"], d["b"],
        d.get("ew"), d.get("eb"), d.get("sel"), K, Cm, edge_k, 15, False)


def relerr(jnp, a, b):
    # jitted: eager op-by-op dispatch over the remote tunnel is minutes-slow
    import jax
    f = jax.jit(lambda x, y: jnp.max(jnp.abs(x - y))
                / (jnp.max(jnp.abs(y)) + 1e-9))
    return float(f(a, b))


def bench(fn, args, iters=8, reps=3):
    s = float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        s = float(out)  # noqa: F841
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    cpu = len(sys.argv) > 1 and sys.argv[1] == "cpu"
    import jax
    if cpu:
        jax.config.update("jax_platforms", "cpu")
    else:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    rng = np.random.default_rng(0)

    if cpu:
        for K, Cm, edge_k in ((3, 8, -1), (3, 8, 1), (3, 16, 1), (3, 32, 1)):
            d = {k: jnp.asarray(v) for k, v in
                 make_inputs(rng, 2, 10, 25, K, Cm, edge_k >= 0).items()}
            ref = run_ref(jnp, d, K, Cm, edge_k)
            bd = run_bd(jnp, d, K, Cm, edge_k, interpret=True)
            print(f"K={K} Cm={Cm} edge={edge_k}: interp rel-err "
                  f"{relerr(jnp, bd, ref):.2e}", flush=True)
        for K, Cm in ((8, 16), (3, 8)):
            d = {k: jnp.asarray(v) for k, v in
                 make_inputs(rng, 2, 10, 25, K, Cm, False).items()}
            ref = run_ref(jnp, d, K, Cm, -1)
            ps = run_bdps(jnp, d, K, Cm, interpret=True)
            print(f"K={K} Cm={Cm} SUBSET: interp rel-err "
                  f"{relerr(jnp, ps, ref):.2e}", flush=True)
        return

    N = 1024
    shapes = ((3, 8, 100, 1), (3, 16, 50, 1), (3, 32, 25, 1),
              (8, 16, 100, -1), (8, 32, 50, -1), (8, 64, 25, -1))
    if len(sys.argv) > 1:   # e.g. "0:3" to run a shape subset
        lo, hi = map(int, sys.argv[1].split(":"))
        shapes = shapes[lo:hi]
    for K, Cm, T, edge_k in shapes:
        # TUNNEL DISCIPLINE (the round-3-style probe "hangs" were all this):
        # 1. arrays ride as jit ARGUMENTS, never closures — a captured
        #    device array becomes an MLIR constant whose value is fetched
        #    back over the tunnel during lowering (minutes for tiny arrays);
        # 2. no eager device ops (slicing/compare) — slice in NUMPY before
        #    transfer; every computation is jitted;
        # 3. persistent compile cache on (set in main).
        dn = make_inputs(rng, N, T, 25, K, Cm, edge_k >= 0)
        dsn = {k: (v[:4] if v.ndim and v.shape[0] == N else v)
               for k, v in dn.items()}
        d = {k: jnp.asarray(v) for k, v in dn.items()}
        ds = {k: jnp.asarray(v) for k, v in dsn.items()}
        _mark = lambda m: print(f"  [{m}]", file=sys.stderr, flush=True)  # noqa: E731
        fbd = jax.jit(lambda dd: run_bd(jnp, dd, K, Cm, edge_k).sum())
        fold = jax.jit(lambda dd: run_old(jnp, dd, K, Cm, edge_k).sum())
        _mark(f"K={K} Cm={Cm}: numerics")
        ref = jax.jit(lambda dd: run_ref(jnp, dd, K, Cm, edge_k))(ds)
        bd = jax.jit(lambda dd: run_bd(jnp, dd, K, Cm, edge_k))(ds)
        err = relerr(jnp, bd, ref)
        _mark("bench bd")
        tb = bench(fbd, (d,))
        _mark("bench old")
        to = bench(fold, (d,))
        print(f"K={K} Cm={Cm} T={T} edge={edge_k}: rel-err {err:.2e}  "
              f"bd {tb*1e6/N:6.2f} us/sample  old {to*1e6/N:6.2f}  "
              f"speedup {to/tb:5.2f}x", flush=True)
        if edge_k < 0:
            fps_ = jax.jit(lambda dd: run_bdps(jnp, dd, K, Cm).sum())
            ps = jax.jit(lambda dd: run_bdps(jnp, dd, K, Cm))(ds)
            errp = relerr(jnp, ps, ref)
            _mark("bench bdps")
            tp = bench(fps_, (d,))
            print(f"K={K} Cm={Cm} T={T} SUBSET: rel-err {errp:.2e}  "
                  f"bdps {tp*1e6/N:6.2f} us/sample  "
                  f"vs old {to/tp:5.2f}x  vs bd {tb/tp:5.2f}x", flush=True)


if __name__ == "__main__":
    main()
