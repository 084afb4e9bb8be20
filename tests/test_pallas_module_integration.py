"""DGGCN/DGPHGCN1 with use_pallas=True must match the plain-XLA module path
(which itself is parity-tested against the torch reference)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsgcn_tpu.graph import Graph
from dsgcn_tpu.ops.gcn import DGGCN, DGPHGCN1

RNG = np.random.default_rng(4)


def _x(n=2, t=12, v=25, c=16):
    return jnp.asarray(RNG.standard_normal((n, t, v, c)).astype(np.float32))


def _perturb_gates(params):
    """alpha/beta init to zero — randomize so dynamic branches contribute."""
    params = jax.tree.map(lambda x: x, params)  # copy
    import flax
    params = flax.core.unfreeze(params)
    for k in ("alpha", "beta"):
        params[k] = jnp.asarray(
            RNG.uniform(-0.5, 0.5, params[k].shape).astype(np.float32))
    return params


@pytest.mark.parametrize("subset_wise", [False, True])
def test_dggcn_pallas_matches_dense(subset_wise):
    g = Graph(layout="nturgb+d", mode="random", seed=2)
    a = DGGCN(32, A_init=g.A.astype(np.float32), subset_wise=subset_wise)
    b = DGGCN(32, A_init=g.A.astype(np.float32), subset_wise=subset_wise,
              use_pallas=True, pallas_interpret=True)
    x = _x()
    variables = a.init(jax.random.PRNGKey(0), x, train=False)
    params = _perturb_gates(variables["params"])
    variables = {"params": params, "batch_stats": variables["batch_stats"]}
    ya = a.apply(variables, x, train=False)
    yb = b.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               rtol=2e-5, atol=2e-5)


def test_dggcn_fused_inkernel_preconv_matches_dense():
    """eval_kernel='fusedpre' (opt-in; measured slower e2e on v5e — see
    ops/gcn.py) computes the BN-folded pre-conv in-kernel — must match the
    plain-XLA module to tolerance.  Also perturbs the pre_bn running stats
    so the BN fold is non-trivial."""
    g = Graph(layout="nturgb+d", mode="random", seed=2)
    a = DGGCN(128, A_init=g.A.astype(np.float32), subset_wise=True)
    b = DGGCN(128, A_init=g.A.astype(np.float32), subset_wise=True,
              use_pallas=True, pallas_interpret=True, eval_kernel="fusedpre")
    x = _x(c=64)
    variables = a.init(jax.random.PRNGKey(0), x, train=False)
    params = _perturb_gates(variables["params"])
    stats = jax.tree.map(
        lambda s: s + jnp.asarray(
            RNG.uniform(0.01, 0.2, s.shape).astype(np.float32)),
        variables["batch_stats"])
    variables = {"params": params, "batch_stats": stats}
    ya = a.apply(variables, x, train=False)
    yb = b.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kw", [
    dict(),
    dict(decompose=True, node_attention=True),
    dict(decompose=True, node_attention=True, edge_attention=True),
    dict(decompose=True, node_attention=True, edge_attention=True,
         target_specific=True),
    dict(decompose=True, edge_attention=True, sub_att=False),
])
def test_dgphgcn1_pallas_matches_dense(kw):
    g = Graph(layout="nturgb+d", mode="random", seed=2)
    common = dict(A_init=g.A.astype(np.float32), edge_type=g.edge_type,
                  node_type=np.array(g.node_type), ratio=0.25, **kw)
    a = DGPHGCN1(32, **common)
    b = DGPHGCN1(32, use_pallas=True, pallas_interpret=True, **common)
    x = _x()
    variables = a.init(jax.random.PRNGKey(0), x, train=False)
    params = _perturb_gates(variables["params"])
    variables = {"params": params, "batch_stats": variables["batch_stats"]}
    # param trees must be interchangeable between the two paths
    vb = b.init(jax.random.PRNGKey(0), x, train=False)
    assert (jax.tree.structure(vb["params"])
            == jax.tree.structure(variables["params"]))
    ya = a.apply(variables, x, train=False)
    yb = b.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(yb), np.asarray(ya),
                               rtol=2e-5, atol=2e-5)


def test_dgphgcn1_pallas_grads_match():
    g = Graph(layout="nturgb+d", mode="random", seed=2)
    common = dict(A_init=g.A.astype(np.float32), edge_type=g.edge_type,
                  node_type=np.array(g.node_type), ratio=0.25,
                  decompose=True, node_attention=True, edge_attention=True)
    a = DGPHGCN1(32, **common)
    b = DGPHGCN1(32, use_pallas=True, pallas_interpret=True, **common)
    x = _x()
    variables = a.init(jax.random.PRNGKey(0), x, train=False)
    params = _perturb_gates(variables["params"])
    stats = variables["batch_stats"]

    def loss(m, p):
        y, _ = m.apply({"params": p, "batch_stats": stats}, x, train=True,
                       mutable=["batch_stats"])
        return jnp.sum(y ** 2)

    ga = jax.grad(lambda p: loss(a, p))(params)
    gb = jax.grad(lambda p: loss(b, p))(params)
    flat_a = jax.tree.leaves_with_path(ga)
    flat_b = {jax.tree_util.keystr(k): v for k, v in jax.tree.leaves_with_path(gb)}
    for k, va in flat_a:
        vb = flat_b[jax.tree_util.keystr(k)]
        # atol 5e-3: grads of conv biases feeding train-mode BN are exactly 0
        # mathematically (BN shift invariance) — computed values are pure
        # cancellation noise in both paths.
        np.testing.assert_allclose(np.asarray(vb), np.asarray(va),
                                   rtol=1e-3, atol=5e-3,
                                   err_msg=jax.tree_util.keystr(k))


def test_dggcn_fused_block_eval_with_bn_stats():
    """Eval-mode mega-fused DGGCN block (ops/pallas/dggcn_block.py): with
    non-trivial BN running stats and the channel-changing residual path,
    the one-kernel block must match the unfused module."""
    g = Graph(layout="nturgb+d", mode="random", seed=2)
    a = DGGCN(32, A_init=g.A.astype(np.float32))
    b = DGGCN(32, A_init=g.A.astype(np.float32), use_pallas=True,
              pallas_interpret=True)
    x = _x(c=16)                               # c != out -> down path
    variables = a.init(jax.random.PRNGKey(0), x, train=False)
    rng = np.random.default_rng(11)
    params = jax.tree.map(
        lambda p: jnp.asarray((rng.standard_normal(p.shape) * 0.4
                               + (1.0 if p.ndim == 1 else 0.0))
                              .astype(np.float32)), variables["params"])
    stats = jax.tree.map(
        lambda s: jnp.abs(jnp.asarray(
            rng.standard_normal(s.shape).astype(np.float32))) + 0.2,
        variables["batch_stats"])
    v = {"params": params, "batch_stats": stats}
    ya = a.apply(v, x, train=False)
    yb = b.apply(v, x, train=False)
    scale = float(jnp.max(jnp.abs(ya))) + 1e-9
    assert float(jnp.max(jnp.abs(ya - yb))) / scale < 2e-6
