"""Pallas fused dynamic-graph kernel: correctness vs the plain-XLA reference
path (interpret mode on CPU) + gradient checks through the custom VJP."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsgcn_tpu.ops.pallas.dyn_graph import (edge_onehot, fused_dyn_graph_agg,
                                            reference_dyn_graph_agg)
from dsgcn_tpu.graph import Graph

RNG = np.random.default_rng(0)


def _inputs(N=2, T=10, V=25, K=3, Cm=8, edge=False):
    pre = jnp.asarray(RNG.standard_normal((N, T, V, K * Cm)).astype(np.float32))
    x1 = jnp.asarray(RNG.standard_normal((N, K, Cm, V)).astype(np.float32))
    x2 = jnp.asarray(RNG.standard_normal((N, K, Cm, V)).astype(np.float32))
    A = jnp.asarray(RNG.standard_normal((K, V, V)).astype(np.float32) * 0.04)
    alpha = jnp.asarray(RNG.uniform(-0.5, 0.5, K).astype(np.float32))
    beta = jnp.asarray(RNG.uniform(-0.5, 0.5, K).astype(np.float32))
    if edge:
        ew = jnp.asarray(RNG.standard_normal((Cm, 15 * Cm)).astype(np.float32)
                         * 0.1)
        eb = jnp.asarray(RNG.standard_normal((15 * Cm,)).astype(np.float32)
                         * 0.05)
        g = Graph(layout="nturgb+d", mode="spatial")
        sel = jnp.asarray(edge_onehot(g.edge_type))
    else:
        ew, eb, sel = None, None, None
    return pre, x1, x2, A, alpha, beta, ew, eb, sel


@pytest.mark.parametrize("edge", [False, True])
def test_fused_matches_reference(edge):
    K, Cm = 3, 8
    args = _inputs(edge=edge)
    got = fused_dyn_graph_agg(*args, K, Cm, 1, 15, True)   # interpret mode
    want = reference_dyn_graph_agg(*args, K=K, Cm=Cm, edge_k=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_grads_match_reference():
    K, Cm = 3, 8
    pre, x1, x2, A, alpha, beta, _, _, _ = _inputs()

    def loss_fused(pre, x1, x2, A, alpha, beta):
        y = fused_dyn_graph_agg(pre, x1, x2, A, alpha, beta, None, None, None,
                                K, Cm, 1, 15, True)
        return jnp.sum(y ** 2)

    def loss_ref(pre, x1, x2, A, alpha, beta):
        y = reference_dyn_graph_agg(pre, x1, x2, A, alpha, beta, K=K, Cm=Cm)
        return jnp.sum(y ** 2)

    ga = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4, 5))(
        pre, x1, x2, A, alpha, beta)
    gb = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4, 5))(
        pre, x1, x2, A, alpha, beta)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fused_edge_grads():
    K, Cm = 3, 8
    pre, x1, x2, A, alpha, beta, ew, eb, sel = _inputs(edge=True)

    def loss(pre, x1, x2, A, alpha, beta, ew, eb):
        y = fused_dyn_graph_agg(pre, x1, x2, A, alpha, beta, ew, eb, sel,
                                K, Cm, 1, 15, True)
        return jnp.sum(y ** 2)

    def loss_ref(pre, x1, x2, A, alpha, beta, ew, eb):
        y = reference_dyn_graph_agg(pre, x1, x2, A, alpha, beta, ew, eb, sel,
                                    K=K, Cm=Cm, edge_k=1)
        return jnp.sum(y ** 2)

    ga = jax.grad(loss, argnums=tuple(range(8)))(pre, x1, x2, A, alpha, beta,
                                                 ew, eb)
    gb = jax.grad(loss_ref, argnums=tuple(range(8)))(pre, x1, x2, A, alpha,
                                                     beta, ew, eb)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("edge", [False, True])
def test_fused_multi_tile_grid(edge, monkeypatch):
    """Force nt>1 T-tiling: exercises the fwd tile loop and the bwd dG
    scratch accumulation across tiles (the wide-stage VMEM path)."""
    import dsgcn_tpu.ops.pallas.dyn_graph as dg
    monkeypatch.setattr(dg, "_t_tile", lambda T, V, KC, *a, **k: T // 2)
    K, Cm = 3, 8
    args = _inputs(T=12, edge=edge)
    got = dg.fused_dyn_graph_agg(*args, K, Cm, 1, 15, True)
    want = reference_dyn_graph_agg(*args, K=K, Cm=Cm, edge_k=1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)

    argn = tuple(range(8 if edge else 6))

    def loss(*a):
        full = list(a) + list(args[len(a):])
        y = dg.fused_dyn_graph_agg(*full, K, Cm, 1, 15, True)
        return jnp.sum(y ** 2)

    def loss_ref(*a):
        full = list(a) + list(args[len(a):])
        y = reference_dyn_graph_agg(*full, K=K, Cm=Cm, edge_k=1)
        return jnp.sum(y ** 2)

    ga = jax.grad(loss, argnums=argn)(*args[:len(argn)])
    gb = jax.grad(loss_ref, argnums=argn)(*args[:len(argn)])
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)
