"""Sparse supermask subsystem tests."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from dsgcn_tpu.sparse.supermask import (SparseDense, SparseTemporalConv,
                                        get_sparsity, group_lasso_penalty,
                                        make_sparse_optimizer, score_mask_tree,
                                        supermask)

RNG = np.random.default_rng(0)


def test_get_sparsity_ramp():
    # reference init_func.py:24-26: linear from 0 at start to `sparsity` at end
    assert get_sparsity(0.8, 0, 0, 10) == pytest.approx(0.0)
    assert get_sparsity(0.8, 5, 0, 10) == pytest.approx(0.4)
    assert get_sparsity(0.8, 10, 0, 10) == pytest.approx(0.8)


def test_supermask_fraction_and_ste():
    score = jnp.asarray(RNG.standard_normal((64, 64)).astype(np.float32))
    m = supermask(score, 0.75)
    assert abs(float(m.mean()) - 0.25) < 0.02
    # straight-through gradient
    g = jax.grad(lambda s: jnp.sum(supermask(s, 0.5) * 3.0))(score)
    np.testing.assert_allclose(np.asarray(g), 3.0)


def test_sparse_dense_forward_and_grads():
    layer = SparseDense(8)
    x = jnp.asarray(RNG.standard_normal((4, 16)).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x, 0.5)
    y = layer.apply(params, x, 0.5)
    assert y.shape == (4, 8)
    # at sparsity 0.9, output differs from sparsity 0
    y0 = layer.apply(params, x, 0.0)
    assert not np.allclose(np.asarray(y), np.asarray(y0))
    grads = jax.grad(
        lambda p: jnp.sum(layer.apply({"params": p}, x, 0.5) ** 2))(
            params["params"])
    leaves = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(grads)}
    assert any("score" in k for k in leaves)
    assert all(np.isfinite(np.asarray(v)).all() for v in leaves.values())


def test_sparse_tconv_shapes():
    layer = SparseTemporalConv(8, kernel_size=5, stride=2)
    x = jnp.asarray(RNG.standard_normal((2, 16, 25, 4)).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x, 0.3)
    y = layer.apply(params, x, 0.3)
    assert y.shape == (2, 8, 25, 8)


def test_sparse_optimizer_gating():
    layer = SparseDense(4)
    x = jnp.asarray(RNG.standard_normal((4, 8)).astype(np.float32))
    variables = layer.init(jax.random.PRNGKey(0), x, 0.5)
    params = variables["params"]
    labels = score_mask_tree(params)
    flat = {jax.tree_util.keystr(k): v
            for k, v in jax.tree_util.tree_leaves_with_path(labels)}
    assert flat["['score']"] == "score"
    assert flat["['kernel']"] == "main"

    tx, gate = make_sparse_optimizer(optax.sgd(0.1), optax.sgd(0.05), params,
                                     warmup_epochs=5)
    opt_state = tx.init(params)
    grads = jax.grad(lambda p: jnp.sum(layer.apply({"params": p}, x, 0.5) ** 2))(params)
    # pre-warmup: score grads zeroed
    g0 = gate(grads, 0)
    assert float(jnp.abs(g0["score"]).sum()) == 0.0
    assert float(jnp.abs(g0["kernel"]).sum()) > 0.0
    g5 = gate(grads, 5)
    assert float(jnp.abs(g5["score"]).sum()) > 0.0
    updates, _ = tx.update(g5, opt_state, params)
    assert jax.tree.structure(updates) == jax.tree.structure(params)


def test_group_lasso_penalty_positive():
    layer = SparseDense(4)
    x = jnp.asarray(RNG.standard_normal((4, 8)).astype(np.float32))
    params = layer.init(jax.random.PRNGKey(0), x, 0.5)["params"]
    p = group_lasso_penalty(params, weight=1e-2)
    assert float(p) > 0
