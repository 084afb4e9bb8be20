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


def test_sparse_stgcn_trains_with_ramp():
    """End-to-end sparse training: sparsity ramps per epoch, loss decreases,
    masks prune the requested fraction."""
    import optax
    from dsgcn_tpu.sparse.models import SparseSTGCN
    from dsgcn_tpu.sparse.supermask import supermask

    model = SparseSTGCN(num_stages=4, inflate_stages=(3,), down_stages=(3,),
                        target_sparsity=0.6)
    x = jnp.asarray(RNG.standard_normal((4, 2, 8, 25, 3)).astype(np.float32))
    y = jnp.asarray(RNG.integers(0, 5, 4))
    variables = model.init(jax.random.PRNGKey(0), x, 0.0, train=False)
    params, stats = variables["params"], variables["batch_stats"]

    head_w = jnp.zeros((128, 5))

    def loss_fn(p, hw, sparsity):
        feat, muts = model.apply({"params": p, "batch_stats": stats}, x,
                                 sparsity, train=True,
                                 mutable=["batch_stats"])
        logits = feat.mean(axis=(1, 2, 3)) @ hw
        one_hot = jax.nn.one_hot(y, 5)
        return -(jax.nn.log_softmax(logits) * one_hot).sum(1).mean()

    tx = optax.sgd(0.05, momentum=0.9)
    opt_state = tx.init((params, head_w))
    step = jax.jit(lambda p, hw, o, s: _sparse_step(model, tx, p, hw, o, s,
                                                    loss_fn))
    losses = []
    total_epochs = 6
    for epoch in range(total_epochs):
        s = model.epoch_sparsity(epoch, total_epochs)
        (params, head_w), opt_state, l = step(params, head_w, opt_state,
                                              jnp.float32(s))
        losses.append(float(l))
    assert losses[-1] < losses[0], losses
    # final masks prune ~target fraction on a sparse layer
    score = params["block0"]["gcn"]["conv"]["score"]
    m = supermask(score, model.epoch_sparsity(total_epochs, total_epochs))
    assert abs(float(m.mean()) - (1 - 0.6)) < 0.05


def _sparse_step(model, tx, params, head_w, opt_state, sparsity, loss_fn):
    import optax
    (l, grads) = jax.value_and_grad(
        lambda pw: loss_fn(pw[0], pw[1], sparsity))((params, head_w))
    updates, opt_state = tx.update(grads, opt_state, (params, head_w))
    params, head_w = optax.apply_updates((params, head_w), updates)
    return (params, head_w), opt_state, l


def test_rerandomize_bernoulli_semantics():
    """rerandomize: kept (masked-in) weights untouched; pruned weights
    replaced only where the Bernoulli draw fires (sparse_mosules.py:88-105)."""
    import jax
    import jax.numpy as jnp
    from dsgcn_tpu.sparse.supermask import rerandomize_param, supermask

    rng = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(rng)
    param = jax.random.normal(k1, (64, 32))
    score = jax.random.normal(k2, (64, 32))
    sparsity = 0.5

    out = rerandomize_param(jax.random.PRNGKey(7), param, score, sparsity,
                            mode="bernoulli", la=0.5)
    mask = np.asarray(supermask(score, sparsity))
    param, out = np.asarray(param), np.asarray(out)
    # kept weights identical
    np.testing.assert_array_equal(out[mask == 1], param[mask == 1])
    # some but not all pruned weights redrawn (la=0.5)
    changed = (out != param) & (mask == 0)
    frac = changed.sum() / (mask == 0).sum()
    assert 0.3 < frac < 0.7, frac


def test_rerandomize_manual_formula():
    import jax
    import jax.numpy as jnp
    from dsgcn_tpu.sparse.supermask import rerandomize_param, supermask

    param = jnp.ones((16, 16))
    score = jax.random.normal(jax.random.PRNGKey(1), (16, 16))
    out = rerandomize_param(jax.random.PRNGKey(2), param, score, 0.25,
                            mode="manual", la=0.5, mu=0.0)
    mask = np.asarray(supermask(score, 0.25))
    out = np.asarray(out)
    np.testing.assert_allclose(out[mask == 1], 1.0)
    np.testing.assert_allclose(out[mask == 0], 0.5)   # la*old + 0*rnd


def test_rerandomize_tree_targets_scored_kernels():
    """Tree walk touches only kernels with sibling scores."""
    import jax
    import jax.numpy as jnp
    from dsgcn_tpu.sparse.supermask import rerandomize_tree

    params = {
        "sp": {"kernel": jnp.ones((8, 8)),
               "score": jax.random.normal(jax.random.PRNGKey(0), (8, 8))},
        "plain": {"kernel": jnp.ones((8, 8))},
    }
    out = rerandomize_tree(jax.random.PRNGKey(3), params, 0.5,
                           mode="bernoulli", la=1.0)
    assert not np.array_equal(np.asarray(out["sp"]["kernel"]),
                              np.ones((8, 8)))
    np.testing.assert_array_equal(np.asarray(out["plain"]["kernel"]),
                                  np.ones((8, 8)))
    np.testing.assert_array_equal(np.asarray(out["sp"]["score"]),
                                  np.asarray(params["sp"]["score"]))
