"""Training-step tests: loss decreases, DP step == single-device step, 8-way mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsgcn_tpu.core.train import (TrainState, init_model, make_optimizer,
                                  train_step, eval_step)
from dsgcn_tpu.models.builder import build_named_model
from dsgcn_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from dsgcn_tpu.parallel.train import make_dp_train_step

N_CLASSES = 6


def _model_and_state(name="dsgcn", total_steps=50, lr=0.1, t=16):
    model = build_named_model(name, num_classes=N_CLASSES)
    sample = jnp.zeros((2, 2, t, 25, 3), jnp.float32)
    params, stats = init_model(model, jax.random.PRNGKey(0), sample)
    tx, _ = make_optimizer(lr=lr, total_steps=total_steps)
    state = TrainState.create(model.apply, params, stats, tx)
    return model, state


def _batch(n=8, t=16, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, 2, t, 25, 3)).astype(np.float32)
    y = rng.integers(0, N_CLASSES, size=n)
    # make the labels learnable: shift joint coords per class
    x[..., 0] += y[:, None, None, None] * 0.4
    return dict(keypoint=jnp.asarray(x), label=jnp.asarray(y))


@pytest.mark.parametrize("name", ["stgcn++", "dsgcn"])
def test_loss_decreases_single_device(name):
    model, state = _model_and_state(name)
    batch = _batch()
    step = jax.jit(train_step)
    first = None
    rng = jax.random.PRNGKey(1)
    for i in range(12):
        state, metrics = step(state, batch, rng)
        if first is None:
            first = float(metrics["loss"])
    last = float(metrics["loss"])
    assert last < first * 0.7, (first, last)


def test_dp_step_matches_single_device():
    """1-device mesh DP step must equal the plain single-device step bitwise-ish."""
    model, state_a = _model_and_state("stgcn++")
    _, state_b = _model_and_state("stgcn++")
    batch = _batch()
    rng = jax.random.PRNGKey(1)

    mesh = make_mesh(n_data=1, devices=jax.devices()[:1])
    dp_step = make_dp_train_step(mesh)
    state_bs = replicate(state_b, mesh)
    batch_s = shard_batch(batch, mesh)

    sa, ma = jax.jit(train_step)(state_a, batch, rng)
    sb, mb = dp_step(state_bs, batch_s, rng)
    # fold_in(axis_index) changes dropout rng but our models have dropout 0
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-5)
    la = jax.tree.leaves(sa.params)
    lb = jax.tree.leaves(sb.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)


def test_dp_8way_mesh_loss_decreases():
    """Full 8-chip-mesh SPMD step on the virtual CPU mesh."""
    assert len(jax.devices()) >= 8
    model, state = _model_and_state("dsgcn", lr=0.02, t=8)
    mesh = make_mesh(n_data=8)
    dp_step = make_dp_train_step(mesh)
    state = replicate(state, mesh)
    batch = shard_batch(_batch(n=32, t=8), mesh)
    rng = jax.random.PRNGKey(1)
    losses = []
    for i in range(15):
        state, metrics = dp_step(state, batch, rng)
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-3:]) < losses[0], losses


def test_eval_step_runs():
    model, state = _model_and_state("stgcn++")
    logits = jax.jit(eval_step, static_argnums=0)(
        model.apply, state.params, state.batch_stats,
        jnp.zeros((2, 2, 16, 25, 3)))
    assert logits.shape == (2, N_CLASSES)


def test_extract_pooled_feat():
    from dsgcn_tpu.models.recognizer import extract_pooled_feat
    model, state = _model_and_state("stgcn++")
    x = jnp.zeros((2, 2, 16, 25, 3))
    variables = {"params": {"backbone": state.params["backbone"],
                            "head": state.params["head"]},
                 "batch_stats": {"backbone": state.batch_stats["backbone"]}}
    f = extract_pooled_feat(model, variables, x, pool_opt="tv")
    assert f.shape == (2, 2, 1, 1, 256)
    s = extract_pooled_feat(model, variables, x, pool_opt="nmtv",
                            score_ext=True)
    assert s.shape == (1, 1, 1, 1, N_CLASSES)


def test_extract_dynamic_graphs():
    from dsgcn_tpu.utils.analysis import extract_dynamic_graphs
    model, state = _model_and_state("dsgcn", t=8)
    x = jnp.zeros((1, 2, 8, 25, 3))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    logits, graphs = extract_dynamic_graphs(model, variables, x)
    assert logits.shape == (1, N_CLASSES)
    assert len(graphs) == 10          # one dynamic graph per DG block
    g0 = next(iter(graphs.values()))
    assert g0.shape[-2:] == (25, 25)  # (N, K, Cq, Tq, V, V)


def test_paramwise_optimizer_matches_torch_groups():
    """paramwise_cfg (custom_keys/bias_lr_mult/norm_decay_mult) matches torch
    SGD param groups over 3 steps (mmcv DefaultOptimizerConstructor
    semantics, reference core/optimizer/sparse_constructor.py:15-120)."""
    import torch

    import jax
    import jax.numpy as jnp

    from dsgcn_tpu.core.train import make_optimizer

    torch.manual_seed(0)
    rng = np.random.default_rng(2)
    w = rng.standard_normal((4, 3)).astype(np.float32)
    b = rng.standard_normal((3,)).astype(np.float32)
    bn_scale = rng.standard_normal((3,)).astype(np.float32)

    params = {"dense": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)},
              "bn": {"scale": jnp.asarray(bn_scale)}}
    cfg = dict(custom_keys={"dense.kernel": dict(lr_mult=0.5, decay_mult=2.0)},
               bias_lr_mult=0.1, norm_decay_mult=0.0)
    lr, wd, mom = 0.2, 0.01, 0.9
    tx, _ = make_optimizer(lr=lr, momentum=mom, weight_decay=wd,
                           nesterov=True, schedule="constant",
                           paramwise_cfg=cfg, params=params)
    state = tx.init(params)

    tw = torch.nn.Parameter(torch.tensor(w))
    tb = torch.nn.Parameter(torch.tensor(b))
    ts = torch.nn.Parameter(torch.tensor(bn_scale))
    opt = torch.optim.SGD(
        [dict(params=[tw], lr=lr * 0.5, weight_decay=wd * 2.0),
         dict(params=[tb], lr=lr * 0.1, weight_decay=wd),
         dict(params=[ts], lr=lr, weight_decay=0.0)],
        lr=lr, momentum=mom, nesterov=True)

    for step in range(3):
        g = jax.tree.map(
            lambda p: jnp.asarray(
                rng.standard_normal(p.shape).astype(np.float32)), params)
        updates, state = tx.update(g, state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)

        for t, key in ((tw, ("dense", "kernel")), (tb, ("dense", "bias")),
                       (ts, ("bn", "scale"))):
            t.grad = torch.tensor(np.asarray(g[key[0]][key[1]]))
        opt.step()

    np.testing.assert_allclose(np.asarray(params["dense"]["kernel"]),
                               tw.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["dense"]["bias"]),
                               tb.detach().numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(params["bn"]["scale"]),
                               ts.detach().numpy(), rtol=1e-5, atol=1e-6)
