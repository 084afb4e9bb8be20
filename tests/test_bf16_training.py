"""Mixed-precision (bf16-compute) training and selective remat.

* bf16 training (core/train.py compute_dtype): master params stay f32, a
  bf16 copy runs the network, BN stats stay f32.  Gate: on a separable
  synthetic task the bf16 run must learn like the f32 run (loss drops,
  final accuracy matches within tolerance).
* remat modes (backbone remat in {False, True, 'tcn'}) are semantically
  no-ops: identical loss and identical first-step gradients in f32.
"""
import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsgcn_tpu.core.train import (TrainState, loss_and_metrics,
                                  make_optimizer, train_step)
from dsgcn_tpu.models.builder import build_model, model_cfg


def _small_cfg(name="dgstgcn", remat=False):
    cfg = model_cfg(name, num_classes=4)
    cfg["backbone"].update(num_stages=4, base_channels=16,
                           inflate_stages=[3], down_stages=[3], remat=remat)
    cfg["cls_head"]["in_channels"] = 32
    return cfg


def _task(n=32, t=8):
    """Separable 4-class toy: class-dependent constant offsets + noise."""
    rng = np.random.default_rng(0)
    y = rng.integers(0, 4, size=n)
    x = rng.standard_normal((n, 2, t, 25, 3)).astype(np.float32) * 0.1
    x += y[:, None, None, None, None] * 0.35
    return jnp.asarray(x), jnp.asarray(y)


def _skip_if_no_bf16(fn):
    """Run fn, skipping on backends without bf16 dot execution (XLA:CPU
    lacks BF16 x BF16 = F32 DotThunk — same guard as
    tests/test_bf16_inference.py)."""
    try:
        return fn()
    except Exception as e:  # noqa: BLE001
        if "BF16" in str(e) or "bf16" in str(e):
            pytest.skip(f"backend lacks bf16 dot execution: {str(e)[:80]}")
        raise


def _run(cfg, compute_dtype, steps=25, lr=0.05):
    model = build_model(cfg)
    x, y = _task()
    variables = model.init(jax.random.PRNGKey(0), x[:2], train=False)
    tx, _ = make_optimizer(lr=lr, total_steps=steps)
    state = TrainState.create(model.apply, variables["params"],
                              variables.get("batch_stats", {}), tx)
    step = jax.jit(functools.partial(train_step,
                                     compute_dtype=compute_dtype))
    batch = dict(keypoint=x, label=y)
    losses = []
    for i in range(steps):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(_skip_if_no_bf16(lambda: float(metrics["loss"])))
    acc = float(metrics["top1_acc"])
    return losses, acc, state


def test_bf16_training_learns_like_f32():
    cfg = _small_cfg()
    losses32, acc32, st32 = _run(cfg, None)
    losses16, acc16, st16 = _run(cfg, "bfloat16")
    # both must actually learn
    assert losses32[-1] < 0.5 * losses32[0]
    assert losses16[-1] < 0.5 * losses16[0]
    assert acc32 >= 0.9
    assert acc16 >= 0.9 - 1e-6
    # trajectories track each other loosely (bf16 rounding accumulates)
    assert abs(losses16[-1] - losses32[-1]) < 0.35
    # master params stayed f32
    leaves = jax.tree.leaves(st16.params)
    assert all(a.dtype == jnp.float32 for a in leaves)


def test_bf16_grads_close_at_step_one():
    cfg = _small_cfg()
    model = build_model(cfg)
    x, y = _task(n=8)
    variables = model.init(jax.random.PRNGKey(0), x[:2], train=False)
    batch = dict(keypoint=x, label=y)

    def grads(cd):
        g = jax.grad(lambda p: loss_and_metrics(
            model.apply, p, variables.get("batch_stats", {}), batch,
            jax.random.PRNGKey(0), cd)[0])(variables["params"])
        return np.concatenate([np.asarray(a).ravel()
                               for a in jax.tree.leaves(g)])

    g32 = grads(None)
    g16 = _skip_if_no_bf16(lambda: grads("bfloat16"))
    assert g16.dtype == np.float32
    cos = float(np.dot(g32, g16)
                / (np.linalg.norm(g32) * np.linalg.norm(g16) + 1e-12))
    assert cos > 0.98, cos


@pytest.mark.parametrize("remat", [True, "tcn"])
def test_remat_is_a_semantic_noop(remat):
    """remat (whole-block or tcn-only) must not change loss or gradients."""
    x, y = _task(n=8)
    batch = dict(keypoint=x, label=y)

    def loss_and_grads(remat_mode):
        model = build_model(_small_cfg(remat=remat_mode))
        variables = model.init(jax.random.PRNGKey(0), x[:2], train=False)
        loss, grads = jax.value_and_grad(lambda p: loss_and_metrics(
            model.apply, p, variables.get("batch_stats", {}), batch,
            jax.random.PRNGKey(0))[0])(variables["params"])
        flat = np.concatenate([np.asarray(a).ravel()
                               for a in jax.tree.leaves(grads)])
        return float(loss), flat

    l0, g0 = loss_and_grads(False)
    l1, g1 = loss_and_grads(remat)
    assert l0 == pytest.approx(l1, rel=1e-6)
    # grads agree up to f32 reassociation noise (remat's recomputed forward
    # fuses differently; BN batch-stat reductions reorder)
    np.testing.assert_allclose(g1, g0, atol=3e-3)
    cos = float(np.dot(g0, g1)
                / (np.linalg.norm(g0) * np.linalg.norm(g1) + 1e-12))
    assert cos > 0.9999, cos
    # remat is tree-transparent: identical param paths either way
    assert g0.shape == g1.shape
