"""Joint-padded eval mode (V=25 -> 32) must be EXACT on the real joints.

The padded execution mode (VERDICT r4 #3; `apis.to_padded_inference`) pads
the joint axis once after data_bn, runs every stage at the f32-sublane-
aligned width, and slices back — A/add_coeff stay at their trained shapes,
padded joints are masked out of aggregation (`pre_x` zeroed) and the ada
softmax source-masks them in-kernel.  Reference semantics anchor:
gcn.py:2341-2361 (aggregation on the 25 real joints).

These tests run the kernels in interpret mode on CPU and assert the padded
model's logits match the stock model's to float32 tolerance, for both
families (dgstgcn: fused + bdg kernels, K=8; dsgcn: bd kernel with edge
attention, K=3), both dgmstcn eval layouts (concat at small batch, split at
effective batch >= 64), and the XLA (non-Pallas) dggcn path.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsgcn_tpu.apis import to_padded_inference
from dsgcn_tpu.models.builder import build_model, model_cfg


def _build(name, use_pallas=True):
    cfg = model_cfg(name, num_classes=11)
    cfg["backbone"]["gcn_use_pallas"] = use_pallas
    if use_pallas:
        cfg["backbone"]["gcn_pallas_interpret"] = True
    return build_model(cfg)


def _logits(model, variables, x):
    return jax.jit(lambda v_, x_: model.apply(v_, x_, train=False))(
        variables, x)


@pytest.mark.parametrize("name", ["dgstgcn", "dsgcn"])
@pytest.mark.parametrize("batch", [2, 33])   # concat / split tcn eval layout
def test_padded_eval_matches_stock(name, batch):
    if batch == 33 and name == "dsgcn":
        pytest.skip("layout coverage identical to dgstgcn; keep CPU time down")
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((batch, 2, 8, 25, 3)).astype(np.float32))
    model = _build(name)
    variables = model.init(jax.random.PRNGKey(0), x[:2], train=False)
    # nudge running stats/gates off init zeros so the dynamic graphs and the
    # BN affines are non-trivial (alpha/beta init to 0 would hide ctr/ada)
    variables = jax.tree.map(
        lambda a: a + 0.05 * np.arange(a.size, dtype=np.float32)
        .reshape(a.shape) % 0.3 if a.dtype == jnp.float32 else a, variables)
    ref = _logits(model, variables, x)
    padded, pvars = to_padded_inference(model, variables, v_pad=32)
    got = _logits(padded, pvars, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_padded_eval_xla_path():
    """The non-Pallas dggcn path also supports v_pad (softmax masked in
    XLA)."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 2, 8, 25, 3)).astype(np.float32))
    model = _build("dgstgcn", use_pallas=False)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    variables = jax.tree.map(
        lambda a: a + 0.05 * np.arange(a.size, dtype=np.float32)
        .reshape(a.shape) % 0.3 if a.dtype == jnp.float32 else a, variables)
    ref = _logits(model, variables, x)
    padded, pvars = to_padded_inference(model, variables, v_pad=32)
    got = _logits(padded, pvars, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_padded_composes_with_bf16():
    """to_padded_inference composes with to_bf16_inference (the production
    serving stack); top-1 must agree with the stock f32 model."""
    from dsgcn_tpu.apis import to_bf16_inference
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((4, 2, 8, 25, 3)).astype(np.float32))
    model = _build("dgstgcn")
    variables = model.init(jax.random.PRNGKey(0), x[:2], train=False)
    ref = np.argmax(np.asarray(_logits(model, variables, x)), -1)
    m16, v16 = to_bf16_inference(model, variables)
    mp, vp = to_padded_inference(m16, v16, v_pad=32)
    try:
        got = np.argmax(np.asarray(_logits(mp, vp, x)), -1)
    except Exception:
        pytest.skip("bf16 dots unsupported on this backend (CPU)")
    assert (got == ref).mean() >= 0.75


def test_padded_train_rejected():
    model = _build("dgstgcn")
    x = jnp.zeros((2, 2, 8, 25, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    padded, pvars = to_padded_inference(model, variables, v_pad=32)
    with pytest.raises(AssertionError):
        padded.apply(pvars, x, train=True,
                     rngs={"dropout": jax.random.PRNGKey(0)},
                     mutable=["batch_stats"])
