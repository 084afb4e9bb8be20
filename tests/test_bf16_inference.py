"""bf16 end-to-end correctness: the production serving path (bf16 weights +
bf16 compute via ``apis.to_bf16_inference``) must agree with f32 eval on a
TRAINED model — identical top-1 and bounded logit deltas (VERDICT r3 #3).

Clip-average semantics anchor: reference recognizers/base.py:113-116 (softmax
per clip, mean over clips) — asserted on the bf16 path too.
"""
import numpy as np

import jax
import jax.numpy as jnp

from dsgcn_tpu.apis import to_bf16_inference
from dsgcn_tpu.core.train import TrainState, init_model, make_optimizer, \
    train_step
from dsgcn_tpu.models.builder import build_named_model
from dsgcn_tpu.models.recognizer import average_clip

RNG = np.random.default_rng(7)


def _trained_model(name, steps=6, n=16, t=16, classes=4):
    """A few real optimizer steps on a separable synthetic task so eval
    logits have meaningful margins (not init noise)."""
    model = build_named_model(name, num_classes=classes)
    labels = RNG.integers(0, classes, size=n)
    # class signal = per-sample scale (survives centering-free GCN input)
    x = (RNG.standard_normal((n, 2, t, 25, 3))
         * (1.0 + 0.6 * labels)[:, None, None, None, None]).astype(np.float32)
    xb, yb = jnp.asarray(x), jnp.asarray(labels)
    params, stats = init_model(model, jax.random.PRNGKey(0), xb[:1])
    tx, _ = make_optimizer(lr=0.05, total_steps=steps)
    state = TrainState.create(model.apply, params, stats, tx)
    step = jax.jit(train_step)
    for _ in range(steps):
        state, metrics = step(state, dict(keypoint=xb, label=yb),
                              jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return model, variables, xb


def _bf16_apply(m16, v16, x):
    """Run the bf16 model, skipping on backends without bf16 dot kernels
    (XLA:CPU in this jaxlib compiles BF16xBF16=F32 dots but cannot execute
    them).  The same comparison runs ON CHIP every round in bench.py
    (``dsgcn_bf16_top1_match_frac`` / ``dsgcn_bf16_logit_rel`` keys)."""
    import pytest
    try:
        out = jax.jit(lambda v, a: m16.apply(v, a, train=False))(v16, x)
        np.asarray(out)   # force execution
        return out
    except Exception as e:  # noqa: BLE001
        if "BF16" in str(e):
            pytest.skip(f"backend lacks bf16 dot execution: {str(e)[:80]}")
        raise


def test_bf16_eval_matches_f32_dsgcn():
    model, variables, x = _trained_model("dsgcn")
    logits32 = jax.jit(lambda v, a: model.apply(v, a, train=False))(
        variables, x)
    m16, v16 = to_bf16_inference(model, variables)
    logits16 = _bf16_apply(m16, v16, x)

    # the head returns f32 logits even under bf16 compute (the serving
    # contract: downstream softmax/metrics code never sees bf16)
    assert logits16.dtype == jnp.float32

    l32, l16 = np.asarray(logits32), np.asarray(logits16)
    assert (l32.argmax(-1) == l16.argmax(-1)).all(), \
        "bf16 top-1 diverged from f32"
    scale = np.abs(l32).max() + 1e-9
    rel = np.abs(l32 - l16).max() / scale
    assert rel < 5e-2, f"bf16 logit delta too large: {rel:.3f}"


def test_bf16_clip_average_semantics():
    """Multi-clip prob averaging (base.py:113-116) on the bf16 path: softmax
    per clip then mean equals the reference formula on the bf16 logits."""
    model, variables, x = _trained_model("dgstgcn", steps=3, n=8)
    m16, v16 = to_bf16_inference(model, variables)
    logits = _bf16_apply(m16, v16, x)
    clips = jnp.reshape(logits, (2, 4, -1))          # (n, nc, classes)
    got = np.asarray(average_clip(clips, "prob"))
    want = np.asarray(jax.nn.softmax(clips, axis=-1).mean(axis=1))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_bf16_params_cast_once():
    """to_bf16_inference casts every f32 leaf to bf16 and leaves batch_stats
    f32 (they fold into affines at trace time in full precision)."""
    model = build_named_model("dsgcn", num_classes=4)
    x = jnp.zeros((1, 2, 8, 25, 3), jnp.float32)
    params, stats = init_model(model, jax.random.PRNGKey(0), x)
    _, v16 = to_bf16_inference(model, {"params": params,
                                       "batch_stats": stats})
    leaves = jax.tree.leaves(v16["params"])
    assert all(a.dtype != jnp.float32 for a in leaves)
    assert all(a.dtype == jnp.bfloat16 for a in leaves
               if np.issubdtype(a.dtype, np.floating))
    assert all(a.dtype == jnp.float32
               for a in jax.tree.leaves(v16["batch_stats"])
               if np.issubdtype(a.dtype, np.floating))


def test_bf16_eval_matches_f32_dgstgcn():
    """Same serving contract for the DG-STGCN family (K=8 dggcn + dgmstcn):
    the on-chip counterpart runs every round in bench.py
    (``dgstgcn_bf16_top1_match_frac`` / ``dgstgcn_bf16_logit_rel``)."""
    model, variables, x = _trained_model("dgstgcn")
    logits32 = jax.jit(lambda v, a: model.apply(v, a, train=False))(
        variables, x)
    m16, v16 = to_bf16_inference(model, variables)
    logits16 = _bf16_apply(m16, v16, x)
    assert logits16.dtype == jnp.float32
    l32, l16 = np.asarray(logits32), np.asarray(logits16)
    assert (l32.argmax(-1) == l16.argmax(-1)).all(), \
        "bf16 top-1 diverged from f32"
    rel = np.abs(l32 - l16).max() / (np.abs(l32).max() + 1e-9)
    assert rel < 5e-2, f"bf16 logit delta too large: {rel:.3f}"
