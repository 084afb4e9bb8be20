"""AOT export / serving (dsgcn_tpu/serving.py).

The exported StableHLO artifact must (a) reproduce the live model's logits
(tight allclose; polymorphic vs concrete compiles fuse differently) at
several batch sizes, (b) be standalone — weights embedded,
loadable with no model/config/checkpoint, (c) reproduce the reference's
multi-clip 'prob' score averaging (recognizers/base.py:113-116) through
``predict``.
"""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsgcn_tpu.models.builder import build_named_model
from dsgcn_tpu.serving import export_recognizer, load_exported

M, T, V, C, NCLS = 2, 12, 25, 3, 7


@pytest.fixture(scope="module")
def small_model():
    model = build_named_model("stgcn++", num_classes=NCLS)
    x = jnp.zeros((2, M, T, V, C), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables


def _x(n, seed=0):
    return np.random.default_rng(seed).standard_normal(
        (n, M, T, V, C)).astype(np.float32)


def test_export_polymorphic_roundtrip(small_model, tmp_path):
    model, variables = small_model
    out = str(tmp_path / "art")
    man = export_recognizer(model, variables, out,
                            sample_shape=(M, T, V, C), num_classes=NCLS)
    assert man["polymorphic_batch"], "stgcn++ should trace with symbolic batch"
    assert man["num_classes"] == NCLS and man["num_params"] > 1000
    assert os.path.exists(os.path.join(out, "module.bin"))

    served = load_exported(out)
    for n in (1, 3, 16):
        x = _x(n, seed=n)
        want = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
        got = served.logits(x)
        # polymorphic-batch and concrete-batch compilations may fuse
        # differently -> tight allclose, not bitwise
        np.testing.assert_allclose(got, want, rtol=2e-6, atol=1e-6)


def test_export_fixed_batch_and_padding(small_model, tmp_path):
    model, variables = small_model
    out = str(tmp_path / "art_fixed")
    man = export_recognizer(model, variables, out, sample_shape=(M, T, V, C),
                            polymorphic=False, batch_sizes=(2, 4))
    assert man["batch_sizes"] == [2, 4] and len(man["modules"]) == 2

    served = load_exported(out)
    x = _x(3, seed=5)   # 3 not exported: pads to 4
    want = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(served.logits(x), want, rtol=2e-6, atol=1e-6)
    x = _x(9, seed=6)   # 9 > max: chunks of 4 (4+4+pad)
    want = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(served.logits(x), want, rtol=2e-6, atol=1e-6)


def test_artifact_is_standalone(small_model, tmp_path):
    """Deserialization + execution must not touch model code or weights."""
    model, variables = small_model
    out = str(tmp_path / "art_alone")
    export_recognizer(model, variables, out, sample_shape=(M, T, V, C))
    x = _x(2, seed=9)
    want = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    del model, variables

    served = load_exported(out)         # only reads manifest + module bytes
    np.testing.assert_allclose(served.logits(x), want, rtol=2e-6, atol=1e-6)
    with open(os.path.join(out, "manifest.json")) as f:
        man = json.load(f)
    assert man["format"] == "jax.export.stablehlo"


def test_predict_multiclip_prob_averaging(small_model, tmp_path):
    model, variables = small_model
    out = str(tmp_path / "art_pred")
    export_recognizer(model, variables, out, sample_shape=(M, T, V, C),
                      average_clips="prob")
    served = load_exported(out)
    clips = _x(4, seed=11)              # one sample's 4 test clips
    lo = np.asarray(model.apply(variables, jnp.asarray(clips), train=False))
    e = np.exp(lo - lo.max(axis=-1, keepdims=True))
    want = (e / e.sum(axis=-1, keepdims=True)).mean(axis=0)
    got = served.predict(clips)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    assert got.shape == (NCLS,)
    # score mode: plain logit mean
    np.testing.assert_allclose(served.predict(clips, average_clips="score"),
                               lo.mean(axis=0), rtol=1e-6, atol=1e-7)


def test_export_cli(tmp_path):
    """tools/export.py end-to-end on a committed config (shape inference
    from the config's test pipeline, manifest, servable artifact)."""
    import subprocess
    import sys
    out = str(tmp_path / "cli_art")
    r = subprocess.run(
        [sys.executable, "tools/export.py", "configs/synthetic/export_tiny.py",
         "--out", out, "--batch", "2"],
        capture_output=True, text=True,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    served = load_exported(out)
    man = served.manifest
    assert man["sample_shape"] == [2, 12, 25, 3]   # from the test pipeline
    clips = np.random.default_rng(3).standard_normal(
        (2, *man["sample_shape"])).astype(np.float32)
    scores = served.predict(clips)
    assert scores.shape == (man["num_classes"],)
    assert np.isfinite(scores).all()


@pytest.mark.slow
def test_train_then_export_cli(tmp_path):
    """tools/train.py --export-dir: one training epoch then a standalone
    serving artifact, servable without any model code."""
    import subprocess
    import sys
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    data = str(tmp_path / "synth.pkl")
    r = subprocess.run(
        [sys.executable, "tools/data/make_synthetic.py", data],
        capture_output=True, text=True, cwd=root)
    assert r.returncode == 0, r.stderr[-2000:]
    cfg_text = open(os.path.join(
        root, "configs/synthetic/export_tiny.py")).read()
    cfg_path = str(tmp_path / "cfg.py")
    with open(cfg_path, "w") as f:
        f.write(cfg_text.replace("data/synth.pkl", data))
    out = str(tmp_path / "art")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "tools/train.py", cfg_path,
         "--work-dir", str(tmp_path / "wd"), "--export-dir", out],
        capture_output=True, text=True, cwd=root, env=env)
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])
    served = load_exported(out)
    clips = np.random.default_rng(0).standard_normal(
        (2, *served.manifest["sample_shape"])).astype(np.float32)
    assert served.predict(clips).shape == (10,)


def test_export_bf16_serving(small_model, tmp_path):
    """serve_dtype='bfloat16' exports the production bf16 path: manifest
    records it, the artifact round-trips, and (on backends that execute
    bf16 dots) logits come back f32 and top-1 matches the f32 artifact."""
    model, variables = small_model
    out = str(tmp_path / "art16")
    man = export_recognizer(model, variables, out, sample_shape=(M, T, V, C),
                            num_classes=NCLS, serve_dtype="bfloat16")
    assert man["serve_dtype"] == "bfloat16"
    assert man["input_dtype"] == "float32"

    served = load_exported(out)
    x = _x(4, seed=1)
    try:
        got = served.logits(x)
    except Exception as e:  # noqa: BLE001 — XLA:CPU compiles but cannot
        if "BF16" in str(e):  # execute BF16 dots; chip runs cover this in
            return            # bench (*_bf16_top1_match_frac)
        raise
    assert got.dtype == np.float32
    want = np.asarray(model.apply(variables, jnp.asarray(x), train=False))
    assert (got.argmax(-1) == want.argmax(-1)).all()
