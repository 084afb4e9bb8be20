"""Evaluation-metric parity vs reference pyskl/core/evaluation.py."""
import importlib
import sys
import types

import numpy as np
import pytest

import ref_loader
from dsgcn_tpu.core import metrics as M

RNG = np.random.default_rng(9)


@pytest.fixture(scope="module")
def ref_eval():
    ref_loader._install_stubs()
    # evaluation.py needs sklearn (TSNE) and mmcv.runner.DistEvalHook
    ref_loader._ensure_stub_module("sklearn", preprocessing=None)
    ref_loader._ensure_stub_module("sklearn.preprocessing")
    manifold = ref_loader._ensure_stub_module("sklearn.manifold", TSNE=object)
    ref_loader._ensure_stub_module("mmcv.runner",
                                   DistEvalHook=type("H", (), {}),
                                   load_checkpoint=lambda *a, **k: None)
    ref_loader._ensure_pkg("refcore", ref_loader.REF + "/pyskl/core")
    return importlib.import_module("refcore.evaluation")


def _scores(n=200, k=30):
    scores = RNG.standard_normal((n, k)).astype(np.float64)
    labels = RNG.integers(0, k, size=n).tolist()
    return scores, labels


def test_top_k_accuracy_parity(ref_eval):
    scores, labels = _scores()
    want = ref_eval.top_k_accuracy(scores, labels, (1, 5))
    got = M.top_k_accuracy(scores, labels, (1, 5))
    np.testing.assert_allclose(got, want)


def test_mean_class_accuracy_parity(ref_eval):
    scores, labels = _scores()
    want, want_cm = ref_eval.mean_class_accuracy(scores, labels)
    got, got_cm = M.mean_class_accuracy(scores, labels)
    assert got == pytest.approx(want)
    np.testing.assert_array_equal(got_cm, want_cm)


def test_confusion_matrix_parity(ref_eval):
    _, labels = _scores()
    preds = RNG.integers(0, 30, size=len(labels))
    for norm in (None, "true", "pred", "all"):
        want = ref_eval.confusion_matrix(preds.astype(np.int64),
                                         np.asarray(labels, np.int64), norm)
        got = M.confusion_matrix(preds, labels, norm)
        np.testing.assert_allclose(got, want)


def test_mean_average_precision_parity(ref_eval):
    n, k = 100, 10
    scores = RNG.standard_normal((n, k))
    labels = (RNG.random((n, k)) > 0.8).astype(np.int64)
    want = ref_eval.mean_average_precision(scores, labels)
    got = M.mean_average_precision(scores, labels)
    assert got == pytest.approx(want)


def test_bce_and_soft_ce_match_torch():
    import torch
    import jax.numpy as jnp
    from dsgcn_tpu.core.losses import bce_with_logits, cross_entropy
    logits = RNG.standard_normal((8, 5)).astype(np.float32)
    soft = RNG.random((8, 5)).astype(np.float32)
    hard = RNG.integers(0, 5, 8)
    # BCE
    want = torch.nn.functional.binary_cross_entropy_with_logits(
        torch.tensor(logits), torch.tensor(soft)).item()
    got = float(bce_with_logits(jnp.asarray(logits), jnp.asarray(soft)))
    assert abs(got - want) < 1e-6
    # hard CE
    want = torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(hard)).item()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(hard)))
    assert abs(got - want) < 1e-6
    # soft CE (reference cross_entropy_loss.py:55-66: -sum(logsoftmax * label))
    lsm = torch.nn.functional.log_softmax(torch.tensor(logits), 1)
    want = (-(lsm * torch.tensor(soft)).sum(1)).mean().item()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(soft)))
    assert abs(got - want) < 1e-5
    # class-weighted hard CE
    w = RNG.random(5).astype(np.float32) + 0.5
    want = torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(hard), weight=torch.tensor(w)).item()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(hard),
                              class_weight=jnp.asarray(w)))
    assert abs(got - want) < 1e-5


def test_tsne_map_separates_clusters():
    """tsne_map (TSNEmap analog, core/evaluation.py:197-201; exact numpy
    t-SNE since sklearn is absent): well-separated clusters stay separated."""
    from dsgcn_tpu.utils.analysis import tsne_map
    rng = np.random.default_rng(0)
    x = np.concatenate([rng.standard_normal((40, 12)) + 8 * i
                        for i in range(3)])
    lab = np.repeat(np.arange(3), 40)
    emb = tsne_map(x, perplexity=12, n_iter=250)
    assert emb.shape == (120, 2)
    d = ((emb[:, None] - emb[None]) ** 2).sum(-1)
    np.fill_diagonal(d, np.inf)
    purity = (lab[np.argmin(d, 1)] == lab).mean()
    assert purity > 0.95, purity


def test_per_class_graph_matches_reference_indexing():
    """'graph' eval metric vs a transcription of the reference torch code
    (datasets/base.py:212-221) incl. the range(max(label)) last-class skip."""
    from dsgcn_tpu.core.metrics import evaluate, per_class_graph
    rng = np.random.default_rng(5)
    results = rng.standard_normal((30, 3, 5, 5)).astype(np.float32)
    labels = rng.integers(0, 4, 30)          # classes 0..3; 3 must be skipped

    import torch
    res_t = torch.tensor(results)
    lab = np.asarray(labels)
    want = []
    for i in range(max(labels)):             # reference loop verbatim
        index = np.where(lab == i)
        want.append(res_t[index, :, :, :].mean(1).mean(0).numpy())

    got = per_class_graph(results, labels)
    assert len(got) == len(want) == 3
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-5, atol=1e-6)
    out = evaluate(results, labels, metrics=("graph",))
    assert len(out["graph"]) == 3


def test_tsne_metric_dispatch():
    from dsgcn_tpu.core.metrics import evaluate
    rng = np.random.default_rng(0)
    s = rng.standard_normal((60, 8))
    l = np.repeat(np.arange(3), 20)
    out = evaluate(s, l, metrics=("TSNEmap",))
    assert out["TSNEmap"].shape == (60, 2)
    assert (out["labels"] == l).all()


def test_find_anomalous_params():
    """Zero-grad param detection (detect_anomalous_parameters analog,
    core/hooks/optimizer.py:55-79): a head that ignores one branch leaves
    that branch's params with exactly-zero grads."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn
    from dsgcn_tpu.utils.analysis import find_anomalous_params

    class TwoBranch(nn.Module):
        @nn.compact
        def __call__(self, x):
            used = nn.Dense(4, name="used")(x)
            nn.Dense(4, name="unused")(x)     # traced but not in the loss
            return used.sum()

    m = TwoBranch()
    x = jnp.ones((2, 3))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    grads = jax.grad(lambda p: m.apply({"params": p}, x))(params)
    bad = find_anomalous_params(grads)
    assert sorted(bad) == ["unused/bias", "unused/kernel"]


def test_evaluate_multi_head_recursion():
    """Multi-head per-sample results recurse with _i suffixes
    (base.py:140-147), e.g. RGBPose two-stream eval."""
    from dsgcn_tpu.core.metrics import evaluate
    rng = np.random.default_rng(1)
    labels = rng.integers(0, 4, 20)
    s_rgb = np.eye(4)[labels] + 0.01 * rng.standard_normal((20, 4))
    s_pose = rng.standard_normal((20, 4))
    results = [(s_rgb[i], s_pose[i]) for i in range(20)]
    out = evaluate(results, labels,
                   metrics=("top_k_accuracy", "confusion_matrix"))
    assert out["top1_acc_0"] == 1.0
    assert out["top1_acc_1"] < 1.0
    assert out["confusion_matrix_0"].shape == (4, 4)
