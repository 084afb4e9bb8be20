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
