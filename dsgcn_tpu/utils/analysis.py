"""Model introspection: extract learned dynamic adjacencies and intermediate
features (TPU-native analog of reference core/hooks/feature_hook.py:8-181 and
OutputHook — instead of re-computing op internals in forward hooks, the DG ops
sow their assembled graphs into the flax 'intermediates' collection)."""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def extract_dynamic_graphs(model, variables, keypoint, train: bool = False):
    """Run a forward pass and return {module_path: (N,K,Cq,Tq,V,V) graphs}
    for every dggcn/dghgcn/dgphgcn1 block, plus the logits."""
    logits, state = model.apply(
        variables, keypoint, train=train,
        mutable=["intermediates"] + (["batch_stats"] if train else []))
    inter = state["intermediates"]
    out: Dict[str, Any] = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        else:  # tuple of sown values
            out["/".join(path[:-1])] = tree[0] if len(tree) == 1 else tree

    walk(inter, ())
    return logits, out


def extract_features(model, variables, keypoint, filter_fn=None):
    """Capture every module's output via flax capture_intermediates
    (OutputHook analog, reference core/hooks/output.py:8-68)."""
    logits, state = model.apply(
        variables, keypoint, train=False,
        capture_intermediates=filter_fn or True, mutable=["intermediates"])
    return logits, state["intermediates"]


def find_anomalous_params(grads, atol: float = 0.0):
    """Parameters not contributing to the loss (TPU-native analog of
    reference detect_anomalous_parameters, core/hooks/optimizer.py:55-79).

    The reference walks the autograd graph for params missing from it; under
    jax.grad every param gets a cotangent, so the equivalent signal is an
    all-zero gradient leaf: truly disconnected params have exactly-zero
    grads.  Returns ['path/to/leaf', ...] with |g| <= atol everywhere.
    Zero-init'd-but-connected params can transiently zero out on a single
    batch; check across a few batches before acting.
    """
    bad = []

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        else:
            if np.all(np.abs(np.asarray(tree)) <= atol):
                bad.append("/".join(path))

    walk(grads, ())
    return bad


# ---------------------------------------------------------------------------
# embedding maps (reference core/evaluation.py:197-201 TSNEmap via sklearn;
# sklearn is absent here, so this is a self-contained exact t-SNE)
# ---------------------------------------------------------------------------

def _tsne_p_matrix(x: np.ndarray, perplexity: float) -> np.ndarray:
    n = x.shape[0]
    d2 = np.sum(x * x, 1)[:, None] + np.sum(x * x, 1)[None] - 2 * x @ x.T
    np.fill_diagonal(d2, 0.0)
    d2 = np.maximum(d2, 0.0)
    target = np.log(perplexity)
    P = np.zeros((n, n))
    for i in range(n):
        lo, hi, beta = 0.0, np.inf, 1.0
        for _ in range(50):
            p = np.exp(-d2[i] * beta)
            p[i] = 0.0
            s = p.sum()
            if s <= 0:
                beta *= 0.5
                continue
            h = np.log(s) + beta * np.sum(d2[i] * p) / s
            if abs(h - target) < 1e-5:
                break
            if h > target:
                lo = beta
                beta = beta * 2 if hi == np.inf else (beta + hi) / 2
            else:
                hi = beta
                beta = (beta + lo) / 2
        P[i] = p / s
    P = (P + P.T) / (2 * n)
    return np.maximum(P, 1e-12)


def tsne_map(scores: np.ndarray, n_components: int = 2,
             perplexity: float = 30.0, n_iter: int = 400,
             seed: int = 42) -> np.ndarray:
    """2D t-SNE embedding of score/feature vectors (exact O(N^2) variant of
    reference TSNEmap, core/evaluation.py:197-201).

    For the reference's use case (val-set score maps) N is a few thousand at
    most, where the exact gradient is fast enough on the host.
    """
    x = np.asarray(scores, np.float64)
    n = x.shape[0]
    perplexity = min(perplexity, max((n - 1) / 3.0, 2.0))
    # PCA init (deterministic, the modern sklearn default)
    xc = x - x.mean(0)
    _, _, vt = np.linalg.svd(xc, full_matrices=False)
    y = xc @ vt[:n_components].T
    y = y / (y[:, 0].std() + 1e-12) * 1e-4

    P = _tsne_p_matrix(xc, perplexity)
    rng = np.random.default_rng(seed)
    y += rng.standard_normal(y.shape) * 1e-6
    vel = np.zeros_like(y)
    exaggeration, lr = 12.0, max(n / 12.0, 50.0)
    for it in range(n_iter):
        Pe = P * exaggeration if it < 100 else P
        d2 = np.sum(y * y, 1)[:, None] + np.sum(y * y, 1)[None] - 2 * y @ y.T
        num = 1.0 / (1.0 + d2)
        np.fill_diagonal(num, 0.0)
        Q = np.maximum(num / num.sum(), 1e-12)
        W = (Pe - Q) * num
        grad = 4 * ((np.diag(W.sum(1)) - W) @ y)
        momentum = 0.5 if it < 100 else 0.8
        vel = momentum * vel - lr * grad
        y = y + vel
        y = y - y.mean(0)
    return y.astype(np.float32)
