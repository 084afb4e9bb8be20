"""Model introspection: extract learned dynamic adjacencies and intermediate
features (TPU-native analog of reference core/hooks/feature_hook.py:8-181 and
OutputHook — instead of re-computing op internals in forward hooks, the DG ops
sow their assembled graphs into the flax 'intermediates' collection)."""
from __future__ import annotations

from typing import Any, Dict


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
