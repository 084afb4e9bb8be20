"""AOT model export / serving.

Serializes the jitted eval-mode forward of a recognizer into a
self-contained StableHLO artifact (``jax.export``): weights are embedded as
constants, so the artifact loads and runs WITHOUT any model code, config,
or checkpoint — the TPU-native deployment analog the reference lacks (its
serving story is rebuilding the python model per process,
pyskl/apis/inference.py:20-55).

Artifacts are directories::

    <path>/manifest.json          input spec, classes, clip averaging, jax
                                  version, platforms, param count
    <path>/module.bin             batch-polymorphic StableHLO (preferred)
    <path>/module_b<N>.bin        per-batch-size fallback (e.g. Pallas-fused
                                  TPU exports, whose kernel grids need a
                                  concrete batch)

The loader (`load_exported`) returns a `ServedRecognizer` whose ``logits``
runs the deserialized module under jit and whose ``predict`` reproduces the
reference's multi-clip score averaging (recognizers/base.py:93-116).
"""
from __future__ import annotations

import json
import os
from typing import Dict, Optional, Sequence, Tuple

import numpy as np

_MANIFEST = "manifest.json"


def _eval_fn(model, variables):
    def fwd(x):
        return model.apply(variables, x, train=False)
    return fwd


def export_recognizer(model, variables, path: str, *,
                      sample_shape: Tuple[int, ...] = (2, 100, 25, 3),
                      batch_sizes: Sequence[int] = (1, 16),
                      polymorphic: bool = True,
                      platforms: Optional[Sequence[str]] = None,
                      average_clips: str = "prob",
                      num_classes: Optional[int] = None,
                      serve_dtype: str = "float32") -> Dict:
    """Export ``model.apply(variables, x, train=False)`` to ``path``.

    ``sample_shape`` is the per-sample input shape WITHOUT the batch axis
    (M, T, V, C) for GCN recognizers.  With ``polymorphic`` the batch axis
    is a symbolic dimension and one module covers every batch size; if the
    model does not trace with a symbolic batch (e.g. Pallas-fused TPU path,
    whose grid needs a concrete N), one module per entry of ``batch_sizes``
    is written instead.  ``platforms`` forwards to ``jax.export.export``
    (e.g. ``["tpu", "cpu"]`` to cross-lower); None = current backend.

    ``serve_dtype='bfloat16'`` exports the production bf16 serving path
    (``apis.to_bf16_inference``: weights embedded as bf16, activations in
    bf16, f32 logits; input stays float32) — the on-chip top-1 parity gate
    for it runs every bench (``*_bf16_top1_match_frac``).
    Returns the manifest dict.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jex

    assert serve_dtype in ("float32", "bfloat16"), serve_dtype
    if serve_dtype == "bfloat16":
        from .apis import to_bf16_inference
        model, variables = to_bf16_inference(model, variables)

    os.makedirs(path, exist_ok=True)
    jfn = jax.jit(_eval_fn(model, variables))
    kw = {"platforms": list(platforms)} if platforms else {}

    modules: Dict[str, bytes] = {}
    poly_ok = False
    if polymorphic:
        try:
            (b,) = jex.symbolic_shape("b")
            spec = jax.ShapeDtypeStruct((b, *sample_shape), jnp.float32)
            exp = jex.export(jfn, **kw)(spec)
            modules["module.bin"] = exp.serialize()
            out_shape = tuple(int(d) if isinstance(d, int) else None
                              for d in exp.out_avals[0].shape)
            poly_ok = True
        except Exception:   # symbolic trace unsupported for this model
            poly_ok = False
    if not poly_ok:
        for n in batch_sizes:
            spec = jax.ShapeDtypeStruct((int(n), *sample_shape), jnp.float32)
            exp = jex.export(jfn, **kw)(spec)
            modules[f"module_b{int(n)}.bin"] = exp.serialize()
        out_shape = tuple(int(d) for d in exp.out_avals[0].shape[1:])
        out_shape = (None, *out_shape)

    for fname, blob in modules.items():
        with open(os.path.join(path, fname), "wb") as f:
            f.write(blob)

    n_params = int(sum(np.prod(a.shape) for a in
                       jax.tree_util.tree_leaves(variables.get("params", {}))))
    manifest = {
        "format": "jax.export.stablehlo",
        "jax_version": jax.__version__,
        "platforms": list(platforms) if platforms else [jax.default_backend()],
        "sample_shape": list(sample_shape),
        "input_dtype": "float32",
        "serve_dtype": serve_dtype,
        "polymorphic_batch": poly_ok,
        "batch_sizes": None if poly_ok else [int(n) for n in batch_sizes],
        "out_shape": list(out_shape),
        "num_classes": int(num_classes) if num_classes is not None
        else int(out_shape[-1]),
        "average_clips": average_clips,
        "num_params": n_params,
        "modules": sorted(modules),
    }
    with open(os.path.join(path, _MANIFEST), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


class ServedRecognizer:
    """A deserialized exported recognizer.  Standalone: needs only jax."""

    def __init__(self, path: str):
        import jax
        from jax import export as jex

        with open(os.path.join(path, _MANIFEST)) as f:
            self.manifest = json.load(f)
        self._fns = {}
        for fname in self.manifest["modules"]:
            with open(os.path.join(path, fname), "rb") as f:
                exp = jex.deserialize(bytearray(f.read()))
            key = None if fname == "module.bin" else \
                int(fname[len("module_b"):-len(".bin")])
            self._fns[key] = jax.jit(exp.call)

    def logits(self, x) -> np.ndarray:
        """x: (N, *sample_shape) float32 -> (N, num_classes)."""
        import jax.numpy as jnp
        x = jnp.asarray(x, jnp.float32)
        if None in self._fns:
            return np.asarray(self._fns[None](x))
        n = x.shape[0]
        if n in self._fns:
            return np.asarray(self._fns[n](x))
        # pad to the smallest exported batch that fits, or tile the largest
        sizes = sorted(self._fns)
        fit = [s for s in sizes if s >= n]
        if fit:
            pad = fit[0] - n
            xp = jnp.concatenate([x, jnp.zeros((pad, *x.shape[1:]),
                                               x.dtype)]) if pad else x
            return np.asarray(self._fns[fit[0]](xp))[:n]
        out, s = [], sizes[-1]
        for i in range(0, n, s):
            out.append(self.logits(x[i:i + s]))
        return np.concatenate(out)[:n]

    def predict(self, clips, average_clips: Optional[str] = None) -> np.ndarray:
        """clips: (nc, *sample_shape) one sample's test clips -> (classes,)
        averaged scores (reference recognizers/base.py:113-116)."""
        mode = average_clips or self.manifest["average_clips"]
        lo = self.logits(np.asarray(clips))
        if mode == "prob":
            e = np.exp(lo - lo.max(axis=-1, keepdims=True))
            lo = e / e.sum(axis=-1, keepdims=True)
        return lo.mean(axis=0)


def load_exported(path: str) -> ServedRecognizer:
    return ServedRecognizer(path)
