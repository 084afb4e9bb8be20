"""Timing probe: does a V=32 joint-padded eval path pay off end-to-end?

The README roofline section measured the Pallas copy floor of the fused
kernel's (T, 25, KC) block at 139 GB/s vs 244 GB/s for the same block at
V=32 (sublane padding of the 25-row dim), suggesting up to ~75% memory-
roofline headroom for the eval path (VERDICT r4 #3).  This probe runs the
REAL dgstgcn/dsgcn eval models with the joint axis physically padded
25 -> 32 (zero joints, zero-padded A) and compares FPS against the stock
V=25 model at the same batches.  Semantics here are NOT exact (no softmax
source masking, global-mean over 32 rows) — this is a pure timing probe to
decide whether to build the exact padded mode.

Usage: python benchmarks/pad32_probe.py [dgstgcn|dsgcn] [batches...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from dsgcn_tpu.graph import Graph                      # noqa: E402
from dsgcn_tpu.models.builder import build_named_model, model_cfg  # noqa: E402
from dsgcn_tpu.models import builder as _builder       # noqa: E402
from dsgcn_tpu.models.backbones import DGSTGCN         # noqa: E402


VP = 32


class _PaddedGraph:
    """Graph whose arrays are zero-padded on the joint axis to VP."""

    def __init__(self, g: Graph):
        K, V, _ = g.A.shape
        A = np.zeros((K, VP, VP), g.A.dtype)
        A[:, :V, :V] = g.A
        self.A = A
        self.node_type = (list(g.node_type) + [0] * (VP - V)
                          if g.node_type is not None else None)
        if g.edge_type is not None:
            et = np.zeros((VP, VP), g.edge_type.dtype)
            et[:V, :V] = g.edge_type
            self.edge_type = et
        else:
            self.edge_type = None
        self.edge_type_num = g.edge_type_num


class _PaddedDGSTGCN(DGSTGCN):
    def _graph(self):
        return _PaddedGraph(Graph.from_config(self.graph_cfg))


def bench(fn, args, iters=10, reps=5):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        float(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "dgstgcn"
    batches = [int(b) for b in sys.argv[2:]] or [16, 64, 256]
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    rng = np.random.default_rng(0)
    bmax = max(batches)
    x25 = jnp.asarray(
        rng.standard_normal((bmax, 2, 100, 25, 3)).astype(np.float32))
    x32 = jnp.zeros((bmax, 2, 100, VP, 3), jnp.float32)
    x32 = x32.at[:, :, :, :25].set(x25)

    model25 = build_named_model(name, num_classes=60)
    v25 = jax.jit(lambda k, x_: model25.init(k, x_, train=False))(
        jax.random.PRNGKey(0), x25[:2])
    fwd25 = jax.jit(lambda v_, x_: model25.apply(v_, x_, train=False).sum())

    # padded model: swap the backbone class for the padded-graph variant
    from dsgcn_tpu.models.builder import build_model
    cfg = model_cfg(name, num_classes=60)
    cfg["backbone"]["tcn_num_joints"] = VP
    orig = _builder.BACKBONES["DGSTGCN"]
    _builder.BACKBONES["DGSTGCN"] = _PaddedDGSTGCN
    try:
        model32 = build_model(cfg)
    finally:
        _builder.BACKBONES["DGSTGCN"] = orig
    v32 = jax.jit(lambda k, x_: model32.init(k, x_, train=False))(
        jax.random.PRNGKey(0), x32[:2])
    fwd32 = jax.jit(lambda v_, x_: model32.apply(v_, x_, train=False).sum())

    for b in batches:
        dt25 = bench(fwd25, (v25, x25[:b]), iters=max(4, 256 // b))
        dt32 = bench(fwd32, (v32, x32[:b]), iters=max(4, 256 // b))
        print(f"{name} b{b}: V=25 {b/dt25:8.1f} fps | V=32 {b/dt32:8.1f} fps "
              f"| ratio {dt25/dt32:.3f}", flush=True)


if __name__ == "__main__":
    main()
