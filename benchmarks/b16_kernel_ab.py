"""A/B the dgstgcn eval kernel dispatch AT SMALL BATCH (b16 headline).

The 'auto' dispatch (bdg at mid>=64, fused below) was decided at saturated
batch; at b16 the bdg grid (N*K*G2 = 512 tiny steps at the widest stage)
pays per-step overhead that the fused kernel's (N, nt) grid does not.  This
measures the full model at b16/b64 under each forced kernel to see whether
the dispatch should be batch-adaptive.

Usage: python benchmarks/b16_kernel_ab.py [batches...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from dsgcn_tpu.models.builder import build_model, model_cfg  # noqa: E402


def bench(fn, args, iters=12, reps=5):
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
    batches = [int(b) for b in sys.argv[1:]] or [16, 64]
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    rng = np.random.default_rng(0)
    bmax = max(batches)
    x = jnp.asarray(
        rng.standard_normal((bmax, 2, 100, 25, 3)).astype(np.float32))

    variables = None
    for kernel in ("auto", "fused", "bdg", "bd"):
        cfg = model_cfg("dgstgcn", num_classes=60)
        cfg["backbone"]["gcn_use_pallas"] = True
        if kernel != "auto":
            cfg["backbone"]["gcn_eval_kernel"] = kernel
        try:
            model = build_model(cfg)
            if variables is None:
                variables = jax.jit(
                    lambda k, x_: model.init(k, x_, train=False))(
                    jax.random.PRNGKey(0), x[:2])
            fwd = jax.jit(
                lambda v_, x_: model.apply(v_, x_, train=False).sum())
            for b in batches:
                dt = bench(fwd, (variables, x[:b]), iters=max(6, 192 // b))
                print(f"dgstgcn kernel={kernel:5} b{b}: {b/dt:8.1f} fps",
                      flush=True)
        except Exception as e:
            print(f"dgstgcn kernel={kernel}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
