"""End-to-end eval-kernel A/B for the dynamic-graph families: full-model
inference FPS under each gcn_eval_kernel mode, plus logits cross-agreement.

Usage:  python benchmarks/dyn_kernel_ab.py <family> [b16,b256] [modes,...]
e.g.    python benchmarks/dyn_kernel_ab.py dgstgcn 16,256 mega,bdps,fused

The isolated-kernel probe (bd_agg_probe.py) ranks aggregation kernels alone;
this ranks what actually ships: inside the model the alternative to a bd/bdps
aggregation (XLA pre/post flat matmuls around it) is the whole-block mega
kernel (pre/post at ~3.5% MXU in-kernel), so in-isolation losers can be
end-to-end winners — that is exactly what full-bd showed on dsgcn.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _bench(fn, args, iters=8, reps=3):
    s = float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        s = float(out)  # noqa: F841
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    fam = sys.argv[1] if len(sys.argv) > 1 else "dgstgcn"
    batches = [int(b) for b in
               (sys.argv[2] if len(sys.argv) > 2 else "16,256").split(",")]
    modes = (sys.argv[3] if len(sys.argv) > 3 else "mega,bdps,fused").split(",")

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from dsgcn_tpu.models.builder import build_model, model_cfg

    rng = np.random.default_rng(0)
    xs = {b: jnp.asarray(
        rng.standard_normal((b, 2, 100, 25, 3)).astype(np.float32))
        for b in batches}
    x2 = jnp.asarray(rng.standard_normal((2, 2, 100, 25, 3)).astype(np.float32))

    base_logits = None
    for mode in modes:
        cfg = model_cfg(fam, num_classes=60)   # backend default: gcn pallas
        cfg["backbone"]["gcn_use_pallas"] = True
        cfg["backbone"]["gcn_eval_kernel"] = mode
        model = build_model(cfg)
        variables = jax.jit(lambda k, x_: model.init(k, x_, train=False))(
            jax.random.PRNGKey(0), x2)
        fwd = jax.jit(lambda v_, x_: model.apply(v_, x_, train=False))
        fsum = jax.jit(lambda v_, x_: model.apply(v_, x_, train=False).sum())
        lg = np.asarray(fwd(variables, x2))
        if base_logits is None:
            base_logits = lg
            err = 0.0
        else:
            err = float(np.max(np.abs(lg - base_logits))
                        / (np.max(np.abs(base_logits)) + 1e-9))
        line = [f"{fam} {mode:5s} rel-err {err:.2e}"]
        for b in batches:
            dt = _bench(fsum, (variables, xs[b]), iters=8 if b <= 64 else 4)
            line.append(f"b{b} {b / dt:8.1f} fps")
        print("  ".join(line), flush=True)


if __name__ == "__main__":
    main()
