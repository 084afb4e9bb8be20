"""Measure the joint-padded eval mode (apis.to_padded_inference) on chip.

The README roofline section measured the Pallas copy floor of the fused
kernel's (T, 25, KC) block at 139 GB/s vs 244 GB/s at V=32 (sublane padding
of the 25-row dim) — up to ~75% memory-roofline headroom for the eval path
(VERDICT r4 #3).  This compares stock vs padded FPS (exact semantics — the
padded model's logits match to 2e-5, tests/test_joint_padded_eval.py), in
fp32 and bf16.

Usage: python benchmarks/pad32_probe.py [dgstgcn|dsgcn] [batches...]
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from dsgcn_tpu.apis import to_bf16_inference, to_padded_inference  # noqa: E402
from dsgcn_tpu.models.builder import build_named_model  # noqa: E402


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
    x = jnp.asarray(
        rng.standard_normal((bmax, 2, 100, 25, 3)).astype(np.float32))

    model = build_named_model(name, num_classes=60)
    variables = jax.jit(lambda k, x_: model.init(k, x_, train=False))(
        jax.random.PRNGKey(0), x[:2])
    rows = {"fp32": (model, variables)}
    m16, v16 = to_bf16_inference(model, variables)
    rows["bf16"] = (m16, v16)

    for dtype, (m, v) in rows.items():
        mp, vp = to_padded_inference(m, v, v_pad=32)
        f_s = jax.jit(lambda v_, x_: m.apply(v_, x_, train=False).sum())
        f_p = jax.jit(lambda v_, x_: mp.apply(v_, x_, train=False).sum())
        # parity spot check at b4
        l_s = jax.jit(lambda v_, x_: m.apply(v_, x_, train=False))(v, x[:4])
        l_p = jax.jit(lambda v_, x_: mp.apply(v_, x_, train=False))(vp, x[:4])
        rel = float(jnp.max(jnp.abs(l_p - l_s)) / jnp.max(jnp.abs(l_s)))
        print(f"{name} {dtype}: padded-vs-stock logit rel {rel:.2e}",
              flush=True)
        for b in batches:
            dt_s = bench(f_s, (v, x[:b]), iters=max(4, 256 // b))
            dt_p = bench(f_p, (vp, x[:b]), iters=max(4, 256 // b))
            print(f"{name} {dtype} b{b}: stock {b/dt_s:8.1f} fps | "
                  f"padded {b/dt_p:8.1f} fps | speedup {dt_s/dt_p:.3f}",
                  flush=True)


if __name__ == "__main__":
    main()
