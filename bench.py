"""Benchmark: DGSTGCN-family inference + training throughput on one TPU chip.

Headline metric mirrors the reference's published FPS setup
(examples/inference_speed.ipynb: batch 16, M=2 persons, T=100, V=25, fp32):
samples/sec for the DGSTGCN backbone, compared against the RTX 2080Ti number
(409 FPS, BASELINE.md).  Prints ONE JSON line.
"""
import json
import time

import numpy as np


def _time_fn(fn, *args, iters=30, warmup=5):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    from dsgcn_tpu.core.train import TrainState, init_model, make_optimizer, train_step
    from dsgcn_tpu.models.builder import build_named_model

    batch, m, t, v, c = 16, 2, 100, 25, 3
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, m, t, v, c)).astype(np.float32))

    results = {}
    for name in ("dgstgcn", "dsgcn"):
        model = build_named_model(name, num_classes=60)
        variables = model.init(jax.random.PRNGKey(0), x[:2], train=False)
        fwd = jax.jit(lambda v_, x_: model.apply(v_, x_, train=False))
        dt = _time_fn(fwd, variables, x)
        results[f"{name}_infer_fps"] = batch / dt

        # training step throughput (clips/s/chip), batch 16
        params, stats = variables["params"], variables.get("batch_stats", {})
        tx, _ = make_optimizer(lr=0.1, total_steps=100)
        state = TrainState.create(model.apply, params, stats, tx)
        tb = dict(keypoint=x, label=jnp.asarray(rng.integers(0, 60, size=batch)))
        step = jax.jit(train_step)
        state, _ = step(state, tb, jax.random.PRNGKey(0))  # compile
        t0 = time.perf_counter()
        iters = 20
        for _ in range(iters):
            state, metrics = step(state, tb, jax.random.PRNGKey(0))
        jax.block_until_ready(metrics)
        results[f"{name}_train_clips_per_sec"] = batch * iters / (
            time.perf_counter() - t0)

    value = results["dgstgcn_infer_fps"]
    baseline_2080ti = 409.0  # BASELINE.md: DGSTGCN FPS on RTX 2080Ti
    print(json.dumps({
        "metric": "dgstgcn_infer_fps_b16_T100_fp32",
        "value": round(value, 2),
        "unit": "samples/s",
        "vs_baseline": round(value / baseline_2080ti, 3),
        **{k: round(v, 2) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
