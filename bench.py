"""Benchmark: DGSTGCN-family inference + training throughput on one TPU chip.

Headline metric mirrors the reference's published FPS setup
(examples/inference_speed.ipynb: batch 16, M=2 persons, T=100, V=25, fp32):
samples/sec for the DGSTGCN backbone vs the RTX 2080Ti number (409 FPS,
BASELINE.md).  Extra fields report saturated-batch throughput (batch 1024 —
small batches are dispatch-latency-bound on TPU), bf16 throughput, training
clips/s/chip, and an edges/s rate for the DS-GCN dynamic-graph op.

Prints ONE JSON line.
"""
import json
import time

import numpy as np


def _bench(fn, args, iters=30, warmup=2, reps=3):
    """Best-of-reps mean iteration time (robust to transient TPU-tunnel
    contention)."""
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    per = max(iters // reps, 1)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(per):
            out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / per)
    return best


def main():
    import jax
    # persistent compile cache: first run after a code change pays ~8 remote
    # compiles (20-90s each on the TPU tunnel); later runs start warm
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from dsgcn_tpu.core.train import TrainState, make_optimizer, train_step
    from dsgcn_tpu.models.builder import build_model, build_named_model, model_cfg

    m, t, v, c = 2, 100, 25, 3
    rng = np.random.default_rng(0)
    x16 = jnp.asarray(rng.standard_normal((16, m, t, v, c)).astype(np.float32))
    x1k = jnp.asarray(rng.standard_normal((1024, m, t, v, c)).astype(np.float32))

    results = {}
    variables_by_name = {}
    # saturated batch: dgstgcn has K=8 subsets -> 4x the dynamic-graph memory
    # of dsgcn; cap its batch to stay inside single-chip HBM
    sat_batch = {"dgstgcn": 256, "dsgcn": 1024}
    for name in ("dgstgcn", "dsgcn"):
        model = build_named_model(name, num_classes=60)
        variables = model.init(jax.random.PRNGKey(0), x16[:2], train=False)
        variables_by_name[name] = (model, variables)
        fwd = jax.jit(lambda v_, x_: model.apply(v_, x_, train=False))
        results[f"{name}_infer_fps_b16"] = 16 / _bench(
            fwd, (variables, x16), iters=80, warmup=5, reps=5)
        sb = sat_batch[name]
        results[f"{name}_infer_fps_b{sb}"] = sb / _bench(
            fwd, (variables, x1k[:sb]), iters=9)

        # training step throughput (clips/s/chip); batch 64 fits single-chip
        # HBM without remat (the (N,K,Cm,V,V) dynamic-graph tensors pad 3-5x
        # on the lane axis at V=25)
        bs = 64
        xb = x1k[:bs]
        params, stats = variables["params"], variables.get("batch_stats", {})
        tx, _ = make_optimizer(lr=0.1, total_steps=100)
        state = TrainState.create(model.apply, params, stats, tx)
        tb = dict(keypoint=xb, label=jnp.asarray(rng.integers(0, 60, size=bs)))
        step = jax.jit(train_step)  # no donation: variables reused below
        state, _ = step(state, tb, jax.random.PRNGKey(0))
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            state, metrics = step(state, tb, jax.random.PRNGKey(0))
        jax.block_until_ready(metrics)
        results[f"{name}_train_clips_per_sec_b{bs}"] = bs * iters / (
            time.perf_counter() - t0)

    # fused Pallas dynamic-graph kernel path for the flagship
    model_pl = build_named_model("dsgcn", num_classes=60, use_pallas=True)
    _, variables = variables_by_name["dsgcn"]
    fwd = jax.jit(lambda v_, x_: model_pl.apply(v_, x_, train=False))
    results["dsgcn_infer_fps_b1024_pallas"] = 1024 / _bench(
        fwd, (variables, x1k), iters=9)

    # fused-kernel training throughput (custom VJP: pallas fwd, XLA bwd)
    from dsgcn_tpu.core.train import TrainState as _TS
    tx2, _ = make_optimizer(lr=0.1, total_steps=100)
    st2 = _TS.create(model_pl.apply, variables["params"],
                     variables.get("batch_stats", {}), tx2)
    tb2 = dict(keypoint=x1k[:64],
               label=jnp.asarray(rng.integers(0, 60, size=64)))
    step2 = jax.jit(train_step)
    st2, _ = step2(st2, tb2, jax.random.PRNGKey(0))
    t0 = time.perf_counter()
    for _ in range(10):
        st2, m2 = step2(st2, tb2, jax.random.PRNGKey(0))
    jax.block_until_ready(m2)
    results["dsgcn_train_clips_per_sec_b64_pallas"] = 64 * 10 / (
        time.perf_counter() - t0)

    # bf16 saturated inference for the flagship
    from dsgcn_tpu.models.recognizer import RecognizerGCN
    model, variables = variables_by_name["dsgcn"]
    model_bf16 = RecognizerGCN(backbone=model.backbone, head=model.head,
                               compute_dtype="bfloat16")
    fwd = jax.jit(lambda v_, x_: model_bf16.apply(v_, x_, train=False))
    results["dsgcn_infer_fps_b1024_bf16"] = 1024 / _bench(
        fwd, (variables, x1k), iters=9)

    # edges/s of the DS-GCN dynamic-graph aggregation at saturated batch:
    # every (k, u, v) pair per (sample, person, output frame) counts as an edge
    K, Vj, T_out = 3, 25, 100
    dt = 1024 / results["dsgcn_infer_fps_b1024"]  # noqa: F841 (kept below)
    stages = 10
    results["dsgcn_edges_per_sec"] = 1024 * m * T_out * K * Vj * Vj * stages / dt

    value = results["dgstgcn_infer_fps_b16"]
    baseline_2080ti = 409.0  # BASELINE.md: DGSTGCN FPS on RTX 2080Ti
    print(json.dumps({
        "metric": "dgstgcn_infer_fps_b16_T100_fp32",
        "value": round(value, 2),
        "unit": "samples/s",
        "vs_baseline": round(value / baseline_2080ti, 3),
        **{k: round(float(v), 2) for k, v in results.items()},
    }))


if __name__ == "__main__":
    main()
