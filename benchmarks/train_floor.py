"""Decompose the dgstgcn/dsgcn TRAIN step on chip (VERDICT r4 #4).

Answers, with measurements:
1. where the b64 step's time goes — fwd vs bwd vs optimizer-update device
   time (timed by differencing: loss-only, grad-only, full step);
2. why saturated-batch b256+full-remat loses to b64 (the remat tax:
   recomputing every block forward — including the fused aggregation
   kernel — inside the backward);
3. what selective remat ('tcn': only the multi-branch TCN region
   rematerializes; the custom-VJP aggregation keeps its residuals) and
   bf16-compute training (f32 master weights) buy at each batch.

Plus an xprof op-bucket table of the full step (custom-call = Pallas
fwd/bwd kernels, convolution/dot = the 1x1 convs + head, fusion =
XLA-fused elementwise/BN chains, transpose/copy = layout moves).
NOTE: on the remote-tunnel platform jax.profiler.trace currently returns
device planes with ZERO events (verified with a bare matmul — a platform
limitation, not a plane-name mismatch), so the bucket table can come back
empty there; the fwd/bwd/update differencing above is the reliable
decomposition on that platform.

Usage: python benchmarks/train_floor.py [dgstgcn|dsgcn] [batches...]
"""
import functools
import sys
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from dsgcn_tpu.core.train import (TrainState, loss_and_metrics,  # noqa: E402
                                  make_optimizer, train_step)
from dsgcn_tpu.models.builder import build_model, model_cfg  # noqa: E402
from dsgcn_tpu.utils.xprof import op_table  # noqa: E402


def timeit(fn, args, iters=6, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    _force(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _force(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _force(out):
    leaves = jax.tree.leaves(out)
    # fetch one scalar-ish leaf to force the dependent chain
    float(np.asarray(leaves[-1]).ravel()[0])


def main():
    name = sys.argv[1] if len(sys.argv) > 1 else "dgstgcn"
    batches = [int(b) for b in sys.argv[2:]] or [64, 256]
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    rng = np.random.default_rng(0)
    bmax = max(batches)
    x = jnp.asarray(
        rng.standard_normal((bmax, 2, 100, 25, 3)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 60, size=bmax))

    def setup(remat):
        cfg = model_cfg(name, num_classes=60)
        cfg["backbone"]["remat"] = remat
        mdl = build_model(cfg)
        vr = jax.jit(lambda k, x_: mdl.init(k, x_, train=False))(
            jax.random.PRNGKey(0), x[:2])
        tx, _ = make_optimizer(lr=0.1, total_steps=100)
        state = TrainState.create(mdl.apply, vr["params"],
                                  vr.get("batch_stats", {}), tx)
        return mdl, state

    # ---- fwd / bwd / update split at each batch (no remat, fits at b64) ---
    mdl, state = setup(False)
    for b in batches:
        if b > 64:
            continue   # un-rematted b256 OOMs; the split is measured at b64
        tb = dict(keypoint=x[:b], label=y[:b])
        key = jax.random.PRNGKey(0)
        fwd = jax.jit(lambda s, t_: loss_and_metrics(
            s.apply_fn, s.params, s.batch_stats, t_, key)[0])
        grad = jax.jit(lambda s, t_: jax.grad(lambda p: loss_and_metrics(
            s.apply_fn, p, s.batch_stats, t_, key)[0])(s.params))
        full = jax.jit(train_step)
        t_f = timeit(fwd, (state, tb))
        t_g = timeit(grad, (state, tb))
        t_s = timeit(full, (state, tb, key))
        print(f"{name} b{b}: fwd {t_f*1e3:7.1f} ms | fwd+bwd {t_g*1e3:7.1f} "
              f"(bwd ~{(t_g-t_f)*1e3:.1f}) | full step {t_s*1e3:7.1f} "
              f"(update ~{(t_s-t_g)*1e3:.1f}) | {b/t_s:6.1f} clips/s",
              flush=True)

    # ---- remat x dtype grid ----------------------------------------------
    for remat in (False, True, "tcn"):
        mdl, state = setup(remat)
        for dtype in (None, "bfloat16"):
            step = jax.jit(functools.partial(train_step,
                                             compute_dtype=dtype))
            for b in batches:
                if b > 64 and remat is False:
                    continue
                tag = (f"remat={remat!s:5}"
                       f" dtype={dtype or 'f32':8} b{b}")
                try:
                    dt = timeit(step, (state, dict(keypoint=x[:b],
                                                   label=y[:b]),
                                       jax.random.PRNGKey(0)))
                    print(f"{name} {tag}: {dt*1e3:7.1f} ms = "
                          f"{b/dt:6.1f} clips/s", flush=True)
                except Exception as e:
                    print(f"{name} {tag}: FAILED {type(e).__name__}: "
                          f"{str(e)[:100]}", flush=True)

    # ---- xprof bucket table of the b64 full step --------------------------
    mdl, state = setup(False)
    tb = dict(keypoint=x[:64], label=y[:64])
    step = jax.jit(train_step)
    s2, m = step(state, tb, jax.random.PRNGKey(0))
    _force(m)
    logdir = tempfile.mkdtemp(prefix=f"{name}_train_prof_")
    with jax.profiler.trace(logdir):
        for _ in range(5):
            s2, m = step(s2, tb, jax.random.PRNGKey(0))
        _force(m)
    rows = op_table(logdir)
    buckets = {}
    for nm, t_ms, _cnt in rows:
        low = nm.lower()
        for key in ("custom-call", "convolution", "dot", "transpose",
                    "copy", "reduce", "fusion", "scatter", "dynamic"):
            if key in low:
                buckets[key] = buckets.get(key, 0.0) + t_ms
                break
        else:
            buckets["other"] = buckets.get("other", 0.0) + t_ms
    total = sum(buckets.values())
    print(f"\n{name} b64 full-step xprof buckets "
          f"({total/5:.1f} ms device/iter):")
    for k, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {v/5:8.2f} ms/iter  {100*v/total:5.1f}%  {k}")
    print("top ops:")
    for nm, t_ms, _cnt in rows[:15]:
        print(f"  {t_ms/5*1e3:9.1f} us/iter  {nm[:110]}")


if __name__ == "__main__":
    main()
