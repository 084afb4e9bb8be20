"""Model-zoo inference FPS table — the TPU analog of the reference's
examples/inference_speed.ipynb (batch 16, M=2 persons, T=100, V=25, fp32).

Prints a markdown table with the reference's published GPU numbers
(BASELINE.md) alongside ours for direct comparison, plus saturated-batch
throughput per model.

Timing protocol (same as bench.py): every benched program returns a device
scalar whose host fetch forces execution — on the remote-tunnel platform
``jax.block_until_ready`` returns before the computation finishes, so the
round-1 version of this table measured dispatch rate, not compute.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np

REFERENCE_FPS_2080TI = {  # BASELINE.md / examples/inference_speed.ipynb
    "aagcn": 274, "ctrgcn": 353, "dgstgcn": 409, "msg3d": 111,
    "stgcn": 518, "stgcn++": 476, "posec3d": 41,
}


def _bench(fn, args, iters=8, reps=3):
    s = float(fn(*args))   # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        s = float(out)  # noqa: F841  (forces the whole queued chain)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from dsgcn_tpu.models.builder import build_named_model

    rng = np.random.default_rng(0)
    x16 = jnp.asarray(rng.standard_normal((16, 2, 100, 25, 3)).astype(np.float32))
    sat = {"stgcn": 512, "stgcn++": 512, "aagcn": 256, "ctrgcn": 256,
           "dgstgcn": 256, "dsgcn": 512, "msg3d": 64, "sgn": 512}

    rows = []
    for name in ("stgcn", "stgcn++", "aagcn", "ctrgcn", "dgstgcn", "dsgcn",
                 "msg3d", "sgn", "posec3d"):
        if name == "posec3d":
            # heatmap pathway: reference setup is 48-frame 56x56 17-channel
            # pseudo-heatmap volumes (configs/posec3d/slowonly_ntu60_xsub.py)
            from dsgcn_tpu.configs.config import Config
            from dsgcn_tpu.models.builder import build_model
            cfgd = Config.fromfile("configs/posec3d/slowonly_ntu60_xsub.py")
            model = build_model(cfgd["model"])
            hx16 = jnp.asarray(rng.standard_normal(
                (16, 48, 56, 56, 17)).astype(np.float32))
            variables = jax.jit(
                lambda k, x_: model.init(k, x_, train=False))(
                jax.random.PRNGKey(0), hx16[:2])
            fwd = jax.jit(
                lambda v_, x_: model.apply(v_, x_, train=False).sum())
            fps16 = 16 / _bench(fwd, (variables, hx16))
            sb = 64
            hxb = jnp.asarray(rng.standard_normal(
                (sb, 48, 56, 56, 17)).astype(np.float32))
            fps_sat = sb / _bench(fwd, (variables, hxb), iters=4)
            ref = REFERENCE_FPS_2080TI[name]
            rows.append((name, fps16, fps_sat, sb, ref))
            print(f"{name:10s} b16 {fps16:10.0f}/s   b{sb} {fps_sat:10.0f}/s"
                  f"  ref(2080Ti) {ref}/s  speedup {fps16 / ref:.0f}x",
                  flush=True)
            continue
        t = 30 if name == "sgn" else 100
        xa = x16[:, :, :t] if t != 100 else x16
        model = build_named_model(name, num_classes=60)
        variables = jax.jit(
            lambda k, x_: model.init(k, x_, train=False))(
            jax.random.PRNGKey(0), xa[:2])
        fwd = jax.jit(lambda v_, x_: model.apply(v_, x_, train=False).sum())
        fps16 = 16 / _bench(fwd, (variables, xa))
        sb = sat[name]
        xb = jnp.asarray(rng.standard_normal(
            (sb, 2, t, 25, 3)).astype(np.float32))
        fps_sat = sb / _bench(fwd, (variables, xb), iters=10)
        ref = REFERENCE_FPS_2080TI.get(name)
        rows.append((name, fps16, fps_sat, sb, ref))
        print(f"{name:10s} b16 {fps16:10.0f}/s   b{sb} {fps_sat:10.0f}/s  "
              + (f"ref(2080Ti) {ref}/s  speedup {fps16 / ref:.0f}x" if ref
                 else "(no reference number)"), flush=True)

    print("\n| model | TPU v5e b16 fps | TPU v5e saturated fps | RTX 2080Ti fps | b16 speedup |")
    print("|---|---|---|---|---|")
    for name, fps16, fps_sat, sb, ref in rows:
        refs = f"{ref}" if ref else "—"
        spd = f"{fps16 / ref:.0f}x" if ref else "—"
        print(f"| {name} | {fps16:.0f} | {fps_sat:.0f} (b{sb}) | {refs} | {spd} |")


if __name__ == "__main__":
    main()
