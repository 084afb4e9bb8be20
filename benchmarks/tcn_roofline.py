"""Roofline study of the dgmstcn hot region at production shapes: is the
XLA lowering close enough to speed-of-light that a fused Pallas kernel
cannot pay?  (VERDICT r1 item 7 / SURVEY §7 step 7.)"""
import sys
import time
sys.path.insert(0, ".")

import numpy as np
import jax
import jax.numpy as jnp

from dsgcn_tpu.ops.tcn import DGMSTCN

PEAK_FLOPS = 197e12   # v5e bf16 MXU; fp32 ~ 1/2 of that on v5e
PEAK_FP32 = 98.5e12
HBM_BW = 819e9        # v5e


def bench(fn, args, iters=8, reps=3):
    s = float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        s = float(out)  # noqa: F841
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def run(n, t, v, c, stride=1, label=""):
    mod = DGMSTCN(out_channels=c, num_joints=v, stride=stride)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((n, t, v, c)).astype(np.float32))
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)

    fwd = jax.jit(lambda vr, xx: mod.apply(vr, xx, train=False).sum())
    dt = bench(fwd, (variables, x))

    comp = jax.jit(lambda vr, xx: mod.apply(vr, xx, train=False)) \
        .lower(variables, x).compile()
    ca = comp.cost_analysis()
    flops = float(ca.get("flops", 0))
    bytes_ = float(ca.get("bytes accessed", 0))
    t_flop = flops / PEAK_FP32
    t_mem = bytes_ / HBM_BW
    roof = max(t_flop, t_mem)
    print(f"{label}: dt={dt*1e6:.0f}us flops={flops/1e9:.2f}G "
          f"bytes={bytes_/1e6:.1f}MB t_flop={t_flop*1e6:.0f}us "
          f"t_mem={t_mem*1e6:.0f}us roofline={roof*1e6:.0f}us "
          f"eff={100*roof/dt:.0f}% bound={'mem' if t_mem>t_flop else 'flop'}")
    # ideal-fusion roofline: read x once + write y once + weights
    ideal_bytes = x.size * 4 + (n * (t // stride) * (v + 1) * c) * 4
    print(f"{label}: ideal-fusion t_mem={ideal_bytes/HBM_BW*1e6:.0f}us "
          f"-> max possible speedup if mem-bound "
          f"{(t_mem/ (ideal_bytes/HBM_BW)):.2f}x")


if __name__ == "__main__":
    # DGSTGCN stages at saturated batch (n = N*M = 1024 at b512 infer)
    run(1024, 100, 26, 64, label="stage0-4 n1024 T100 C64")
    run(1024, 50, 26, 128, stride=1, label="stage5-7 n1024 T50 C128")
    run(1024, 25, 26, 256, stride=1, label="stage8-9 n1024 T25 C256")
