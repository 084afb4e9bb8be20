"""On-chip timing of the fused eval-mode dgmstcn kernel vs the XLA module
path at DGSTGCN stage shapes.  Run from the repo root on the real TPU; the
result decides whether tcn_use_pallas defaults on.

Inputs are generated ON DEVICE (jax.random): the stage-0 activation at
n=2048 is 1.3 GB, and shipping that through the remote tunnel stalls the
bench for minutes before the first compile even starts.
"""
import sys
sys.path.insert(0, ".")
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dsgcn_tpu.ops.tcn import DGMSTCN

rng = np.random.default_rng(0)


def bench(fn, args, iters=6, reps=2):
    s = float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        s = float(out)  # noqa: F841
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def run(n, T, C, stride, label):
    t0 = time.perf_counter()
    x = jax.jit(lambda k: jax.random.normal(k, (n, T, 25, C), jnp.float32))(
        jax.random.PRNGKey(1))
    a = DGMSTCN(out_channels=C, stride=stride)
    b = DGMSTCN(out_channels=C, stride=stride, use_pallas=True)
    v = jax.jit(lambda k, xx: a.init(k, xx, train=False))(
        jax.random.PRNGKey(0), jnp.zeros((2, T, 25, C), jnp.float32))
    v = jax.tree.map(lambda p: jnp.asarray(
        (rng.standard_normal(p.shape) * 0.3
         + (1.0 if p.ndim == 1 else 0.0)).astype(np.float32)), v)
    v = {"params": v["params"],
         "batch_stats": jax.tree.map(lambda s: jnp.abs(s) + 0.1,
                                     v["batch_stats"])}
    fa = jax.jit(lambda vv, xx: a.apply(vv, xx, train=False).sum())
    fb = jax.jit(lambda vv, xx: b.apply(vv, xx, train=False).sum())
    da = bench(fa, (v, x))
    print(f"  [{label}] xla done +{time.perf_counter()-t0:.0f}s",
          file=sys.stderr, flush=True)
    db = bench(fb, (v, x))
    # numeric check on-chip
    ya = jax.jit(lambda vv, xx: a.apply(vv, xx, train=False))(v, x[:16])
    yb = jax.jit(lambda vv, xx: b.apply(vv, xx, train=False))(v, x[:16])
    rel = float(jnp.max(jnp.abs(ya - yb)) / (jnp.max(jnp.abs(ya)) + 1e-9))
    print(f"{label}: xla {da*1e3:.2f}ms  fused {db*1e3:.2f}ms  "
          f"speedup {da/db:.2f}x  rel-err {rel:.1e}", flush=True)


n = 2048
run(n, 100, 64, 1, "stage0-4 n2048 T100 C64 s1")
run(n, 100, 128, 2, "stage5 n2048 T100->50 C128 s2")
run(n, 50, 256, 2, "stage8 n2048 T50->25 C256 s2")
run(n, 25, 256, 1, "stage9 n2048 T25 C256 s1")
