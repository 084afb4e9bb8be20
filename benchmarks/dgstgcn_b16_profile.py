"""Profile the dgstgcn b16 eval step on the real chip: per-op device-time
table for the headline configuration (batch 16, M=2, T=100, V=25, fp32),
to locate the residual between the b16 device-loop FPS and the b64 point.

Usage:  python benchmarks/dgstgcn_b16_profile.py [batch]
"""
import sys
import tempfile
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, ".")
from dsgcn_tpu.models.builder import build_named_model  # noqa: E402
from dsgcn_tpu.utils.xprof import op_table  # noqa: E402


def main():
    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((bs, 2, 100, 25, 3)).astype(np.float32))
    model = build_named_model("dgstgcn", num_classes=60)
    variables = jax.jit(lambda k, x_: model.init(k, x_, train=False))(
        jax.random.PRNGKey(0), x[:2])
    fwd = jax.jit(lambda v_, x_: model.apply(v_, x_, train=False).sum())
    float(fwd(variables, x))  # compile + warm

    t0 = time.perf_counter()
    for _ in range(20):
        out = fwd(variables, x)
    s = float(out)  # noqa: F841
    dt = (time.perf_counter() - t0) / 20
    print(f"b{bs}: {dt*1e3:.2f} ms/iter = {bs/dt:.0f} fps")

    logdir = tempfile.mkdtemp(prefix="dgstgcn_prof_")
    with jax.profiler.trace(logdir):
        for _ in range(5):
            out = fwd(variables, x)
        float(out)
    rows = op_table(logdir)   # (name, total_ms over the 5 traced iters, count)
    total_ms = sum(r[1] for r in rows)
    print(f"device total {total_ms/5*1e3:.0f} us/iter over 5 iters; top ops:")
    acc = 0.0
    for name, t_ms, _count in rows[:25]:
        acc += t_ms
        print(f"  {t_ms/5*1e3:9.1f} us/iter  {100*t_ms/total_ms:5.1f}%  "
              f"cum {100*acc/total_ms:5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
