"""On-chip validation + timing of the mega-fused eval blocks and the fused
dgmstcn kernel: full dgstgcn/dsgcn models, fused vs unfused, at saturated
batch.  Run from the repo root on the real TPU after kernel changes; decides
the dispatch defaults (gcn mega path, tcn_use_pallas).
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def bench(fn, args, iters=4, reps=2):
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
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from dsgcn_tpu.models.builder import build_model, model_cfg

    rng = np.random.default_rng(0)
    for name, bs in (("dgstgcn", 512), ("dsgcn", 512)):
        x = jnp.asarray(rng.standard_normal(
            (bs, 2, 100, 25, 3)).astype(np.float32))
        variants = {
            "xla": dict(gcn_use_pallas=False),
            "3piece+megaGCN": dict(gcn_use_pallas=True),
            "megaGCN+fusedTCN": dict(gcn_use_pallas=True,
                                     tcn_use_pallas=True),
        }
        outs, times = {}, {}
        for label, kw in variants.items():
            cfg = model_cfg(name, num_classes=60)
            cfg["backbone"].update(kw)
            m = build_model(cfg)
            if label == "xla":
                v = jax.jit(lambda k, xx: m.init(k, xx, train=False))(
                    jax.random.PRNGKey(0), x[:2])
            fwd = jax.jit(lambda vv, xx: m.apply(vv, xx, train=False).sum())
            times[label] = bench(fwd, (v, x))
            outs[label] = jax.jit(
                lambda vv, xx: m.apply(vv, xx, train=False))(v, x[:16])
        base = outs["xla"]
        scale = float(jnp.max(jnp.abs(base))) + 1e-9
        for label in variants:
            rel = float(jnp.max(jnp.abs(outs[label] - base))) / scale
            print(f"{name} {label:18s}: {bs / times[label]:8.1f} clips/s  "
                  f"({times[label]*1e3:7.1f} ms)  rel-vs-xla {rel:.1e}",
                  flush=True)


if __name__ == "__main__":
    main()
