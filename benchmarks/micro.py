"""Micro-benchmarks: per-component timing of the DS-GCN block on TPU.

Isolates (a) the pre/post 1x1 convs, (b) the dynamic-graph build (tanh diff +
outer product), (c) the per-channel graph contraction, (d) the dgmstcn branches
— to find where the step time actually goes before writing Pallas kernels.
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def timeit(fn, *args, iters=50, warmup=5):
    import jax
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e6  # us


def main():
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    N, T, V = 32, 100, 25
    results = {}

    for C, Tc in ((64, 100), (256, 25)):
        K, Cm = 3, max(8, int(0.125 * C))
        x = jnp.asarray(rng.standard_normal((N, Tc, V, C)).astype(np.float32))
        w_pre = jnp.asarray(rng.standard_normal((C, K * Cm)).astype(np.float32))
        w_post = jnp.asarray(rng.standard_normal((K * Cm, C)).astype(np.float32))
        x1 = jnp.asarray(rng.standard_normal((N, K, Cm, 1, V)).astype(np.float32))
        x2 = jnp.asarray(rng.standard_normal((N, K, Cm, 1, V)).astype(np.float32))
        pre_x = jnp.asarray(rng.standard_normal((N, Tc, V, K, Cm)).astype(np.float32))
        G = jnp.asarray(rng.standard_normal((N, K, Cm, V, V)).astype(np.float32))

        pre_fn = jax.jit(lambda x: jnp.einsum("ntvc,co->ntvo", x, w_pre))
        graph_fn = jax.jit(lambda a, b: jnp.tanh(a[..., :, None] - b[..., None, :]))
        contract_fn = jax.jit(
            lambda p, g: jnp.einsum("ntvkc,nkcvw->ntwkc", p, g))
        fused_fn = jax.jit(
            lambda p, a, b: jnp.einsum(
                "ntvkc,nkcvw->ntwkc", p,
                jnp.tanh(a[..., :, None] - b[..., None, :])[:, :, :, 0]))
        post_fn = jax.jit(
            lambda p: jnp.einsum("ntvo,oc->ntvc", p.reshape(N, Tc, V, K * Cm),
                                 w_post))

        tag = f"C{C}_T{Tc}"
        for nm, fn, fargs in ((f"pre1x1_{tag}", pre_fn, (x,)),
                              (f"graphbuild_{tag}", graph_fn, (x1, x2)),
                              (f"contract_{tag}", contract_fn, (pre_x, G)),
                              (f"fused_graph_contract_{tag}", fused_fn, (pre_x, x1, x2)),
                              (f"post1x1_{tag}", post_fn, (pre_x,))):
            results[nm] = timeit(fn, *fargs)
            print(f"{nm:40s} {results[nm]:10.1f} us", flush=True)

    # full model breakdown
    from dsgcn_tpu.models.builder import build_named_model
    x5 = jnp.asarray(rng.standard_normal((16, 2, 100, 25, 3)).astype(np.float32))
    for name in ("dsgcn",):
        model = build_named_model(name, num_classes=60)
        variables = model.init(jax.random.PRNGKey(0), x5[:2], train=False)
        fwd = jax.jit(lambda v_, x_: model.apply(v_, x_, train=False))
        results[f"model_{name}_b16"] = timeit(fwd, variables, x5, iters=30)

    for k, v in results.items():
        print(f"{k:40s} {v:10.1f} us", flush=True)


if __name__ == "__main__":
    main()
