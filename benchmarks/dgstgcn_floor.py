"""Measured e2e floor for the dgstgcn fp32 eval path: replace the fused
dynamic-graph aggregation kernel with a Pallas COPY of identical block
shape/grid (pre -> y unchanged).  Everything else — XLA pre/post convs, BN
folds, TCN, residuals, the kernel's own DMA legs — is untouched, so

    fps(copy-agg) = the model's throughput ceiling if the aggregation math
                    were free; the gap to fps(real) is the aggregation
                    compute margin on top of its DMA.

Feeds the README roofline decomposition (VERDICT r3 #2 option B).
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def _bench(fn, args, iters=8, reps=3):
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from dsgcn_tpu.models.builder import build_model, model_cfg
    from dsgcn_tpu.ops.pallas import dyn_graph

    real_agg = dyn_graph.fused_dyn_graph_agg

    def copy_agg(pre_x, x1, x2, A, alpha, beta, ew, eb, sel, K, Cm,
                 edge_k, edge_num, interpret):
        # x1/x2 stay custom-call operands so XLA cannot DCE the query convs
        # + T-pooling — only the aggregation math itself is removed
        N, T, V, KC = pre_x.shape
        tt = dyn_graph._t_tile(T, V, KC, pre_x.dtype.itemsize)
        nt = T // tt

        def kern(p_ref, x1_ref, x2_ref, o_ref):
            o_ref[0] = p_ref[0]

        q = lambda a: pl.BlockSpec(                     # noqa: E731
            (1,) + a.shape[1:], lambda n, t: (n,) + (0,) * (a.ndim - 1),
            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kern, grid=(N, nt),
            in_specs=[pl.BlockSpec((1, tt, V, KC), lambda n, t: (n, t, 0, 0),
                                   memory_space=pltpu.VMEM), q(x1), q(x2)],
            out_specs=pl.BlockSpec((1, tt, V, KC), lambda n, t: (n, t, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, T, V, KC), pre_x.dtype),
            interpret=interpret)(pre_x, x1, x2)

    rng = np.random.default_rng(0)
    xs = {b: jnp.asarray(rng.standard_normal(
        (b, 2, 100, 25, 3)).astype(np.float32)) for b in (16, 256)}

    for label, agg in (("real", real_agg), ("copy-agg", copy_agg)):
        dyn_graph.fused_dyn_graph_agg = agg
        # gcn.py imports the symbol inside the forward -> patch is picked up
        cfg = model_cfg("dgstgcn", num_classes=60)
        cfg["backbone"]["gcn_use_pallas"] = True
        cfg["backbone"]["gcn_eval_kernel"] = "fused"
        model = build_model(cfg)
        v = jax.jit(lambda k, x_: model.init(k, x_, train=False))(
            jax.random.PRNGKey(0), xs[16][:2])
        f = jax.jit(lambda v_, x_: model.apply(v_, x_, train=False).sum())
        row = [f"dgstgcn {label:9s}"]
        for b in (16, 256):
            dt = _bench(f, (v, xs[b]), iters=8 if b <= 64 else 4)
            row.append(f"b{b} {b / dt:8.1f} fps")
        print("  ".join(row), flush=True)
    dyn_graph.fused_dyn_graph_agg = real_agg


if __name__ == "__main__":
    main()
