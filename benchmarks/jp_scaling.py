"""Joint-partition ring-aggregation scaling measurement.

Runs the distributed spatial aggregation at 1/2/4/8 graph shards and reports
edges/s + scaling efficiency.  On the CPU host-device mesh this illustrates
the schedule's correctness and overlap structure; on a real multi-chip slice
the same code measures ICI scaling (the BASELINE ≥85%-to-2-hosts target).

Usage: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
           python benchmarks/jp_scaling.py
"""
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from dsgcn_tpu.graph import Graph
    from dsgcn_tpu.parallel.joint_partition import (edges_per_second,
                                                    pad_adjacency, pad_joints,
                                                    ring_spatial_aggregate)
    from dsgcn_tpu.parallel.mesh import GRAPH_AXIS, make_mesh

    g = Graph(layout="nturgb+d", mode="random", seed=0)
    A = g.A.astype(np.float32)
    K, V, _ = A.shape
    N, T, C = 64, 100, 32
    rng = np.random.default_rng(0)
    x = rng.standard_normal((N, T, V, K, C)).astype(np.float32)

    results = {}
    max_dev = len(jax.devices())
    for shards in (1, 2, 4, 8):
        if shards > max_dev:
            break
        mesh = make_mesh(n_data=1, n_graph=shards)
        Ap = jnp.asarray(np.asarray(pad_adjacency(jnp.asarray(A), shards)))
        xp = jnp.asarray(np.asarray(pad_joints(jnp.asarray(x), shards, axis=2)))

        fn = jax.jit(jax.shard_map(
            lambda xs, Af: ring_spatial_aggregate(xs, Af, GRAPH_AXIS),
            mesh=mesh,
            in_specs=(P(None, None, GRAPH_AXIS, None, None), P()),
            out_specs=P(None, None, GRAPH_AXIS, None),
            check_vma=False))
        out = fn(xp, Ap)
        jax.block_until_ready(out)
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(xp, Ap)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        eps = edges_per_second(V, K, N, T, dt)
        results[shards] = eps
        base = results[1]
        print(f"shards={shards}  {dt * 1e3:7.2f} ms  {eps / 1e9:7.2f} G edges/s"
              f"  scaling_eff={eps / base / shards:.2%}" if shards > 1 else
              f"shards={shards}  {dt * 1e3:7.2f} ms  {eps / 1e9:7.2f} G edges/s",
              flush=True)


if __name__ == "__main__":
    main()
