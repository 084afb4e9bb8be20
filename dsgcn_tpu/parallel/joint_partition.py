"""Joint-partition (graph-axis) parallelism for the spatial aggregation.

The reference scales only by data parallelism (SURVEY §2.9); the novel TPU
axis is partitioning the 25-joint skeleton across chips.  Because the hot
models' adjacencies are dense 25x25 (mode='random'), the 1-hop-halo of sparse
ST-GCN generalizes to an all-to-all of joint features — implemented here as a
**ring exchange overlapped with per-chunk contraction** (the classic ring
matmul): each device owns a source-joint shard, accumulates its output-joint
columns, and ppermutes its shard around the ring over ICI while the MXU chews
on the chunk it already has.

Joints are padded to a multiple of the shard count (pad joints have zero
features and zero adjacency, so results are exact).
"""
from __future__ import annotations




import jax
import jax.numpy as jnp
import numpy as np

from .mesh import GRAPH_AXIS


def pad_to_multiple(V: int, shards: int) -> int:
    return ((V + shards - 1) // shards) * shards


def pad_joints(x: jnp.ndarray, shards: int, axis: int) -> jnp.ndarray:
    """Zero-pad the joint axis to a multiple of ``shards``."""
    V = x.shape[axis]
    Vp = pad_to_multiple(V, shards)
    if Vp == V:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, Vp - V)
    return jnp.pad(x, pads)


def pad_adjacency(A: jnp.ndarray, shards: int) -> jnp.ndarray:
    """Zero-pad (K, V, V) adjacency on both joint axes."""
    K, V, _ = A.shape
    Vp = pad_to_multiple(V, shards)
    if Vp == V:
        return A
    return jnp.pad(A, ((0, 0), (0, Vp - V), (0, Vp - V)))


def ring_spatial_aggregate(x_shard: jnp.ndarray, A: jnp.ndarray,
                           axis_name: str = GRAPH_AXIS) -> jnp.ndarray:
    """Distributed y[.., w, c] = sum_k sum_v x[.., v, k, c] * A[k, v, w].

    ``x_shard``: (..., Vg, K, C) — this device's source-joint rows (joint axis
    third-from-last).  ``A``: (K, Vp, Vp) full padded adjacency, replicated.
    Returns this device's output-joint columns (..., Vg, C).

    Ring schedule: at step i the device contracts the shard it holds (source
    rows of device (g+i) mod G) against the matching A rows for its own output
    columns, then forwards the shard to its ring neighbor.  The ppermute is
    issued before the contraction so transfer overlaps compute.
    """
    G = jax.lax.axis_size(axis_name)
    g = jax.lax.axis_index(axis_name)
    Vg = x_shard.shape[-3]
    K = A.shape[0]

    # my output columns: A[:, :, g*Vg : (g+1)*Vg]
    A_cols = jax.lax.dynamic_slice_in_dim(A, g * Vg, Vg, axis=2)  # (K, Vp, Vg)

    perm = [(j, (j - 1) % G) for j in range(G)]

    def step(i, carry):
        y, x_cur = carry
        src = (g + i) % G
        rows = jax.lax.dynamic_slice_in_dim(A_cols, src * Vg, Vg,
                                            axis=1)               # (K, Vg, Vg)
        # start the transfer, then contract the chunk we already hold
        x_next = jax.lax.ppermute(x_cur, axis_name, perm)
        y = y + jnp.einsum("...vkc,kvw->...wc", x_cur, rows,
                           preferred_element_type=jnp.promote_types(x_cur.dtype, jnp.float32)).astype(y.dtype)
        return (y, x_next)

    y0 = jnp.zeros(x_shard.shape[:-3] + (Vg, x_shard.shape[-1]),
                   x_shard.dtype)
    y, _ = jax.lax.fori_loop(0, G, step, (y0, x_shard))
    return y


def jp_unit_gcn_forward(x: jnp.ndarray, A: jnp.ndarray, conv_kernel,
                        conv_bias, axis_name: str = GRAPH_AXIS):
    """Joint-partitioned unit_gcn 'pre' spatial conv for use inside shard_map.

    ``x``: (N, T, Vg, C_in) source-joint shard; conv params for the pre 1x1
    (C_in -> K*C_out).  Returns (N, T, Vg, C_out) output-joint shard.
    """
    K = A.shape[0]
    h = jnp.einsum("ntvc,co->ntvo", x, conv_kernel) + conv_bias
    n, t, vg, _ = h.shape
    cout = h.shape[-1] // K
    h = h.reshape(n, t, vg, K, cout)
    return ring_spatial_aggregate(h, A, axis_name)


def edges_per_second(V: int, K: int, batch: int, T: int, seconds: float) -> float:
    """Edges/s metric: every (k, v, w) pair processed per (batch, frame)."""
    return batch * T * K * V * V / seconds


def jp_comm_volume(n: int, t: int, V: int, K: int, mid: int, G: int,
                   itemsize: int = 4) -> dict:
    """Per-device communication accounting for one joint-partitioned dggcn
    block (DGGCN._jp_aggregate): what crosses ICI per forward.

    * ``allgather_bytes``: the (N, K, mid, V) query tensor x1 — gathered once
      (each device receives (G-1)/G of it).
    * ``ppermute_bytes``: the (N, T, V/G, K, mid) pre_x shard circulates
      G-1 hops (the G-th ppermute carries it back to its origin and is dead
      code the compiler can drop, but we count the issued volume).
    * ``overlap_flops_per_hop``: MXU work issued after each ppermute — the
      per-chunk contraction 2*N*T*K*mid*(V/G)^2 — so DMA and matmul proceed
      concurrently.

    Honest accounting: the per-hop arithmetic intensity is
    overlap_flops / hop_bytes = (V/G)/2 FLOP per byte — K, mid, N and T all
    cancel.  At V=25 that is at most ~12 FLOP/B, far below the ~4000 FLOP/B
    a v5e needs to hide ICI behind the MXU, so the ring is
    bandwidth-dominated whenever the contraction runs near peak: the graph
    axis buys per-device activation memory (1/G) and a second scaling axis
    when the batch cannot grow, not free FLOPs.  This is a property of the
    25-joint skeleton (the reference has no comparable axis at all,
    SURVEY §2.9); the accounting below keeps the claim measurable.
    """
    vl = V // G
    allgather = n * K * mid * (V - vl) * itemsize
    ppermute = n * t * vl * K * mid * G * itemsize
    chunk_flops = 2 * n * t * K * mid * vl * vl
    return dict(allgather_bytes=allgather, ppermute_bytes=ppermute,
                overlap_flops_per_hop=chunk_flops)
