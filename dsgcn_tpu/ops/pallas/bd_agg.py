"""Block-diagonal dense-matmul dynamic-graph aggregation (eval fast path).

The per-channel spatial aggregation of every DG/DS-GCN block
(reference gcn.py:2341-2361)

    y[t, w, kc] = sum_v pre[t, v, kc] * G[kc, v, w]

is, in MXU terms, K*Cm independent (T, V)x(V, V) matmuls — V=25 pads both
systolic dims to 128, so the shape ceiling is ~3.5% MXU utilisation and the
round-3 mega-block kernel measured 2/3 of its time in exactly these skinny
contractions (README "Mega-block kernel roofline verdict").  This kernel
reformulates the whole aggregation as ONE dense matmul

    y2[t, w*KC + kc'] = sum_i pre2[t, i] * M[i, w*KC + kc']
    M[v*KC + kc, w*KC + kc'] = G[kc, v, w] * (kc == kc')

where pre2/y2 are the *free row-major reshapes* of pre/y to (T, V*KC): both
matmul dims become V*KC (600 at the DS-GCN narrow stage) and the MXU runs
near its shape roofline.  The FLOP inflation vs the factored form is KC-fold
on the (tiny) aggregation term — 72 MFLOP/sample at the narrow stage, well
under a microsecond at bf16 rate — bought back hundreds of times over by
shape efficiency.

M is built in VMEM per grid step with no relayouts and no HBM-side masks:

* G2d (V*KC, W): per-subset pieces (V, Cm, W) from clean broadcasts of the
  T-pooled queries (x1 transposed host-side), concatenated on the
  sublane-aligned Cm axis and merged (V, KC, W) -> (V*KC, W) — free because
  KC is a multiple of the f32 sublane tile;
* replication: M_raw = G2d @ R with R[w, j] = (w == (j + j0) // KC) built
  from 2-D iotas (an 18-MFLOP MXU matmul replicates each graph column
  across the KC output channels);
* masking: M = M_raw * (i % KC == (j + j0) % KC), also from iotas.

The N (= V*KC) dimension is column-chunked (grid dim) so the two M-sized
temporaries fit scoped VMEM at the wide stages (V*KC = 2400 at C=256).

pre/y never change layout: (N, T, V, K*Cm) <-> (N, T, V*KC) are row-major
reshapes, so the XLA-side pre conv -> BN -> relu producer and the post conv
-> BN -> relu consumer fuse around the kernel with zero transpose copies.
Those 1x1 convs stay in XLA where they run as single flat matmuls over the
whole (N*T*V) grid (VERDICT r3 #2).

Eval-only: training keeps the custom-VJP kernel in dyn_graph.py.  The
DS-GCN per-edge-class attention (reference gcn.py:2277-2288) is applied on
one subset from host-precomputed per-class projections p1/p2 (linear in the
queries, so tiny) and a constant bias field.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _iota2(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _kernel(pre_ref, x1t_ref, x2_ref, A_ref, gates_ref, *rest,
            K: int, Cm: int, edge_k: int, edge_num: int, chunk: int,
            n_subsets: int = 1, subset_div: int = 1, v_real: int = -1):
    if edge_k >= 0:
        p1t_ref, p2_ref, sel_ref, ebias_ref, out_ref, g_scr = rest
        ada_ref = None
    elif n_subsets > 1:
        # subset/group mode: ada arrives precomputed (the outer-product
        # attention contracts over the subset's FULL Cm — a g-channel grid
        # step cannot rebuild it from its slice)
        ada_ref, out_ref, g_scr = rest
        p1t_ref = p2_ref = sel_ref = ebias_ref = None
    else:
        out_ref, g_scr = rest
        p1t_ref = p2_ref = sel_ref = ebias_ref = ada_ref = None

    f32 = jnp.float32
    KC = K * Cm
    V = x1t_ref.shape[2]
    t_id = pl.program_id(1)
    c_id = pl.program_id(2)
    j0 = c_id * chunk                       # first output column of this step
    # per-subset mode: grid dim 0 runs over N*n_subsets*subset_div (channel
    # group minor, subset next); the per-subset adjacency/gates are selected
    # dynamically
    kq = ((pl.program_id(0) // subset_div) % n_subsets
          if n_subsets > 1 else None)

    # ---- G2d (V*KC, W): graph build, cached in scratch across the
    # (t, col-chunk) sweep of each sample (it depends on n only; rebuilding
    # per chunk made the wide stages M-build-bound).  Broadcasts are
    # layout-clean by construction.
    @pl.when(jnp.logical_and(t_id == 0, c_id == 0))
    def _build():
        pieces = []
        for k in range(K):
            x1k = x1t_ref[0, k]             # (V, Cm)   queries, transposed
            x2k = x2_ref[0, k]              # (Cm, W)
            if kq is not None:
                A_k = A_ref[pl.dslice(kq, 1)][0]               # (V, W)
                alpha_k, beta_k = gates_ref[0, kq], gates_ref[1, kq]
            else:
                A_k = A_ref[k]
                alpha_k, beta_k = gates_ref[0, k], gates_ref[1, k]
            if ada_ref is not None:
                ada = ada_ref[0]                # (V, W) precomputed
            else:
                raw = jax.lax.dot_general(
                    x1k, x2k, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=f32)     # (V, W)
                if 0 < v_real < V:
                    # joint-padded mode: padded SOURCE rows masked to -inf so
                    # the softmax normalization matches the unpadded graph
                    src = _iota2(raw.shape, 0)
                    raw = jnp.where(src < v_real, raw, f32(-1e30))
                ada = jax.nn.softmax(raw, axis=0)
            if k == edge_k:
                # edge-class attention ctr (one subset): per-class static
                # loop keeps every temp at (V, Cm, W)
                ea = ebias_ref[...]         # (V, Cm, W) bias field
                for e in range(edge_num):
                    ea = ea + sel_ref[e][:, None, :] * (
                        p1t_ref[0, e][:, :, None] - p2_ref[0, e][None, :, :])
                ctr = jnp.tanh(ea)
            else:
                ctr = jnp.tanh(x1k[:, :, None] - x2k[None, :, :])  # (V,Cm,W)
            G_k = ctr * alpha_k + (ada * beta_k + A_k)[:, None, :]
            pieces.append(G_k)
        Gp = jnp.concatenate(pieces, axis=1)    # (V, KC, W) — Cm 8-aligned
        g_scr[...] = Gp.reshape(V * KC, V)      # free merge: KC % 8 == 0

    G2d = g_scr[...]

    # ---- M chunk = (G2d @ R) * mask ---------------------------------------
    # R/mask from BROADCAST compares of one-axis iotas: full-size int32
    # iota pairs would add ~3 M-sized VMEM temporaries on top of the f32
    # results and thrash the scoped budget at the wide stages.
    jcol = _iota2((1, chunk), 1) + j0       # output column ids (1, chunk)
    R = ((jcol // KC) == _iota2((V, 1), 0)).astype(f32)         # (W, chunk)
    m_raw = jax.lax.dot_general(
        G2d, R, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)         # (V*KC, chunk)
    irow = _iota2((V * KC, 1), 0)
    M = m_raw * ((irow % KC) == (jcol % KC)).astype(f32)

    # ---- the one wide matmul ----------------------------------------------
    pre = pre_ref[0]                        # (Tt, V*KC)
    y = jax.lax.dot_general(
        pre, M.astype(pre.dtype), dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=f32)
    out_ref[0] = y.astype(out_ref.dtype)


def _col_chunk(VKC: int, itemsize: int, budget: int = 9 * 2 ** 20) -> int:
    """Output-column chunk: the whole V*KC width when the two M-sized f32
    temporaries fit scoped VMEM, else the largest 128-aligned chunk that
    does.  Mosaic requires lane-dim blocks divisible by 128 (or full-width),
    and a RAGGED final block hangs on-device (observed on v5e) — so when
    chunking, the kernel writes a 128-aligned PADDED output (nc*chunk lanes)
    and the wrapper slices back to V*KC; the garbage M columns beyond V*KC
    (R rows past V select nothing, so they are zeros) land in the sliced-off
    lanes only."""
    if 3 * VKC * VKC * 4 <= budget:
        return VKC
    return max(128, (budget // (3 * VKC * 4)) // 128 * 128)


def bd_dyn_graph_agg(pre2, x1t, x2, A, alpha, beta, p1t=None, p2=None,
                     edge_sel=None, ebias=None, *, K, Cm, edge_k=-1,
                     edge_num=15, interpret=False, v_real=-1):
    """y2 = aggregate(pre2, G(x1, x2, A, alpha, beta[, edge attention])).

    pre2: (N, T, V*K*Cm) — row-major reshape of (N, T, V, K*Cm);
    x1t: (N, K, V, Cm) T-pooled queries (note: transposed vs dyn_graph.py);
    x2: (N, K, Cm, V); A: (K, V, V); alpha/beta: (K,) effective gates;
    p1t: (N, E, V, Cm), p2: (N, E, Cm, V) per-class projections of the
    edge subset's queries (host-computed: P = W_e^T q); edge_sel:
    (E, V, V) one-hot class mask; ebias: (V, Cm, V) transposed constant
    bias field.  Returns (N, T, V*K*Cm) with columns (w, kc) — the same
    layout as pre2, so the reshape back is free.
    """
    N, T, VKC = pre2.shape
    V = A.shape[-1]
    assert VKC == V * K * Cm, (VKC, V, K, Cm)
    f32 = jnp.float32
    x1t, x2, A = x1t.astype(f32), x2.astype(f32), A.astype(f32)
    gates = jnp.stack([alpha.astype(f32), beta.astype(f32)])    # (2, K)

    chunk = _col_chunk(VKC, pre2.dtype.itemsize)
    nc = -(-VKC // chunk)    # ceil: last chunk may be ragged (masked writes)
    # T tiled so the pre/out blocks fit alongside the M temporaries
    tile_budget = 4 * 2 ** 20
    tt = next(d for d in sorted((d for d in range(1, T + 1) if T % d == 0),
                                reverse=True)
              if 3 * d * VKC * pre2.dtype.itemsize <= tile_budget)
    nt = T // tt

    qspec = lambda shp: pl.BlockSpec(                           # noqa: E731
        (1,) + shp, lambda n, t, c: (n,) + (0,) * len(shp),
        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, tt, VKC), lambda n, t, c: (n, t, 0),
                     memory_space=pltpu.VMEM),
        qspec((K, V, Cm)), qspec((K, Cm, V)),
        pl.BlockSpec((K, V, V), lambda n, t, c: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, K), lambda n, t, c: (0, 0),
                     memory_space=pltpu.SMEM),
    ]
    args = [pre2, x1t, x2, A, gates]
    if edge_k >= 0:
        E = edge_num
        in_specs += [qspec((E, V, Cm)), qspec((E, Cm, V)),
                     pl.BlockSpec((E, V, V), lambda n, t, c: (0, 0, 0),
                                  memory_space=pltpu.VMEM),
                     pl.BlockSpec((V, Cm, V), lambda n, t, c: (0, 0, 0),
                                  memory_space=pltpu.VMEM)]
        args += [p1t.astype(f32), p2.astype(f32), edge_sel.astype(f32),
                 ebias.astype(f32)]

    kernel = functools.partial(_kernel, K=K, Cm=Cm, edge_k=edge_k,
                               edge_num=edge_num, chunk=chunk, v_real=v_real)
    out = pl.pallas_call(
        kernel,
        grid=(N, nt, nc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tt, chunk), lambda n, t, c: (n, t, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, nc * chunk), pre2.dtype),
        scratch_shapes=[pltpu.VMEM((VKC, V), jnp.float32)],   # cached G2d
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # headroom over the default 16 MB scoped limit: the M temporaries
            # ride the tuned _col_chunk budget, but XLA's own stack (copies,
            # double-buffered blocks) overflowed by ~40 KB at V*K*Cm=12800
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return out if nc * chunk == VKC else out[..., :VKC]


def bd_dyn_graph_agg_subset(pre2, x1t, x2, A, alpha, beta, *, K, Cm,
                            g=None, interpret=False, v_real=-1):
    """Per-subset / per-channel-group block-diagonal aggregation: same
    contract/layout as bd_dyn_graph_agg, but K (and optionally channel
    groups of size ``g`` within each subset) fold into the grid's batch dim
    so each step runs ONE (T, V*g) x (V*g, V*g) matmul with its subset's
    graph selected dynamically (A/gates indexed via program_id).

    FLOP inflation drops from (K*Cm)-fold to g-fold (g=Cm by default),
    which is what makes the wide DG-STGCN stages (K=8, V*K*Cm up to 12800
    at C=256 — where the full-BD M would be 12800^2 and 512x inflated)
    viable.  At the widest stage (Cm=64, T=25) the per-subset matmul
    ((25, 1600) x (1600, 1600)) is MXU-fill-bound at 25 rows, so smaller
    groups win: g=32 measures 60 vs 107 (g=64) vs 100 (fused) us/sample
    (benchmarks/bd_agg_probe.py sim, v5e).  The group-major relayouts of
    pre/y are two XLA transpose passes (bandwidth-bound) — no
    edge-attention support (only dgphgcn1 has it, and its K=3 stages take
    the full-BD path)."""
    N, T, VKC = pre2.shape
    V = A.shape[-1]
    assert VKC == V * K * Cm, (VKC, V, K, Cm)
    g = g or Cm
    assert Cm % g == 0 and g % 8 == 0, (Cm, g)
    G2 = Cm // g
    f32 = jnp.float32
    pre_ps = pre2.reshape(N, T, V, K, G2, g).transpose(0, 3, 4, 1, 2, 5)
    pre_ps = pre_ps.reshape(N * K * G2, T, V * g)
    x1ps = x1t.astype(f32).reshape(N, K, V, G2, g).transpose(0, 1, 3, 2, 4)
    x1ps = x1ps.reshape(N * K * G2, 1, V, g)
    x2ps = x2.astype(f32).reshape(N * K * G2, 1, g, V)
    gates = jnp.stack([alpha.astype(f32), beta.astype(f32)])    # (2, K)
    raw = jnp.einsum("nkvc,nkcw->nkvw", x1t.astype(f32), x2.astype(f32),
                     preferred_element_type=f32)
    if 0 < v_real < V:
        # joint-padded mode (see _kernel): padded sources out of the softmax
        src = jax.lax.broadcasted_iota(jnp.int32, raw.shape, 2)
        raw = jnp.where(src < v_real, raw, f32(-1e30))
    ada2 = jax.nn.softmax(raw, axis=-2).reshape(N * K, V, V)

    VC = V * g
    chunk = _col_chunk(VC, pre2.dtype.itemsize)
    nc = -(-VC // chunk)
    tile_budget = 4 * 2 ** 20
    tt = next(d for d in sorted((d for d in range(1, T + 1) if T % d == 0),
                                reverse=True)
              if 3 * d * VC * pre2.dtype.itemsize <= tile_budget)
    nt = T // tt

    in_specs = [
        pl.BlockSpec((1, tt, VC), lambda n, t, c: (n, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, V, g), lambda n, t, c: (n, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, g, V), lambda n, t, c: (n, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, V, V), lambda n, t, c: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, K), lambda n, t, c: (0, 0),
                     memory_space=pltpu.SMEM),
        pl.BlockSpec((1, V, V), lambda n, t, c: (n // G2, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    kernel = functools.partial(_kernel, K=1, Cm=g, edge_k=-1, edge_num=0,
                               chunk=chunk, n_subsets=K, subset_div=G2)
    out = pl.pallas_call(
        kernel,
        grid=(N * K * G2, nt, nc),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tt, chunk), lambda n, t, c: (n, t, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N * K * G2, T, nc * chunk),
                                       pre2.dtype),
        scratch_shapes=[pltpu.VMEM((VC, V), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
            # headroom over the default 16 MB scoped limit: the M temporaries
            # ride the tuned _col_chunk budget, but XLA's own stack (copies,
            # double-buffered blocks) overflowed by ~40 KB at V*K*Cm=12800
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(pre_ps, x1ps, x2ps, A.astype(f32), gates, ada2)
    y = out if nc * chunk == VC else out[..., :VC]
    y = y.reshape(N, K, G2, T, V, g).transpose(0, 3, 4, 1, 2, 5)
    return y.reshape(N, T, VKC)
