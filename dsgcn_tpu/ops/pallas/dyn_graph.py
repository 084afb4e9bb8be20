"""Fused dynamic-graph build + spatial aggregation Pallas kernels (fwd + bwd).

The hot region of every DG/DS-GCN block (reference gcn.py:2274-2361, SURVEY §8
E5/E7/E9/E10) is:

    ctr[k,c,v,w] = tanh(x1[k,c,v] - x2[k,c,w])            (diff graph, SDDMM-like)
    ada[k,v,w]   = softmax_v( sum_c x1[k,c,v]*x2[k,c,w] ) (outer-product graph)
    G[k,c,v,w]   = alpha[k]*ctr + beta[k]*ada[k,v,w] + A[k,v,w]
    y[t,w,k,c]   = sum_v pre[t,v,k,c] * G[k,c,v,w]        (per-channel SpMM)

XLA materializes the (N,K,Cm,V,V) graph tensor in HBM between these steps —
and pads its (25, 25) trailing dims to (32, 128) tiles, a 6.6x expansion that
OOMs HBM in training at saturated batch.  These kernels build G in VMEM per
(batch, T-tile) grid step and contract it immediately; the graph never touches
HBM in either direction:

* forward ``_kernel``: graph build + aggregation;
* backward ``_bwd_kernel``: dG accumulated over T-tiles in a VMEM scratch,
  then chained in-kernel through tanh/softmax/edge-projection to
  (dpre, dx1, dx2, dA, dalpha, dbeta[, dedge_w, dedge_b]).

Measured regime (v5e, N=2048 stage shapes): after hoisting the layout
rotations to once per tile the kernel is DMA-throughput-bound at ~270 GB/s —
the (V=25 -> 32)-sublane-padded strided block DMA, not per-step overhead
(multi-sample blocks under a raised vmem_limit_bytes leave total time flat:
38.6/38.9/37.9/41.6 ms for 1/2/4/8 samples per step).  Further wins come
from fewer bytes (bf16 blocks) or cross-op fusion, not bigger blocks.

Optionally applies the DS-GCN per-edge-class attention (reference
gcn.py:2277-2288) on one subset: the diff field is expanded to 15 edge
classes by a 1x1 conv and gathered with the static (V, V) class matrix,
reformulated as per-class projections of x1/x2 (linear in the diff) so Mosaic
never reshapes misaligned (V, V) trailing dims.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _edge_proj(ew, x, edge_num, Cm):
    """(E*Cm, V) per-class projection of x (Cm, V) by ew (Cm, E*Cm)."""
    p = jax.lax.dot_general(ew.T, x,
                            dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return p.reshape(edge_num, Cm, x.shape[-1])


def _graph_k(k, x1, x2, A, gates_ref, ew, ebf, sel, *, Cm, edge_k, edge_num,
             v_real=-1):
    """Rebuild subset k's graph chunk (G_k, ctr_k, ada_k), all in VMEM.

    x1/x2: (K, Cm, V); A: (K, V, V); gates_ref: (2, K) in SMEM.  Working
    per subset keeps every live tensor at (Cm, V, V) — the full (K*Cm, V, V)
    stack would pad its (25, 25) trailing dims to (32, 128) VMEM tiles and
    blow the scoped budget at the wide stages.

    ctr of subset ``edge_k`` uses the edge-class attention when ``ew`` given:
    ea[c',v,w] = sum_e sel[e,v,w]*(P1[e,c',v] - P2[e,c',w]) + bias_field.

    ``v_real``: joint-padded mode — the V axis is zero-padded past v_real
    real joints; the ada softmax masks padded SOURCE rows to -inf so the
    normalization matches the unpadded graph exactly (the ctr/A terms need
    no mask: padded rows of pre are zeroed by the caller and padded target
    columns are sliced off downstream).
    """
    raw = jax.lax.dot_general(
        x1[k], x2[k], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (V, W)
    if 0 < v_real < raw.shape[0]:
        src = jax.lax.broadcasted_iota(jnp.int32, raw.shape, 0)
        raw = jnp.where(src < v_real, raw, jnp.float32(-1e30))
    ada_k = jax.nn.softmax(raw, axis=-2)
    if ew is not None and k == edge_k:
        p1 = _edge_proj(ew, x1[k], edge_num, Cm)
        p2 = _edge_proj(ew, x2[k], edge_num, Cm)
        term = p1[:, :, :, None] - p2[:, :, None, :]        # (E,Cm,V,V)
        ea = jnp.sum(term * sel[:, None], axis=0)           # (Cm,V,V)
        if ebf is not None:
            ea = ea + ebf                                   # (Cm,V,V)
        ctr_k = jnp.tanh(ea)
    else:
        ctr_k = jnp.tanh(x1[k][:, :, None] - x2[k][:, None, :])
    # G_k = alpha_k*ctr_k + beta_k*ada_k + A_k, broadcast over Cm
    G_k = ctr_k * gates_ref[0, k] + (ada_k * gates_ref[1, k] + A[k])[None]
    return G_k, ctr_k, ada_k


def _kernel(pre_ref, x1_ref, x2_ref, A_ref, gates_ref, out_ref, *,
            K: int, Cm: int, edge_w_ref=None, edge_b_ref=None,
            edge_sel_ref=None, edge_k: int = -1, edge_num: int = 15,
            v_real: int = -1, w_pre_ref=None, b_pre_ref=None):
    """Forward: per (batch, T-tile) fused graph build + aggregation.

    pre_ref: (1, Tt, V, K*Cm); x1/x2_ref: (1, K, Cm, V); A_ref: (K, V, V);
    gates_ref: (2, K) [alpha; beta] in SMEM; out_ref: (1, Tt, V, K*Cm).

    With ``w_pre_ref`` (C, K*Cm) / ``b_pre_ref`` (1, K*Cm) (the eval path's
    BN-folded pre-conv), pre_ref instead carries the block INPUT
    (1, Tt, V, C) and pre = relu(x @ w_pre + b_pre) is computed in VMEM —
    the (N, T, V, K*Cm) pre tensor never round-trips HBM (a write + read of
    2C channels per stage, ~40% of the GCN region's traffic).  The
    (Tt*V, C) x (C, K*Cm) matmul is MXU-shaped; the (Tt, V, C) <->
    (Tt*V, C) merges are leading-dim and free."""
    T, V = pre_ref.shape[1], pre_ref.shape[2]
    if w_pre_ref is not None:
        xb = pre_ref[0]                                # (Tt, V, C)
        c_in = xb.shape[-1]
        p2d = jax.lax.dot_general(
            xb.reshape(T * V, c_in), w_pre_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (Tt*V, K*Cm)
        p2d = jnp.maximum(p2d + b_pre_ref[0][None, :], 0.0)
        pre = p2d.reshape(T, V, K * Cm).astype(out_ref.dtype)
    else:
        pre = pre_ref[0]                               # (Tt, V, K*Cm)
    x1, x2, A = x1_ref[0], x2_ref[0], A_ref[...]
    ew = edge_w_ref[...] if edge_w_ref is not None else None
    ebf = edge_b_ref[...] if edge_b_ref is not None else None
    sel = edge_sel_ref[...] if edge_sel_ref is not None else None

    # y[t,w,k,c] = sum_v pre[t,v,k,c] * G[k,c,v,w], subset by subset.
    # In bf16 mode the graph builds in f32 (x1/x2/A/gates are pre-cast on
    # the host: Mosaic can't insert minor dims on 16-bit vectors) and the
    # contraction runs with a bf16 graph at the full MXU bf16 rate,
    # accumulating f32 — the pre/out HBM tensors stay bf16.
    #
    # Layout rotations happen ONCE per tile, not per subset: eight 16-lane
    # slice transposes cost 2.4x the whole kernel vs one full-width rotation
    # each way (measured at stage0 on v5e: 92ms -> 39ms for N=2048, bit-
    # exact).  Per-subset slices of pre_t are then leading-dim (free).
    pre_t = jnp.transpose(pre, (2, 0, 1))              # (K*Cm, Tt, V)
    parts = []
    for k in range(K):
        G_k, _, _ = _graph_k(k, x1, x2, A, gates_ref, ew, ebf, sel,
                             Cm=Cm, edge_k=edge_k, edge_num=edge_num,
                             v_real=v_real)
        y_k = jax.lax.dot_general(
            pre_t[k * Cm:(k + 1) * Cm], G_k.astype(pre.dtype),
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (Cm, Tt, W)
        parts.append(y_k)
    y = jnp.concatenate(parts, axis=0)                 # (K*Cm, Tt, W)
    out_ref[0] = jnp.transpose(y, (1, 2, 0)).astype(out_ref.dtype)


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def _pad128(x: int) -> int:
    return -(-x // 128) * 128


def _t_tile(T: int, V: int, KC: int, itemsize: int = 4,
            budget: int = 12 * 2 ** 20, blocks: int = 9) -> int:
    """Largest divisor of T fitting the ~16 MB scoped-VMEM stack.  The bound
    is pessimistic (measured, not derived): besides the double-buffered
    in/out blocks, Mosaic materializes the two layout transposes around the
    batched matmul and the stacked graph tensor, so count ~``blocks``
    block-sized live copies plus 4 graph-sized temporaries."""
    for tt in sorted({d for d in range(1, T + 1) if T % d == 0}, reverse=True):
        if (blocks * tt * V * KC + 4 * KC * V * V) * itemsize <= budget:
            return tt
    return 1


def _bwd_plan(T: int, V: int, K: int, Cm: int, has_edge: bool,
              edge_num: int = 15, budget: int = 13 * 2 ** 20):
    """(kg, tt) for the backward grid: subsets are processed ``kg`` at a time
    so the (kg*Cm, V, V) dG scratch plus the per-subset graph temporaries fit
    the 16 MB scoped-VMEM stack *with Mosaic's tile padding counted* — the
    (25, 25) trailing plane pads to (32, 128), a 6.55x expansion that a naive
    element count misses (round-1 OOM at the K*Cm=512 stage was exactly
    this).  Larger kg = wider contiguous channel slices per block (less
    padding waste on the pre/dy/dpre HBM traffic), so take the largest
    (kg, tt) lexicographically that fits."""
    Vp, Wp = _pad8(V), _pad128(V)
    graph = Cm * Vp * Wp * 4                      # one f32 (Cm, V, V) temp
    per_subset = 6 * graph                        # live per-j temps (G, ctr,
    #                                               dz, dG_part, scratch reads)
    # edge path holds several (E, Cm, V) projections/grads plus the per-class
    # accumulation temps (measured on v5e: 4x under-counting OOMs by ~2 MB)
    edge = (12 * edge_num * _pad8(Cm) * Wp * 4 + 4 * graph) if has_edge else 0
    # tt-major: a large T-tile amortizes the per-tile graph rebuild (the
    # graphs are T-invariant), which costs more than extra subset groups
    for tt in sorted((d for d in range(1, T + 1) if T % d == 0),
                     reverse=True):
        for kg in sorted((d for d in range(1, K + 1) if K % d == 0),
                         reverse=True):
            # the (tt, V, kg*Cm) channel block must keep a lowerable
            # trailing dim: 128-aligned or the full K*Cm
            if kg != K and (kg * Cm) % 128 != 0:
                continue
            scratch = kg * graph                  # dG accumulator
            # ~14 tile-sized live copies measured on v5e: 2x double-buffered
            # pre/dy/dpre blocks, the whole-tile layout rotations, the
            # dpre_parts list + final concat
            tiles = 14 * tt * Vp * _pad128(kg * Cm) * 4
            if scratch + per_subset + edge + tiles <= budget:
                return kg, tt
    return K, 1


def _edge_specs_args(edge_w, edge_b, edge_sel, edge_num, Cm):
    """Shared VMEM specs/args for the edge-attention constants (f32: the
    in-kernel graph build runs f32 whatever the compute dtype)."""
    f32 = jnp.float32
    edge_w = edge_w.astype(f32)
    edge_sel = edge_sel.astype(f32)
    if edge_b is None:
        edge_b = jnp.zeros((edge_num * Cm,), f32)
    # bias field b[class(v,w), c] as a constant (Cm, V, V) array
    bias_field = jnp.einsum("evw,ec->cvw", edge_sel,
                            edge_b.astype(f32).reshape(edge_num, Cm))
    specs = [
        pl.BlockSpec(edge_w.shape, lambda *a: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(bias_field.shape, lambda *a: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(edge_sel.shape, lambda *a: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return specs, [edge_w, bias_field, edge_sel]


def _fwd_pallas(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b, edge_sel, *,
                K, Cm, edge_k, edge_num, interpret=False, v_real=-1,
                w_pre=None, b_pre=None):
    KC = K * Cm
    N, T, V, _ = pre_x.shape   # with w_pre, pre_x is the block INPUT x
    # graph-build operands in f32 regardless of compute dtype: they are tiny
    # next to pre_x, the graph math wants f32, and Mosaic cannot lower the
    # (V,) -> (V, 1) minor-dim broadcasts of the diff graph on 16-bit types
    f32 = jnp.float32
    x1, x2, A = x1.astype(f32), x2.astype(f32), A.astype(f32)
    gates = jnp.stack([alpha.astype(f32), beta.astype(f32)])    # (2, K)
    # Tile T so wide stages (large K*Cm) stay inside scoped VMEM; the dynamic
    # graph is T-invariant, so tiles just rebuild it (cheap vs the
    # contraction).  The in-kernel pre-conv adds the x block + the f32
    # matmul result to the live set — count ~3 extra block-sized copies.
    tt = _t_tile(T, V, KC, pre_x.dtype.itemsize,
                 blocks=12 if w_pre is not None else 9)
    nt = T // tt
    c_in = pre_x.shape[-1]
    in_specs = [
        pl.BlockSpec((1, tt, V, c_in), lambda n, t: (n, t, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, Cm, V), lambda n, t: (n, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, K, Cm, V), lambda n, t: (n, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((K, V, V), lambda n, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((2, K), lambda n, t: (0, 0), memory_space=pltpu.SMEM),
    ]
    args = [pre_x, x1, x2, A, gates]
    if w_pre is not None:
        assert edge_w is None, "in-kernel pre-conv + edge attention unsupported"
        b_pre2 = b_pre.reshape(1, KC)

        def kernel(pre, x1r, x2r, Ar, gr, wpr, bpr, out):
            _kernel(pre, x1r, x2r, Ar, gr, out, K=K, Cm=Cm, v_real=v_real,
                    w_pre_ref=wpr, b_pre_ref=bpr)
        in_specs += [
            pl.BlockSpec((c_in, KC), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, KC), lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [w_pre, b_pre2]
    elif edge_w is not None:
        def kernel(pre, x1r, x2r, Ar, gr, ewr, ebr, esr, out):
            _kernel(pre, x1r, x2r, Ar, gr, out, K=K, Cm=Cm,
                    edge_w_ref=ewr, edge_b_ref=ebr, edge_sel_ref=esr,
                    edge_k=edge_k, edge_num=edge_num, v_real=v_real)
        especs, eargs = _edge_specs_args(edge_w, edge_b, edge_sel, edge_num,
                                         Cm)
        in_specs += especs
        args += eargs
    else:
        def kernel(pre, x1r, x2r, Ar, gr, out):
            _kernel(pre, x1r, x2r, Ar, gr, out, K=K, Cm=Cm, v_real=v_real)

    return pl.pallas_call(
        kernel,
        grid=(N, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tt, V, KC), lambda n, t: (n, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, V, KC), pre_x.dtype),
        # bf16 serving at small N: XLA may stage the (sub-16MB-looking)
        # custom-call OUTPUT buffer itself in scoped vmem, overflowing the
        # default 16 MB limit together with the kernel's stack — raise the
        # per-call scoped budget (v5e has 128 MB VMEM) instead of losing
        # the placement
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


def _edge_ctr(x1j, x2j, ew, ebf, sel, edge_num, Cm):
    """Edge-class-attention ctr field for one subset: tanh of
    ea[c,v,w] = sum_e sel[e,v,w]*(P1[e,c,v] - P2[e,c,w]) + bias_field.

    The per-class sum runs as a static Python loop so the live set stays one
    (Cm, V, W) temporary — the vectorized (E, Cm, V, V) broadcast pads to
    ~16 MB at Cm=64 and blows the scoped-VMEM stack."""
    p1 = _edge_proj(ew, x1j, edge_num, Cm)              # (E, Cm, V)
    p2 = _edge_proj(ew, x2j, edge_num, Cm)
    ea = ebf
    for e in range(edge_num):
        ea = ea + sel[e][None] * (p1[e][:, :, None] - p2[e][:, None, :])
    return jnp.tanh(ea)


def _bwd_kernel(pre_ref, dy_ref, x1_ref, x2_ref, A_ref, gates_ref,
                *rest, K: int, kg: int, Cm: int, edge_k: int, edge_num: int,
                nt: int, has_edge: bool):
    """Backward: dG accumulated over T-tiles in VMEM scratch, then chained
    through the graph build on the last tile of each batch element.

    Grid is (K//kg, N, nt) — subset groups OUTERMOST so the dA / dgates /
    edge-weight accumulator blocks (whose index maps depend only on the group
    id or are constant) stay resident in VMEM across the whole (N, T) sweep
    they accumulate over.  Each group carries kg subsets (~128 lanes of
    channels), keeping every graph-shaped live tensor at (Cm, V, V) and the
    scratch at (kg*Cm, V, V) — see ``_bwd_plan``.

    Math (per batch element; G as in the forward):
      dpre[t,v,kc] = sum_w dy[t,w,kc] * G[kc,v,w]
      dG[kc,v,w]   = sum_t pre[t,v,kc] * dy[t,w,kc]
      ctr path:  dz = (dG*alpha_k) * (1 - ctr^2);  dx1 += sum_w dz,
                 dx2 -= sum_v dz  (edge subset: through the class projection)
      ada path:  ds = beta_k * sum_c dG;  softmax VJP over the source axis;
                 dx1 += x2 @ draw^T, dx2 += x1 @ draw
      dA = sum_c dG;  dalpha_k = <dG, ctr_k>;  dbeta_k = <sum_c dG, ada_k>.
    """
    if has_edge:
        (ew_ref, ebf_ref, sel_ref, dpre_ref, dx1_ref, dx2_ref, dA_ref,
         dgates_ref, dew_ref, deb_ref, dG_scr, ctr_scr, dq_scr) = rest
    else:
        (dpre_ref, dx1_ref, dx2_ref, dA_ref, dgates_ref, dG_scr) = rest
        ew_ref = ebf_ref = sel_ref = dew_ref = deb_ref = None
        ctr_scr = dq_scr = None

    g_id = pl.program_id(0)
    n_id = pl.program_id(1)
    t_id = pl.program_id(2)
    V = pre_ref.shape[2]
    # bf16 mode: grads accumulate in f32, so lift the tiles once on load;
    # layout rotations once per tile (see the forward kernel note): the
    # per-subset channel slices of the rotated tiles are leading-dim (free)
    pre_t = jnp.transpose(pre_ref[0], (2, 0, 1)).astype(jnp.float32)
    dy_t = jnp.transpose(dy_ref[0], (2, 0, 1))         # (kg*Cm, Tt, W)
    dy_t = dy_t.astype(jnp.float32)
    x1 = x1_ref[0]                                     # (kg, Cm, V) f32
    x2 = x2_ref[0]
    A = A_ref[...]                                     # (kg, V, V)
    ew = ew_ref[...] if ew_ref is not None else None
    ebf = ebf_ref[...] if ebf_ref is not None else None
    sel = sel_ref[...] if sel_ref is not None else None
    # group/offset of the edge-attention subset (static)
    g_edge, j_edge = (edge_k // kg, edge_k % kg) if edge_k >= 0 else (-1, -1)

    @pl.when(t_id == 0)
    def _init_scr():
        dG_scr[...] = jnp.zeros_like(dG_scr)

    @pl.when(jnp.logical_and(n_id == 0, t_id == 0))
    def _init_dA():
        # the dA block is per-group (index map depends only on g, which is
        # outermost), so it zeros once per group and then stays resident
        # across the whole (N, T) sweep it accumulates over.
        dA_ref[...] = jnp.zeros_like(dA_ref)

    @pl.when(jnp.logical_and(g_id == 0,
                             jnp.logical_and(n_id == 0, t_id == 0)))
    def _init_accs():
        # dgates (and edge) accumulators span all groups: K is too small to
        # block along (SMEM/VMEM blocks need 8/128-aligned trailing dims),
        # so they ride full-shape with a constant index map.
        dgates_ref[...] = jnp.zeros_like(dgates_ref)
        if dew_ref is not None:
            dew_ref[...] = jnp.zeros_like(dew_ref)
            deb_ref[...] = jnp.zeros_like(deb_ref)

    # The chain to (dx1, dx2, dA, dgates) needs the complete dG; rather than
    # guard with pl.when (scalar VMEM stores don't lower), it is computed
    # every tile and masked to the last one — its cost is tiny next to the
    # tile matmuls and the accumulate-zero is free.
    last = (t_id == nt - 1).astype(jnp.float32)

    dpre_parts = []
    for j in range(kg):
        kglob = g_id * kg + j                          # traced subset id
        alpha_j = gates_ref[0, kglob]                  # dynamic SMEM read
        beta_j = gates_ref[1, kglob]
        raw = jax.lax.dot_general(
            x1[j], x2[j], dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)        # (V, W)
        ada_j = jax.nn.softmax(raw, axis=-2)
        if has_edge and j == j_edge:
            @pl.when(g_id == g_edge)
            def _ctr_edge():
                ctr_scr[...] = _edge_ctr(x1[j], x2[j], ew, ebf, sel,
                                         edge_num, Cm)

            @pl.when(g_id != g_edge)
            def _ctr_plain():
                ctr_scr[...] = jnp.tanh(x1[j][:, :, None] - x2[j][:, None, :])
            ctr_j = ctr_scr[...]
        else:
            ctr_j = jnp.tanh(x1[j][:, :, None] - x2[j][:, None, :])
        G_j = ctr_j * alpha_j + (ada_j * beta_j + A[j])[None]

        cs = slice(j * Cm, (j + 1) * Cm)
        dy_j = dy_t[cs]                                         # (Cm, Tt, W)
        pre_j = pre_t[cs]                                       # (Cm, Tt, V)

        # dpre (this tile): sum_w dy[c,t,w] G_j[c,v,w] -> (Cm, Tt, V)
        dpre_j = jax.lax.dot_general(
            dy_j, G_j, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dpre_parts.append(dpre_j)

        # dG partial for this tile: sum_t pre[c,t,v] dy[c,t,w] -> (Cm, V, W)
        dG_part = jax.lax.dot_general(
            pre_j, dy_j, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dG_scr[cs] += dG_part

        dGj = dG_scr[cs]                                        # (Cm, V, W)
        sC = jnp.sum(dGj, axis=0)                               # (V, W)
        da_j = jnp.sum(dGj * ctr_j)
        db_j = jnp.sum(sC * ada_j)
        # scalar VMEM stores don't lower; accumulate through a one-hot column
        col = (jax.lax.broadcasted_iota(jnp.int32, (2, K), 1)
               == kglob).astype(jnp.float32)
        dgates_ref[...] += (col * jnp.stack([da_j, db_j])[:, None]
                            * last).astype(dgates_ref.dtype)
        # ctr path
        dz = (dGj * alpha_j) * (1.0 - ctr_j * ctr_j)            # (Cm, V, W)
        if has_edge and j == j_edge:
            @pl.when(g_id == g_edge)
            def _dq_edge():
                # through ea = sum_e sel*(P1 - P2) + bias_field; static
                # per-class loop keeps temps at (Cm, V, W)
                dp1_rows, dp2_rows = [], []
                for e in range(edge_num):
                    m = sel[e][None]                            # (1, V, W)
                    dp1_rows.append(jnp.sum(dz * m, axis=2))    # (Cm, V)
                    dp2_rows.append(-jnp.sum(dz * m, axis=1))   # (Cm, W)
                dP1f = jnp.concatenate(dp1_rows, axis=0)        # (E*Cm, V)
                dP2f = jnp.concatenate(dp2_rows, axis=0)
                dq_scr[0] = jax.lax.dot_general(
                    ew, dP1f, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)         # (Cm, V)
                dq_scr[1] = jax.lax.dot_general(
                    ew, dP2f, dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # d ew[c,ec'] = sum_v x1[c,v] dP1[ec',v] + sum_w x2[c,w] dP2[ec',w]
                dew = jax.lax.dot_general(
                    x1[j], dP1f, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32) \
                    + jax.lax.dot_general(
                    x2[j], dP2f, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)         # (Cm, E*Cm)
                dew_ref[...] += (dew * last).astype(dew_ref.dtype)
                # d bias[e,c'] = sum_{v,w} sel[e,v,w] dz[c',v,w] = sum_v dP1
                # (row-sum of the 2-D dP1f: Mosaic can't concatenate small
                # 1-D vectors across tile boundaries)
                deb = jnp.sum(dP1f, axis=-1)                    # (E*Cm,)
                deb_ref[...] += (deb * last).astype(deb_ref.dtype)

            @pl.when(g_id != g_edge)
            def _dq_plain():
                dq_scr[0] = jnp.sum(dz, axis=-1)
                dq_scr[1] = -jnp.sum(dz, axis=-2)
            dx1_j = dq_scr[0]
            dx2_j = dq_scr[1]
        else:
            dx1_j = jnp.sum(dz, axis=-1)                        # (Cm, V)
            dx2_j = -jnp.sum(dz, axis=-2)                       # (Cm, W)
        # ada path: softmax over the source (v) axis
        ds = beta_j * sC                                        # (V, W)
        inner = jnp.sum(ds * ada_j, axis=0, keepdims=True)      # (1, W)
        draw = ada_j * (ds - inner)                             # (V, W)
        dx1_j = dx1_j + jax.lax.dot_general(
            x2[j], draw, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (Cm, V)
        dx2_j = dx2_j + jax.lax.dot_general(
            x1[j], draw, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (Cm, W)
        # final-tile write wins; earlier tiles hold partial-dG values the
        # last revision overwrites before the block moves to the next n
        dx1_ref[0, j] = dx1_j.astype(dx1_ref.dtype)
        dx2_ref[0, j] = dx2_j.astype(dx2_ref.dtype)
        dA_ref[j] += (sC * last).astype(dA_ref.dtype)

    dpre = jnp.concatenate(dpre_parts, axis=0)         # (kg*Cm, Tt, V)
    dpre_ref[0] = jnp.transpose(dpre, (1, 2, 0)).astype(dpre_ref.dtype)


def _bwd_pallas(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b, edge_sel, dy,
                *, K, Cm, edge_k, edge_num, interpret=False):
    N, T, V, KC = pre_x.shape
    # graph-build operands in f32 (see _fwd_pallas)
    f32 = jnp.float32
    x1, x2, A = x1.astype(f32), x2.astype(f32), A.astype(f32)
    gates = jnp.stack([alpha.astype(f32), beta.astype(f32)])
    has_edge = edge_w is not None
    kg, tt = _bwd_plan(T, V, K, Cm, has_edge, edge_num)
    nt = T // tt
    ng = K // kg
    tile4 = lambda: pl.BlockSpec((1, tt, V, kg * Cm),             # noqa: E731
                                 lambda g, n, t: (n, t, 0, g),
                                 memory_space=pltpu.VMEM)
    qk = lambda: pl.BlockSpec((1, kg, Cm, V),                     # noqa: E731
                              lambda g, n, t: (n, g, 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [tile4(), tile4(), qk(), qk(),
                pl.BlockSpec((kg, V, V), lambda g, n, t: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, K), lambda g, n, t: (0, 0),
                             memory_space=pltpu.SMEM)]
    args = [pre_x, dy, x1, x2, A, gates]
    if has_edge:
        especs, eargs = _edge_specs_args(edge_w, edge_b, edge_sel, edge_num,
                                         Cm)
        in_specs += especs
        args += eargs

    f32 = jnp.float32
    out_shapes = [jax.ShapeDtypeStruct((N, T, V, KC), pre_x.dtype),  # dpre
                  jax.ShapeDtypeStruct((N, K, Cm, V), f32),          # dx1
                  jax.ShapeDtypeStruct((N, K, Cm, V), f32),          # dx2
                  jax.ShapeDtypeStruct((K, V, V), f32),              # dA
                  jax.ShapeDtypeStruct((2, K), f32)]                 # dgates
    out_specs = [tile4(), qk(), qk(),
                 pl.BlockSpec((kg, V, V), lambda g, n, t: (g, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((2, K), lambda g, n, t: (0, 0),
                              memory_space=pltpu.VMEM)]
    if has_edge:
        out_shapes += [jax.ShapeDtypeStruct(edge_w.shape, f32),      # dew
                       jax.ShapeDtypeStruct((edge_num * Cm,), f32)]  # deb
        out_specs += [pl.BlockSpec(edge_w.shape, lambda g, n, t: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((edge_num * Cm,), lambda g, n, t: (0,),
                                   memory_space=pltpu.VMEM)]

    scratch = [pltpu.VMEM((kg * Cm, V, V), jnp.float32)]             # dG
    if has_edge:
        scratch += [pltpu.VMEM((Cm, V, V), jnp.float32),             # ctr
                    pltpu.VMEM((2, Cm, V), jnp.float32)]             # dq
    kernel = functools.partial(_bwd_kernel, K=K, kg=kg, Cm=Cm, edge_k=edge_k,
                               edge_num=edge_num, nt=nt, has_edge=has_edge)
    outs = pl.pallas_call(
        kernel,
        grid=(ng, N, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        # bf16 training: the in-kernel f32 lifts of the bf16 pre/dy tiles
        # overflow the default 16 MB scoped budget by ~1.5 MB at the widest
        # K=8 stage — raise the per-call limit (v5e has 128 MB VMEM), same
        # remedy as the forward kernel
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    return outs


def _fwd_reference(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b, edge_sel, *,
                   K, Cm, edge_k, edge_num):
    """Plain-XLA fallback with identical semantics (the non-Pallas path and
    the grad-of-grad fallback)."""
    N, T, V, KC = pre_x.shape
    ctr = jnp.tanh(x1[..., :, None] - x2[..., None, :])         # (N,K,Cm,V,V)
    if edge_w is not None:
        d = x1[:, edge_k][..., :, None] - x2[:, edge_k][..., None, :]
        es = jnp.einsum("ncvw,ce->nevw", d, edge_w).reshape(
            N, edge_num, Cm, V, V)
        ea = jnp.sum(es * edge_sel[None, :, None], axis=1)      # (N,Cm,V,V)
        if edge_b is not None:
            eb = edge_b.reshape(edge_num, Cm)
            ea = ea + jnp.einsum("evw,ec->cvw", edge_sel, eb)[None]
        ctr = ctr.at[:, edge_k].set(jnp.tanh(ea))
    raw = jnp.einsum("nkcv,nkcw->nkvw", x1, x2)
    ada = jax.nn.softmax(raw, axis=-2)
    G = (ctr * alpha[None, :, None, None, None]
         + (ada * beta[None, :, None, None])[:, :, None]
         + A[None, :, None])
    pre_k = pre_x.reshape(N, T, V, K, Cm)
    y = jnp.einsum("ntvkc,nkcvw->ntwkc", pre_k, G)
    return y.reshape(N, T, V, K * Cm)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13, 14))
def fused_dyn_graph_agg(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b,
                        edge_sel, K, Cm, edge_k=-1, edge_num=15,
                        interpret=False, v_real=-1):
    """y = aggregate(pre_x, G(x1, x2, A, alpha, beta[, edge attention])).

    pre_x: (N, T, V, K*Cm); x1/x2: (N, K, Cm, V); A: (K, V, V);
    alpha/beta: (K,) effective per-subset gates; edge_w: (Cm, edge_num*Cm)
    or None; edge_b: (edge_num*Cm,) conv bias or None; edge_sel:
    (edge_num, V, V) one-hot class mask or None; v_real: joint-padded eval
    mode (V zero-padded past v_real real joints — see _graph_k).
    """
    return _fwd_pallas(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b,
                       edge_sel, K=K, Cm=Cm, edge_k=edge_k,
                       edge_num=edge_num, interpret=interpret, v_real=v_real)


def _vjp_fwd(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b, edge_sel,
             K, Cm, edge_k, edge_num, interpret, v_real):
    y = _fwd_pallas(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b, edge_sel,
                    K=K, Cm=Cm, edge_k=edge_k, edge_num=edge_num,
                    interpret=interpret, v_real=v_real)
    return y, (pre_x, x1, x2, A, alpha, beta, edge_w, edge_b, edge_sel)


def _vjp_bwd(K, Cm, edge_k, edge_num, interpret, v_real, res, dy):
    assert v_real <= 0, "joint-padded mode (v_real) is eval-only"
    pre_x, x1, x2, A, alpha, beta, edge_w, edge_b, edge_sel = res
    outs = _bwd_pallas(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b,
                       edge_sel, dy, K=K, Cm=Cm, edge_k=edge_k,
                       edge_num=edge_num, interpret=interpret)
    if edge_w is None:
        dpre, dx1, dx2, dA, dgates = outs
        dew = deb = dsel = None
    else:
        dpre, dx1, dx2, dA, dgates, dew, deb = outs
        dew = dew.astype(edge_w.dtype)
        deb = deb.astype(edge_b.dtype) if edge_b is not None else None
        dsel = jnp.zeros_like(edge_sel)
    return (dpre, dx1.astype(x1.dtype), dx2.astype(x2.dtype),
            dA.astype(A.dtype), dgates[0].astype(alpha.dtype),
            dgates[1].astype(beta.dtype), dew, deb, dsel)


fused_dyn_graph_agg.defvjp(_vjp_fwd, _vjp_bwd)


def fused_dyn_graph_agg_eval(x, w_pre, b_pre, x1, x2, A, alpha, beta, *,
                             K, Cm, v_real=-1, interpret=False):
    """Eval-only fused variant with the IN-KERNEL pre-conv: takes the block
    input x (N, T, V, C) plus the BN-folded pre weights (C, K*Cm)/(K*Cm,)
    and returns the aggregated (N, T, V, K*Cm) — the pre tensor never
    round-trips HBM.  No VJP (training uses fused_dyn_graph_agg)."""
    return _fwd_pallas(x, x1, x2, A, alpha, beta, None, None, None,
                       K=K, Cm=Cm, edge_k=-1, edge_num=15,
                       interpret=interpret, v_real=v_real,
                       w_pre=w_pre, b_pre=b_pre)


def reference_dyn_graph_agg(pre_x, x1, x2, A, alpha, beta, edge_w=None,
                            edge_b=None, edge_sel=None, K=3, Cm=8, edge_k=-1,
                            edge_num=15):
    return _fwd_reference(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b,
                          edge_sel, K=K, Cm=Cm, edge_k=edge_k,
                          edge_num=edge_num)


def edge_onehot(edge_type: np.ndarray, edge_num: int = 15) -> np.ndarray:
    """(V, V) int class matrix -> (edge_num, V, V) one-hot mask."""
    V = edge_type.shape[0]
    out = np.zeros((edge_num, V, V), np.float32)
    for e in range(edge_num):
        out[e] = (edge_type == e)
    return out
