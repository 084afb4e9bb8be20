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


def _graph_k(k, x1, x2, A, gates_ref, ew, ebf, sel, *, Cm, edge_k, edge_num):
    """Rebuild subset k's graph chunk (G_k, ctr_k, ada_k), all in VMEM.

    x1/x2: (K, Cm, V); A: (K, V, V); gates_ref: (2, K) in SMEM.  Working
    per subset keeps every live tensor at (Cm, V, V) — the full (K*Cm, V, V)
    stack would pad its (25, 25) trailing dims to (32, 128) VMEM tiles and
    blow the scoped budget at the wide stages.

    ctr of subset ``edge_k`` uses the edge-class attention when ``ew`` given:
    ea[c',v,w] = sum_e sel[e,v,w]*(P1[e,c',v] - P2[e,c',w]) + bias_field.
    """
    raw = jax.lax.dot_general(
        x1[k], x2[k], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (V, W)
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
            edge_sel_ref=None, edge_k: int = -1, edge_num: int = 15):
    """Forward: per (batch, T-tile) fused graph build + aggregation.

    pre_ref: (1, Tt, V, K*Cm); x1/x2_ref: (1, K, Cm, V); A_ref: (K, V, V);
    gates_ref: (2, K) [alpha; beta] in SMEM; out_ref: (1, Tt, V, K*Cm).
    """
    T, V = pre_ref.shape[1], pre_ref.shape[2]
    pre = pre_ref[0]                                   # (Tt, V, K*Cm)
    x1, x2, A = x1_ref[0], x2_ref[0], A_ref[...]
    ew = edge_w_ref[...] if edge_w_ref is not None else None
    ebf = edge_b_ref[...] if edge_b_ref is not None else None
    sel = edge_sel_ref[...] if edge_sel_ref is not None else None

    # y[t,w,k,c] = sum_v pre[t,v,k,c] * G[k,c,v,w], subset by subset
    parts = []
    for k in range(K):
        G_k, _, _ = _graph_k(k, x1, x2, A, gates_ref, ew, ebf, sel,
                             Cm=Cm, edge_k=edge_k, edge_num=edge_num)
        pre_k = jnp.transpose(pre[:, :, k * Cm:(k + 1) * Cm],
                              (2, 0, 1))               # (Cm, Tt, V)
        y_k = jax.lax.dot_general(
            pre_k, G_k,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)        # (Cm, Tt, W)
        parts.append(jnp.transpose(y_k, (1, 2, 0)))    # (Tt, W, Cm)
    out_ref[0] = jnp.concatenate(parts, axis=-1).astype(out_ref.dtype)


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


def _edge_specs_args(edge_w, edge_b, edge_sel, edge_num, Cm, dtype, ndim=2):
    """Shared VMEM specs/args for the edge-attention constants."""
    if edge_b is None:
        edge_b = jnp.zeros((edge_num * Cm,), dtype)
    # bias field b[class(v,w), c] as a constant (Cm, V, V) array
    bias_field = jnp.einsum("evw,ec->cvw", edge_sel,
                            edge_b.reshape(edge_num, Cm))
    idx = (lambda n, t: (0, 0)) if ndim == 2 else None
    specs = [
        pl.BlockSpec(edge_w.shape, lambda n, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(bias_field.shape, lambda n, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(edge_sel.shape, lambda n, t: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return specs, [edge_w, bias_field, edge_sel]


def _fwd_pallas(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b, edge_sel, *,
                K, Cm, edge_k, edge_num, interpret=False):
    N, T, V, KC = pre_x.shape
    gates = jnp.stack([alpha, beta])                            # (2, K)
    # Tile T so wide stages (large K*Cm) stay inside scoped VMEM; the dynamic
    # graph is T-invariant, so tiles just rebuild it (cheap vs the contraction)
    tt = _t_tile(T, V, KC, pre_x.dtype.itemsize)
    nt = T // tt
    in_specs = [
        pl.BlockSpec((1, tt, V, KC), lambda n, t: (n, t, 0, 0),
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
    if edge_w is not None:
        def kernel(pre, x1r, x2r, Ar, gr, ewr, ebr, esr, out):
            _kernel(pre, x1r, x2r, Ar, gr, out, K=K, Cm=Cm,
                    edge_w_ref=ewr, edge_b_ref=ebr, edge_sel_ref=esr,
                    edge_k=edge_k, edge_num=edge_num)
        especs, eargs = _edge_specs_args(edge_w, edge_b, edge_sel, edge_num,
                                         Cm, pre_x.dtype)
        in_specs += especs
        args += eargs
    else:
        def kernel(pre, x1r, x2r, Ar, gr, out):
            _kernel(pre, x1r, x2r, Ar, gr, out, K=K, Cm=Cm)

    return pl.pallas_call(
        kernel,
        grid=(N, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tt, V, KC), lambda n, t: (n, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, V, KC), pre_x.dtype),
        interpret=interpret,
    )(*args)


def _bwd_kernel(pre_ref, dy_ref, x1_ref, x2_ref, A_ref, gates_ref,
                *rest, K: int, Cm: int, edge_k: int, edge_num: int, nt: int,
                has_edge: bool):
    """Backward: dG accumulated over T-tiles in VMEM scratch, then chained
    through the graph build on the last tile of each batch element.

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
         dgates_ref, dew_ref, deb_ref, dG_scr) = rest
    else:
        (dpre_ref, dx1_ref, dx2_ref, dA_ref, dgates_ref, dG_scr) = rest
        ew_ref = ebf_ref = sel_ref = dew_ref = deb_ref = None

    n_id = pl.program_id(0)
    t_id = pl.program_id(1)
    T, V = pre_ref.shape[1], pre_ref.shape[2]
    pre = pre_ref[0]
    dy = dy_ref[0]
    x1 = x1_ref[0]
    x2 = x2_ref[0]
    A = A_ref[...]
    ew = ew_ref[...] if ew_ref is not None else None
    ebf = ebf_ref[...] if ebf_ref is not None else None
    sel = sel_ref[...] if sel_ref is not None else None

    @pl.when(t_id == 0)
    def _init_scr():
        dG_scr[...] = jnp.zeros_like(dG_scr)

    @pl.when(jnp.logical_and(n_id == 0, t_id == 0))
    def _init_accs():
        dA_ref[...] = jnp.zeros_like(dA_ref)
        dgates_ref[...] = jnp.zeros_like(dgates_ref)
        if dew_ref is not None:
            dew_ref[...] = jnp.zeros_like(dew_ref)
            deb_ref[...] = jnp.zeros_like(deb_ref)

    # The chain to (dx1, dx2, dA, dgates) needs the complete dG; rather than
    # guard with pl.when (scalar VMEM stores don't lower), it is computed
    # every tile and masked to the last one — its cost is tiny next to the
    # tile matmuls and the accumulate-zero is free.
    last = (t_id == nt - 1).astype(jnp.float32)

    # Per subset: everything stays (Cm, ., .)-shaped (see _graph_k note)
    dpre_parts, dal, dbe = [], [], []
    for k in range(K):
        G_k, ctr_k, ada_k = _graph_k(k, x1, x2, A, gates_ref, ew, ebf, sel,
                                     Cm=Cm, edge_k=edge_k, edge_num=edge_num)
        cs = slice(k * Cm, (k + 1) * Cm)
        dy_k = jnp.transpose(dy[:, :, cs], (2, 0, 1))           # (Cm, Tt, W)
        pre_k = jnp.transpose(pre[:, :, cs], (2, 0, 1))         # (Cm, Tt, V)

        # dpre (this tile): sum_w dy[c,t,w] G_k[c,v,w] -> (Cm, Tt, V)
        dpre_k = jax.lax.dot_general(
            dy_k, G_k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dpre_parts.append(jnp.transpose(dpre_k, (1, 2, 0)))     # (Tt, V, Cm)

        # dG partial for this tile: sum_t pre[c,t,v] dy[c,t,w] -> (Cm, V, W)
        dG_part = jax.lax.dot_general(
            pre_k, dy_k, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dG_scr[cs] += dG_part

        alpha_k = gates_ref[0, k]
        beta_k = gates_ref[1, k]
        dGk = dG_scr[cs]                                        # (Cm, V, W)
        sC = jnp.sum(dGk, axis=0)                               # (V, W)
        dal.append(jnp.sum(dGk * ctr_k))
        dbe.append(jnp.sum(sC * ada_k))
        # ctr path
        dz = (dGk * alpha_k) * (1.0 - ctr_k * ctr_k)            # (Cm, V, W)
        if ew is not None and k == edge_k:
            # through ea = sum_e sel*(P1 - P2) + bias_field
            dP1 = jnp.einsum("evw,cvw->ecv", sel, dz)           # (E, Cm, V)
            dP2 = -jnp.einsum("evw,cvw->ecw", sel, dz)
            dP1f = dP1.reshape(edge_num * Cm, V)
            dP2f = dP2.reshape(edge_num * Cm, V)
            dx1_k = jax.lax.dot_general(
                ew, dP1f, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # (Cm, V)
            dx2_k = jax.lax.dot_general(
                ew, dP2f, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            # d ew[c, ec'] = sum_v x1[c,v] dP1[ec',v] + sum_w x2[c,w] dP2[ec',w]
            dew = jax.lax.dot_general(
                x1[k], dP1f, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) \
                + jax.lax.dot_general(
                x2[k], dP2f, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)             # (Cm, E*Cm)
            dew_ref[...] += (dew * last).astype(dew_ref.dtype)
            # d bias[e,c'] = sum_{v,w} sel[e,v,w] dz[c',v,w] = sum_v dP1
            deb_ref[...] += (jnp.sum(dP1, axis=-1).reshape(edge_num * Cm)
                             * last).astype(deb_ref.dtype)
        else:
            dx1_k = jnp.sum(dz, axis=-1)                        # (Cm, V)
            dx2_k = -jnp.sum(dz, axis=-2)                       # (Cm, W)
        # ada path: softmax over the source (v) axis
        ds = beta_k * sC                                        # (V, W)
        inner = jnp.sum(ds * ada_k, axis=0, keepdims=True)      # (1, W)
        draw = ada_k * (ds - inner)                             # (V, W)
        dx1_k = dx1_k + jax.lax.dot_general(
            x2[k], draw, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (Cm, V)
        dx2_k = dx2_k + jax.lax.dot_general(
            x1[k], draw, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)                 # (Cm, W)
        # final-tile write wins; earlier tiles hold partial-dG values the
        # last revision overwrites before the block moves to the next n
        dx1_ref[0, k] = dx1_k.astype(dx1_ref.dtype)
        dx2_ref[0, k] = dx2_k.astype(dx2_ref.dtype)
        dA_ref[k] += (sC * last).astype(dA_ref.dtype)

    dgates_ref[...] += (jnp.stack([jnp.stack(dal), jnp.stack(dbe)])
                        * last).astype(dgates_ref.dtype)
    dpre_ref[0] = jnp.concatenate(dpre_parts, axis=-1).astype(dpre_ref.dtype)


def _bwd_pallas(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b, edge_sel, dy,
                *, K, Cm, edge_k, edge_num, interpret=False):
    N, T, V, KC = pre_x.shape
    gates = jnp.stack([alpha, beta])
    tt = _t_tile(T, V, KC, pre_x.dtype.itemsize, budget=9 * 2 ** 20,
                 blocks=11)
    nt = T // tt
    has_edge = edge_w is not None
    tile4 = lambda: pl.BlockSpec((1, tt, V, KC),                  # noqa: E731
                                 lambda n, t: (n, t, 0, 0),
                                 memory_space=pltpu.VMEM)
    qk = lambda: pl.BlockSpec((1, K, Cm, V),                      # noqa: E731
                              lambda n, t: (n, 0, 0, 0),
                              memory_space=pltpu.VMEM)
    in_specs = [tile4(), tile4(), qk(), qk(),
                pl.BlockSpec((K, V, V), lambda n, t: (0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2, K), lambda n, t: (0, 0),
                             memory_space=pltpu.SMEM)]
    args = [pre_x, dy, x1, x2, A, gates]
    if has_edge:
        especs, eargs = _edge_specs_args(edge_w, edge_b, edge_sel, edge_num,
                                         Cm, pre_x.dtype)
        in_specs += especs
        args += eargs

    f32 = jnp.float32
    out_shapes = [jax.ShapeDtypeStruct((N, T, V, KC), pre_x.dtype),  # dpre
                  jax.ShapeDtypeStruct((N, K, Cm, V), f32),          # dx1
                  jax.ShapeDtypeStruct((N, K, Cm, V), f32),          # dx2
                  jax.ShapeDtypeStruct((K, V, V), f32),              # dA
                  jax.ShapeDtypeStruct((2, K), f32)]                 # dgates
    out_specs = [tile4(), qk(), qk(),
                 pl.BlockSpec((K, V, V), lambda n, t: (0, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((2, K), lambda n, t: (0, 0),
                              memory_space=pltpu.VMEM)]
    if has_edge:
        out_shapes += [jax.ShapeDtypeStruct(edge_w.shape, f32),      # dew
                       jax.ShapeDtypeStruct((edge_num * Cm,), f32)]  # deb
        out_specs += [pl.BlockSpec(edge_w.shape, lambda n, t: (0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((edge_num * Cm,), lambda n, t: (0,),
                                   memory_space=pltpu.VMEM)]

    kernel = functools.partial(_bwd_kernel, K=K, Cm=Cm, edge_k=edge_k,
                               edge_num=edge_num, nt=nt, has_edge=has_edge)
    outs = pl.pallas_call(
        kernel,
        grid=(N, nt),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=[pltpu.VMEM((KC, V, V), jnp.float32)],
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def fused_dyn_graph_agg(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b,
                        edge_sel, K, Cm, edge_k=-1, edge_num=15,
                        interpret=False):
    """y = aggregate(pre_x, G(x1, x2, A, alpha, beta[, edge attention])).

    pre_x: (N, T, V, K*Cm); x1/x2: (N, K, Cm, V); A: (K, V, V);
    alpha/beta: (K,) effective per-subset gates; edge_w: (Cm, edge_num*Cm)
    or None; edge_b: (edge_num*Cm,) conv bias or None; edge_sel:
    (edge_num, V, V) one-hot class mask or None.
    """
    return _fwd_pallas(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b,
                       edge_sel, K=K, Cm=Cm, edge_k=edge_k,
                       edge_num=edge_num, interpret=interpret)


def _vjp_fwd(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b, edge_sel,
             K, Cm, edge_k, edge_num, interpret):
    y = _fwd_pallas(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b, edge_sel,
                    K=K, Cm=Cm, edge_k=edge_k, edge_num=edge_num,
                    interpret=interpret)
    return y, (pre_x, x1, x2, A, alpha, beta, edge_w, edge_b, edge_sel)


def _vjp_bwd(K, Cm, edge_k, edge_num, interpret, res, dy):
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
