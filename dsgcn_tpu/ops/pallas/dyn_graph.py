"""Fused dynamic-graph build + spatial aggregation Pallas kernel.

The hot region of every DG/DS-GCN block (reference gcn.py:2274-2361, SURVEY §8
E5/E7/E9/E10) is:

    ctr[k,c,v,w] = tanh(x1[k,c,v] - x2[k,c,w])            (diff graph, SDDMM-like)
    ada[k,v,w]   = softmax_v( sum_c x1[k,c,v]*x2[k,c,w] ) (outer-product graph)
    G[k,c,v,w]   = alpha[k]*ctr + beta[k]*ada[k,v,w] + A[k,v,w]
    y[t,w,k,c]   = sum_v pre[t,v,k,c] * G[k,c,v,w]        (per-channel SpMM)

XLA materializes the (N,K,Cm,V,V) graph tensor in HBM between these steps
(~8 MB per block at batch 32, 10 blocks per model, fwd+bwd).  This kernel
builds G in VMEM per (batch) grid step and contracts it immediately — the
graph never touches HBM.  Optionally applies the DS-GCN per-edge-class
attention (reference gcn.py:2277-2288): the middle (semantic) subset's diff
field is expanded to 15 edge classes by a 1x1 conv and gathered with the
static (V, V) class matrix, all in-kernel.

Forward only as a Pallas kernel; the custom VJP recomputes the (cheap) graphs
in plain XLA for the backward pass, so training works transparently.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(pre_ref, x1_ref, x2_ref, A_ref, gates_ref, out_ref, *,
            K: int, Cm: int, edge_w_ref=None, edge_b_ref=None,
            edge_sel_ref=None, edge_k: int = -1, edge_num: int = 15):
    """Per-batch-element fused graph build + aggregation.

    pre_ref: (1, T, V, K*Cm); x1/x2_ref: (1, K, Cm, V); A_ref: (K, V, V);
    gates_ref: (2, K) [alpha; beta] in VMEM; out_ref: (1, T, V, K*Cm).
    Optional edge attention on subset ``edge_k``: edge_w_ref (Cm, edge_num*Cm)
    1x1-conv weight, edge_sel_ref (edge_num, V, V) one-hot class mask.
    """
    T = pre_ref.shape[1]
    V = pre_ref.shape[2]
    pre = pre_ref[0]                                   # (T, V, K*Cm)
    x1 = x1_ref[0]                                     # (K, Cm, V)
    x2 = x2_ref[0]
    A = A_ref[...]                                     # (K, V, V)

    raw = jnp.einsum("kcv,kcw->kvw", x1, x2,
                     preferred_element_type=jnp.float32)
    ada = jax.nn.softmax(raw, axis=-2)                 # (K, V, V)

    # ---- build gated graph per subset in VMEM (static unroll over K; no
    # scatter / trailing-dim reshape on TPU, scalar gates from SMEM) ---------
    parts = []
    for k in range(K):
        alpha_k = gates_ref[0, k]
        beta_k = gates_ref[1, k]
        if edge_w_ref is not None and k == edge_k:
            # DS-GCN edge-class attention on subset edge_k (gcn.py:2277-2288):
            # expand the diff field to edge_num classes via the 1x1 conv, keep
            # class(edge_type[v,w]) at each edge; ctr_act (tanh) applies to
            # this subset too (gcn.py:2294-2298).  Reformulated so Mosaic never
            # reshapes the misaligned (V, V) trailing dims: the conv is linear
            # in diff = x1[:,v] - x2[:,w], so project x1/x2 per class FIRST
            # (one MXU matmul each) and combine under the class mask:
            #   ea[c',v,w] = sum_e sel[e,v,w]*(P1[e,c',v] - P2[e,c',w] + b[e,c'])
            ew = edge_w_ref[...]                                # (Cm, E*Cm)
            p1 = jax.lax.dot_general(
                ew.T, x1[k], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)             # (E*Cm, V)
            p2 = jax.lax.dot_general(
                ew.T, x2[k], dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            p1 = p1.reshape(edge_num, Cm, V)
            p2 = p2.reshape(edge_num, Cm, V)
            sel = edge_sel_ref[...]                             # (E, V, V)
            term = p1[:, :, :, None] - p2[:, :, None, :]        # (E, Cm, V, V)
            ea = jnp.sum(term * sel[:, None], axis=0)           # (Cm, V, V)
            if edge_b_ref is not None:
                # input-independent bias field precomputed outside the kernel
                ea = ea + edge_b_ref[...]                       # (Cm, V, V)
            ctr_k = jnp.tanh(ea)
        else:
            ctr_k = jnp.tanh(x1[k][:, :, None] - x2[k][:, None, :])
        # G_k = alpha_k*ctr_k + beta_k*ada_k + A_k, broadcast over Cm
        parts.append(ctr_k * alpha_k + (ada[k] * beta_k + A[k])[None])
    G = jnp.stack(parts)                                        # (K, Cm, V, V)

    # ---- aggregate: y[t,w,k,c] = sum_v pre[t,v,k,c] * G[k,c,v,w] ---------
    # Mosaic allows at most 1 batch dim on tpu.matmul: flatten (K, Cm).
    pre_k = pre.reshape(T, V, K * Cm)
    pre_b = jnp.transpose(pre_k, (2, 0, 1))                     # (K*Cm, T, V)
    G2 = G.reshape(K * Cm, V, V)
    y = jax.lax.dot_general(
        pre_b, G2,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                     # (K*Cm, T, W)
    y = jnp.transpose(y, (1, 2, 0))                             # (T, W, K*Cm)
    out_ref[0] = y.astype(out_ref.dtype)


def _t_tile(T: int, V: int, KC: int, itemsize: int = 4,
            budget: int = 12 * 2 ** 20) -> int:
    """Largest divisor of T fitting the ~16 MB scoped-VMEM stack.  The bound
    is pessimistic (measured, not derived): besides the double-buffered
    in/out blocks, Mosaic materializes the two layout transposes around the
    batched matmul and the stacked graph tensor, so count ~9 block-sized
    live copies plus 4 graph-sized temporaries."""
    for tt in sorted({d for d in range(1, T + 1) if T % d == 0}, reverse=True):
        if (9 * tt * V * KC + 4 * KC * V * V) * itemsize <= budget:
            return tt
    return 1


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
        def kernel_edge(pre, x1r, x2r, Ar, gr, ewr, ebr, esr, out):
            _kernel(pre, x1r, x2r, Ar, gr, out, K=K, Cm=Cm,
                    edge_w_ref=ewr, edge_b_ref=ebr, edge_sel_ref=esr,
                    edge_k=edge_k, edge_num=edge_num)
        kernel = kernel_edge
        if edge_b is None:
            edge_b = jnp.zeros((edge_num * Cm,), pre_x.dtype)
        # bias field b[class(v,w), c] as a constant (Cm, V, V) array
        bias_field = jnp.einsum("evw,ec->cvw", edge_sel,
                                edge_b.reshape(edge_num, Cm))
        in_specs += [
            pl.BlockSpec(edge_w.shape, lambda n, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bias_field.shape, lambda n, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(edge_sel.shape, lambda n, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        args += [edge_w, bias_field, edge_sel]
    else:
        def kernel_plain(pre, x1r, x2r, Ar, gr, out):
            _kernel(pre, x1r, x2r, Ar, gr, out, K=K, Cm=Cm)
        kernel = kernel_plain

    return pl.pallas_call(
        kernel,
        grid=(N, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tt, V, KC), lambda n, t: (n, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, V, KC), pre_x.dtype),
        interpret=interpret,
    )(*args)


def _fwd_reference(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b, edge_sel, *,
                   K, Cm, edge_k, edge_num):
    """Plain-XLA fallback with identical semantics (used for VJP backward
    residual recompute and as the non-Pallas path)."""
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

    if edge_w is None:
        def f2(pre_x, x1, x2, A, alpha, beta):
            return _fwd_reference(pre_x, x1, x2, A, alpha, beta, None, None,
                                  None, K=K, Cm=Cm, edge_k=edge_k,
                                  edge_num=edge_num)
        grads = jax.vjp(f2, pre_x, x1, x2, A, alpha, beta)[1](dy)
        return grads + (None, None, None)

    def f(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b):
        return _fwd_reference(pre_x, x1, x2, A, alpha, beta, edge_w, edge_b,
                              edge_sel, K=K, Cm=Cm, edge_k=edge_k,
                              edge_num=edge_num)

    grads = jax.vjp(f, pre_x, x1, x2, A, alpha, beta, edge_w, edge_b)[1](dy)
    return grads + (jnp.zeros_like(edge_sel),)


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
