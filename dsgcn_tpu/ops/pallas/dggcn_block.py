"""Mega-fused eval-mode DG/DS-GCN block: the whole spatial-GCN region of a
stage in one Pallas kernel.

Covers reference dggcn (gcn.py:1445-1584) and dgphgcn1 (gcn.py:2074-2365,
target_specific=False values path) at inference in their standard form
(ctr='T', ada='T', tanh/softmax):

    res  = x                    (or BN(down_conv(x)) when channels change)
    pre  = ReLU(BN(pre_conv(x)))                    # (T, V, K*Cm)
    G    = alpha*tanh(x1-x2) + beta*softmax(x1@x2) + A
           (one subset optionally uses the DS-GCN edge-class attention)
    y    = aggregate(pre, G)                        # per-channel V->V
    out  = ReLU(BN(post_conv(y)) + res)

The T-pooled queries x1/x2 (N, K, Cm, V) are built in XLA — they are tiny,
dgphgcn1's involve semantic type gathers, and keeping them external lets the
kernel tile T (the graphs are T-invariant) so every stage shape fits scoped
VMEM.  The unfused pipeline is HBM-bound glue: pre/y round-trip HBM around
the dynamic-graph custom call, and XLA inserts layout copies at the
custom-call boundary.  Here x is read once and the block output written
once; every BatchNorm folds into an affine from running stats (eval only —
training keeps the three-piece path whose backward is the custom-VJP kernel
in dyn_graph.py).

Layout discipline follows dyn_graph.py: one whole-tile rotation each way
around the per-subset contractions, graph math in f32, no lane-dim slicing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dyn_graph import _edge_ctr, _edge_specs_args, _pad8, _pad128


def _block_kernel(x_ref, x1_ref, x2_ref, wpre_ref, bpre_ref, A_ref,
                  gates_ref, *rest, K, Cm, has_down, edge_k, edge_num):
    i = 0
    if edge_k >= 0:
        ew_ref, ebf_ref, sel_ref = rest[i:i + 3]
        i += 3
    else:
        ew_ref = ebf_ref = sel_ref = None
    wpost_ref, bpost_ref = rest[i:i + 2]
    i += 2
    if has_down:
        wdown_ref, bdown_ref = rest[i:i + 2]
        i += 2
    else:
        wdown_ref = bdown_ref = None
    out_ref = rest[i]

    f32 = jnp.float32
    Tt, V, C = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    # flatten (Tt, V) rows so every 1x1-conv matmul lowers as ONE wide MXU
    # matmul instead of Tt tiny (V, C) ones (measured 12% on stage shapes;
    # the leading-dim merge is layout-free)
    xf = x_ref[0].astype(f32).reshape(Tt * V, C)

    # pre = ReLU(BN(pre_conv(x))), BN folded host-side
    pre = jax.lax.dot_general(xf, wpre_ref[...],
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=f32)
    pre = jnp.maximum(pre + bpre_ref[...], 0.0) \
        .reshape(Tt, V, -1)                             # (Tt, V, K*Cm)

    x1 = x1_ref[0].astype(f32)                          # (K, Cm, V)
    x2 = x2_ref[0].astype(f32)
    A = A_ref[...]
    ew = ew_ref[...] if ew_ref is not None else None
    ebf = ebf_ref[...] if ebf_ref is not None else None
    sel = sel_ref[...] if sel_ref is not None else None

    pre_t = jnp.transpose(pre, (2, 0, 1))               # (K*Cm, Tt, V)
    parts = []
    for k in range(K):
        q1, q2 = x1[k], x2[k]                           # (Cm, V)
        raw = jax.lax.dot_general(q1, q2,
                                  dimension_numbers=(((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        ada = jax.nn.softmax(raw, axis=-2)              # (V, W)
        if ew is not None and k == edge_k:
            ctr = _edge_ctr(q1, q2, ew, ebf, sel, edge_num, Cm)
        else:
            ctr = jnp.tanh(q1[:, :, None] - q2[:, None, :])
        G_k = ctr * gates_ref[0, k] + (ada * gates_ref[1, k] + A[k])[None]
        parts.append(jax.lax.dot_general(
            pre_t[k * Cm:(k + 1) * Cm], G_k,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32))                # (Cm, Tt, W)
    y = jnp.transpose(jnp.concatenate(parts, axis=0), (1, 2, 0))
    yf = y.reshape(Tt * V, -1)

    out = jax.lax.dot_general(yf, wpost_ref[...],
                              dimension_numbers=(((1,), (0,)), ((), ())),
                              preferred_element_type=f32) + bpost_ref[...]
    if has_down:
        res = jax.lax.dot_general(xf, wdown_ref[...],
                                  dimension_numbers=(((1,), (0,)), ((), ())),
                                  preferred_element_type=f32) + bdown_ref[...]
    else:
        res = xf
    out_ref[0] = jnp.maximum(out + res, 0.0) \
        .reshape(Tt, V, -1).astype(out_ref.dtype)


def block_plan(T, V, C, KCm, Cout, Cm, has_edge=False, edge_num=15,
               budget=13 * 2 ** 20):
    """Largest T-tile whose live set fits scoped VMEM, padding-aware:
    tile-shaped copies (x + double-buffered in, pre + rotation, y parts +
    concat + rotation, out + res + double-buffered out) plus the per-subset
    graph temporaries.  The graphs are T-invariant, so tiles just rebuild
    them (cheap next to the contractions at tt >= ~5)."""
    Vp, Wp = _pad8(V), _pad128(V)
    graph = 6 * Cm * Vp * Wp * 4
    edge = (12 * edge_num * _pad8(Cm) * Wp * 4 + 2 * Cm * Vp * Wp * 4) \
        if has_edge else 0
    per_t = Vp * (3 * _pad128(C) + 4 * _pad128(KCm) + 3 * _pad128(Cout)) * 4
    for tt in sorted((d for d in range(1, T + 1) if T % d == 0),
                     reverse=True):
        if tt * per_t + graph + edge <= budget:
            return tt
    return 1


def _const_specs(consts):
    specs, args = [], []
    for cst in consts:
        cst = jnp.asarray(cst, jnp.float32)
        specs.append(pl.BlockSpec(cst.shape,
                                  lambda *a, nd=cst.ndim: (0,) * nd,
                                  memory_space=pltpu.VMEM))
        args.append(cst)
    return specs, args


def fused_dggcn_block_eval(x, x1, x2, w_pre, b_pre, A, alpha, beta,
                           w_post, b_post, w_down=None, b_down=None, *,
                           K, Cm, edge_w=None, edge_b=None, edge_sel=None,
                           edge_k=-1, edge_num=15, interpret=False):
    """x: (N, T, V, C) -> (N, T, V, C_out); x1/x2: (N, K, Cm, V) T-pooled
    queries (XLA-built).  All BNs pre-folded into the conv weights/biases;
    alpha/beta are the effective per-subset gate vectors (K,); optional
    edge-class attention on subset ``edge_k``."""
    N, T, V, C = x.shape
    Cout = w_post.shape[-1]
    f32 = jnp.float32
    gates = jnp.stack([jnp.asarray(alpha, f32), jnp.asarray(beta, f32)])
    has_down = w_down is not None
    has_edge = edge_w is not None
    tt = block_plan(T, V, C, K * Cm, Cout, Cm, has_edge, edge_num)
    nt = T // tt
    kernel = functools.partial(_block_kernel, K=K, Cm=Cm, has_down=has_down,
                               edge_k=edge_k if has_edge else -1,
                               edge_num=edge_num)
    qk_spec = pl.BlockSpec((1, K, Cm, V), lambda n, t: (n, 0, 0, 0),
                           memory_space=pltpu.VMEM)
    in_specs = [pl.BlockSpec((1, tt, V, C), lambda n, t: (n, t, 0, 0),
                             memory_space=pltpu.VMEM), qk_spec, qk_spec]
    args = [x, x1.astype(f32), x2.astype(f32)]
    s, a = _const_specs([w_pre, b_pre, A])
    in_specs += s
    args += a
    in_specs.append(pl.BlockSpec((2, K), lambda n, t: (0, 0),
                                 memory_space=pltpu.SMEM))
    args.append(gates)
    if has_edge:
        especs, eargs = _edge_specs_args(edge_w, edge_b, edge_sel, edge_num,
                                         Cm)
        in_specs += especs
        args += eargs
    s, a = _const_specs([w_post, b_post]
                        + ([w_down, b_down] if has_down else []))
    in_specs += s
    args += a
    return pl.pallas_call(
        kernel,
        grid=(N, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tt, V, Cout), lambda n, t: (n, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, V, Cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*args)
