"""Mega-fused eval-mode DGGCN block: the whole spatial-GCN region of a
DG-STGCN stage in one Pallas kernel.

Covers reference dggcn (gcn.py:1445-1584) at inference in its standard form
(ctr='T', ada='T', tanh/softmax):

    res  = x                    (or BN(down_conv(x)) when channels change)
    pre  = ReLU(BN(pre_conv(x)))                    # (T, V, K*Cm)
    tmp  = mean_T(x); x1 = conv1(tmp); x2 = conv2(tmp)
    G    = alpha*tanh(x1-x2) + beta*softmax(x1@x2) + A
    y    = aggregate(pre, G)                        # per-channel V->V
    out  = ReLU(BN(post_conv(y)) + res)

The unfused pipeline is HBM-bound glue: pre/y round-trip HBM around the
dynamic-graph custom call, and XLA inserts layout copies at the custom-call
boundary (visible as `copy.*` allocations in memory dumps).  Here x is read
once and the block output written once; every BatchNorm folds into an
affine from running stats (eval only — training keeps the three-piece path
whose backward is the custom-VJP kernel in dyn_graph.py).

Layout discipline follows dyn_graph.py: one whole-tile rotation each way
around the per-subset contractions, graph math in f32, no lane-dim slicing.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dyn_graph import _pad8, _pad128


def _block_kernel(x_ref, wpre_ref, bpre_ref, w1_ref, b1_ref, w2_ref, b2_ref,
                  A_ref, gates_ref, wpost_ref, bpost_ref, *rest,
                  K, Cm, has_down):
    if has_down:
        wdown_ref, bdown_ref, out_ref = rest
    else:
        out_ref, = rest
        wdown_ref = bdown_ref = None

    f32 = jnp.float32
    x = x_ref[0].astype(f32)                            # (T, V, C)
    T, V = x.shape[0], x.shape[1]

    # pre = ReLU(BN(pre_conv(x))), BN folded host-side
    pre = jax.lax.dot_general(x, wpre_ref[...],
                              dimension_numbers=(((2,), (0,)), ((), ())),
                              preferred_element_type=f32)
    pre = jnp.maximum(pre + bpre_ref[...], 0.0)         # (T, V, K*Cm)

    # query/key from the T-mean (reference gcn.py:1528-1535, ctr=ada='T')
    xm = jnp.mean(x, axis=0)                            # (V, C)
    x1 = jax.lax.dot_general(xm, w1_ref[...],
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=f32) + b1_ref[...]
    x2 = jax.lax.dot_general(xm, w2_ref[...],
                             dimension_numbers=(((1,), (0,)), ((), ())),
                             preferred_element_type=f32) + b2_ref[...]
    x1t = jnp.transpose(x1, (1, 0))                     # (K*Cm, V)
    x2t = jnp.transpose(x2, (1, 0))
    A = A_ref[...]

    pre_t = jnp.transpose(pre, (2, 0, 1))               # (K*Cm, T, V)
    parts = []
    for k in range(K):
        cs = slice(k * Cm, (k + 1) * Cm)
        q1, q2 = x1t[cs], x2t[cs]                       # (Cm, V)
        raw = jax.lax.dot_general(q1, q2,
                                  dimension_numbers=(((0,), (0,)), ((), ())),
                                  preferred_element_type=f32)
        ada = jax.nn.softmax(raw, axis=-2)              # (V, W)
        ctr = jnp.tanh(q1[:, :, None] - q2[:, None, :])
        G_k = ctr * gates_ref[0, k] + (ada * gates_ref[1, k] + A[k])[None]
        parts.append(jax.lax.dot_general(
            pre_t[cs], G_k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=f32))                # (Cm, T, W)
    y = jnp.transpose(jnp.concatenate(parts, axis=0), (1, 2, 0))

    out = jax.lax.dot_general(y, wpost_ref[...],
                              dimension_numbers=(((2,), (0,)), ((), ())),
                              preferred_element_type=f32) + bpost_ref[...]
    if has_down:
        res = jax.lax.dot_general(x, wdown_ref[...],
                                  dimension_numbers=(((2,), (0,)), ((), ())),
                                  preferred_element_type=f32) + bdown_ref[...]
    else:
        res = x
    out_ref[0] = jnp.maximum(out + res, 0.0).astype(out_ref.dtype)


def fits_vmem(T, V, C, KCm, Cout, Cm, budget=13 * 2 ** 20):
    """Whether the full-T per-sample step fits scoped VMEM: tile-shaped
    live copies (x + double-buffered in, pre + rotation, y parts + concat +
    rotation, out + res + double-buffered out) plus the per-subset graph
    temporaries, padding-aware.  Callers fall back to the three-piece path
    when this is False."""
    Vp, Wp = _pad8(V), _pad128(V)
    tiles = T * Vp * (3 * _pad128(C) + 4 * _pad128(KCm)
                      + 3 * _pad128(Cout)) * 4
    graph = 6 * Cm * Vp * Wp * 4
    return tiles + graph <= budget


def fused_dggcn_block_eval(x, w_pre, b_pre, w1, b1, w2, b2, A, alpha, beta,
                           w_post, b_post, w_down=None, b_down=None, *,
                           K, Cm, interpret=False):
    """x: (N, T, V, C) -> (N, T, V, C_out).  All BNs pre-folded into the
    conv weights/biases; alpha/beta are the effective per-subset gate
    vectors (K,)."""
    N, T, V, C = x.shape
    Cout = w_post.shape[-1]
    f32 = jnp.float32
    gates = jnp.stack([jnp.asarray(alpha, f32), jnp.asarray(beta, f32)])
    consts = [w_pre, b_pre, w1, b1, w2, b2, A]
    has_down = w_down is not None
    kernel = functools.partial(_block_kernel, K=K, Cm=Cm, has_down=has_down)
    in_specs = [pl.BlockSpec((1, T, V, C), lambda n: (n, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    args = [x]
    for cst in consts:
        cst = jnp.asarray(cst, f32)
        in_specs.append(pl.BlockSpec(cst.shape,
                                     lambda n, nd=cst.ndim: (0,) * nd,
                                     memory_space=pltpu.VMEM))
        args.append(cst)
    in_specs.append(pl.BlockSpec((2, K), lambda n: (0, 0),
                                 memory_space=pltpu.SMEM))
    args.append(gates)
    for cst in ([w_post, b_post] + ([w_down, b_down] if has_down else [])):
        cst = jnp.asarray(cst, f32)
        in_specs.append(pl.BlockSpec(cst.shape,
                                     lambda n, nd=cst.ndim: (0,) * nd,
                                     memory_space=pltpu.VMEM))
        args.append(cst)
    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, V, Cout), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, T, V, Cout), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(*args)
