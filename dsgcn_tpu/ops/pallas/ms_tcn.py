"""Fused multi-branch temporal conv (dgmstcn) Pallas kernel — eval mode.

The dgmstcn region (reference tcn.py:344-431, SURVEY §7 step 7 / §8 fusion
target) is the second hot op of every DG/DS-GCN block: append a joint-mean
pseudo-joint, run six branches (1x1 -> BN -> ReLU -> {k=3 dilated temporal
conv | maxpool3} plus a plain strided 1x1), concatenate, broadcast-add the
global joint back per-joint, then BN -> ReLU -> 1x1 transform -> BN.

The XLA lowering is HBM-bound at 56-63% of roofline and moves ~9.5 GB per
stage call at saturated batch (measured v5e, n=1024) because every branch's
pre/post tensors round-trip HBM.  This kernel keeps the whole region in VMEM
per (sample,) grid step: reads x once, writes the block output once — the
ideal-fusion traffic is 6.4-6.9x smaller.

Eval-mode only: all five BatchNorms fold into per-channel affines (running
stats).  Training keeps the XLA path (batch statistics are cross-sample, and
saturated-batch training is remat-bound, not TCN-bound).

Mosaic-friendly structure — no lane-dim slicing or concatenation anywhere
(arbitrary-offset lane ops sent the Mosaic compiler into a >8 min tailspin):

* the five branch pre-1x1s run as ONE matmul into a (T, V+1, P) block
  (P = rem + 4*mid), BNs folded, ReLU in-kernel;
* each k=3 dilated conv tap is zero-embedded into a (P, C') matrix — its
  (cb, cb) block sits at (branch input slot, branch output slot) — and taps
  are grouped by temporal shift (4-d)+j*d, so the whole 4-branch x 3-tap
  family is S<=9 matmuls over row-shifted views of one zero-padded pre
  (padding everything to the 128-lane MXU tile makes the embedded and
  sliced forms cost identical FLOP-time);
* the maxpool branch maxes the FULL padded pre (pre >= 0 post-ReLU, so
  zero-padding is equivalent to the -inf padding of MaxPool2d) and selects
  its slot columns with a one-hot (P, C') matmul;
* the plain 1x1 branch embeds (C, mid) into (C, C');
* branch outputs accumulate as (T', V+1, C') adds — no lane concat.

Weights are folded host-side by the DGMSTCN module (see _fused_eval).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_out_len(T: int, stride: int) -> int:
    # k=3 pad=d (and maxpool3 pad=1, and 1x1): all give ceil(T / stride)
    return -(-T // stride)


def _kernel(x_ref, wp_ref, bp_ref, ws_ref, wmax_ref, w11_ref, ball_ref,
            atr_ref, btr_ref, wtc_ref, btc_ref, aout_ref, bout_ref,
            coeff_ref, out_ref, *, shifts, pad, stride, V, global_joint):
    f32 = jnp.float32
    x = x_ref[0].astype(f32)                          # (T, V, C)
    T = x.shape[0]
    Tp = _conv_out_len(T, stride)
    if global_joint:                                  # dgmstcn: V-mean joint
        mean = jnp.mean(x, axis=1, keepdims=True)     # (T, 1, C)
        xg = jnp.concatenate([x, mean], axis=1)       # (T, V+1, C)
    else:                                             # mstcn: plain branches
        xg = x

    # fused pre-1x1 of branches 0-4 (BN folded host-side) + ReLU
    pre = jax.lax.dot_general(xg, wp_ref[...],
                              dimension_numbers=(((2,), (0,)), ((), ())),
                              preferred_element_type=f32)
    pre = jnp.maximum(pre + bp_ref[...], 0.0)         # (T, V+1, P)
    zp = jnp.zeros((pad,) + pre.shape[1:], f32)
    xp = jnp.concatenate([zp, pre, zp], axis=0)       # (T + 2*pad, V+1, P)

    def rows(a, start):
        # rows start, start+stride, ... (Tp rows)
        return jax.lax.slice(a, (start, 0, 0),
                             (start + stride * (Tp - 1) + 1,) + a.shape[1:],
                             (stride, 1, 1))

    out = jnp.broadcast_to(ball_ref[...],
                           (Tp, xp.shape[1], ball_ref.shape[-1]))
    for s, off in enumerate(shifts):                  # dilated-conv taps
        out = out + jax.lax.dot_general(
            rows(xp, off), ws_ref[s],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=f32)

    m = rows(xp, pad - 1)                             # maxpool3, pad 1
    for j in (1, 2):
        m = jnp.maximum(m, rows(xp, pad - 1 + j))
    out = out + jax.lax.dot_general(
        m, wmax_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=f32)

    xs = jax.lax.slice(xg, (0, 0, 0),                 # plain 1x1 branch
                       (stride * (Tp - 1) + 1,) + xg.shape[1:],
                       (stride, 1, 1))
    out = out + jax.lax.dot_general(
        xs, w11_ref[...], dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=f32)                   # (Tp, V+1, C')

    if global_joint:
        # global joint broadcast-add, per-joint coefficient
        feat = (out[:, :V, :]
                + out[:, V:V + 1, :] * coeff_ref[...][None, :, None])
    else:
        feat = out
    feat = jnp.maximum(feat * atr_ref[...] + btr_ref[...], 0.0)
    feat = jax.lax.dot_general(feat, wtc_ref[...],
                               dimension_numbers=(((2,), (0,)), ((), ())),
                               preferred_element_type=f32) + btc_ref[...]
    feat = feat * aout_ref[...] + bout_ref[...]
    out_ref[0] = feat.astype(out_ref.dtype)


def pack_branches(taps_w, taps_b, w_max_slot, w_11, b_11, dilations,
                  mids, out_slots, P, Cp):
    """Embed the per-branch weights into shift-grouped (P, C') matrices.

    taps_w[i]: (3, cb, cb); mids[i]/out_slots[i]: input-slot offset in P and
    output-slot offset in C' of branch i; w_max_slot: (in_off, width,
    out_off) of the maxpool branch; returns (shifts, ws (S,P,C'),
    wmax (P,C'), w11e (C,C'), bias_all (C',), pad)."""
    pad = max(dilations)
    groups = {}
    for i, d in enumerate(dilations):
        for j in range(3):
            off = (pad - d) + j * d
            groups.setdefault(off, []).append((i, j))
    shifts = tuple(sorted(groups))
    f32 = jnp.float32
    # traced params flow in here (apply runs under jit): build with jnp.at
    # on static slot offsets
    ws = jnp.zeros((len(shifts), P, Cp), f32)
    bias_all = jnp.zeros((Cp,), f32)
    for s, off in enumerate(shifts):
        for i, j in groups[off]:
            cb = taps_w[i].shape[-1]
            r, c = mids[i], out_slots[i]
            ws = ws.at[s, r:r + cb, c:c + cb].set(taps_w[i][j].astype(f32))
    for i, b in enumerate(taps_b):
        c = out_slots[i]
        bias_all = bias_all.at[c:c + b.shape[0]].set(b.astype(f32))
    r, w, c = w_max_slot
    wmax = np.zeros((P, Cp), np.float32)
    wmax[r:r + w, c:c + w] = np.eye(w, dtype=np.float32)
    C = w_11.shape[0]
    w11e = jnp.zeros((C, Cp), f32)
    c11 = Cp - w_11.shape[1]
    w11e = w11e.at[:, c11:].set(w_11.astype(f32))
    bias_all = bias_all.at[c11:].set(b_11.astype(f32))
    return shifts, ws, jnp.asarray(wmax), w11e, bias_all, pad


def fused_dgmstcn_eval(x, w_pre, b_pre, shifts, ws, wmax, w11e, bias_all,
                       a_tr, b_tr, w_tc, b_tc, a_out, b_out, coeff, *,
                       pad, stride=1, interpret=False):
    """x: (N, T, V, C) -> (N, ceil(T/stride), V, C').  See module docstring;
    (shifts, ws, wmax, w11e, bias_all, pad) come from ``pack_branches``.
    ``coeff=None`` selects the plain-MSTCN form (reference mstcn,
    tcn.py:104-180): no joint-mean pseudo-joint, no global broadcast-add —
    everything else is structurally identical."""
    N, T, V, C = x.shape
    Cp = w_tc.shape[-1]
    Tp = _conv_out_len(T, stride)
    f32 = jnp.float32
    global_joint = coeff is not None
    if coeff is None:
        coeff = jnp.zeros((V,), f32)
    consts = [w_pre, b_pre, ws, wmax, w11e, bias_all, a_tr, b_tr, w_tc,
              b_tc, a_out, b_out, coeff]
    consts = [jnp.asarray(c, f32) for c in consts]
    in_specs = [pl.BlockSpec((1, T, V, C), lambda n: (n, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    in_specs += [pl.BlockSpec(c.shape, lambda n, nd=c.ndim: (0,) * nd,
                              memory_space=pltpu.VMEM) for c in consts]
    kernel = functools.partial(_kernel, shifts=tuple(shifts), pad=pad,
                               stride=stride, V=V, global_joint=global_joint)
    return pl.pallas_call(
        kernel,
        grid=(N,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Tp, V, Cp), lambda n: (n, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((N, Tp, V, Cp), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            # stage-0 (T=100, C=64) keeps ~26 MB of branch intermediates
            # live per sample — over the 16 MB default scoped-vmem budget
            # but well under the chip's 128 MB VMEM; the temporal halo
            # (k=3, dil<=4) makes T-tiling non-trivial, so raise the limit
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, *consts)


def fold_bn(scale, bias, mean, var, eps=1e-5):
    """Eval BatchNorm -> per-channel (a, b): y = x*a + b (matches
    ops.common.BatchNorm's eval path bit-for-bit in f32)."""
    a = scale * jax.lax.rsqrt(var + eps)
    return a, bias - mean * a
