"""Temporal convolution ops (channels-last ``(N, T, V, C)``).

TPU-native equivalents of the reference temporal units
(/root/reference/pyskl/models/gcns/utils/tcn.py and msg3d_utils.py): the k x 1
temporal convs run as NHWC convs on the MXU, multi-branch variants concatenate
on the lane (channel) axis.
"""
from __future__ import annotations

from typing import List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .common import (Array, BatchNorm, PointConv, TemporalConv,
                     kaiming_normal_fan_out, max_pool_t, torch_default_bias)

MsCfgEntry = Union[str, Tuple[Union[str, int], int]]
DEFAULT_MS_CFG: Tuple[MsCfgEntry, ...] = ((3, 1), (3, 2), (3, 3), (3, 4), ("max", 3), "1x1")


class UnitTCN(nn.Module):
    """k x 1 temporal conv + BN + dropout (reference unit_tcn, tcn.py:10-37).

    ``bn_axis``: sync BN stats over a mesh axis (joint-partition sharding)."""
    out_channels: int
    kernel_size: int = 9
    stride: int = 1
    dilation: int = 1
    norm: Optional[str] = "BN"
    dropout: float = 0.0
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        y = TemporalConv(self.out_channels, self.kernel_size, self.stride,
                         self.dilation, name="conv")(x)
        if self.norm is not None:
            y = BatchNorm(name="bn", axis_name=self.bn_axis)(
                y, use_running_average=not train)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y


class UnitMLP(nn.Module):
    """Depthwise *causal* temporal conv + 1x1 merge — the reference's
    temporal-MLP unit (unitmlp, tcn.py:525-610).

    kernel = (k+1)//2 taps, left-padded (causal); optional fused plain tcn
    via a learned alpha gate (add_tcn, tcn.py:598-604).
    """
    out_channels: int
    kernel_size: int = 5
    stride: int = 1
    dilation: int = 1
    norm: Optional[str] = "BN"
    dropout: float = 0.0
    adaptive: bool = True
    channel_annention: bool = False
    reduce: int = 4
    add_tcn: bool = False
    merge_after: bool = False

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        n, t, v, c = x.shape
        assert c == self.out_channels, "depthwise mlp expects in == out channels"
        mlp_size = (self.kernel_size + 1) // 2
        d = self.dilation
        pad = mlp_size + (mlp_size - 1) * (d - 1) - 1   # causal left pad
        kernel = self.param("conv_kernel", torch_default_bias(mlp_size),
                            (mlp_size, 1, 1, c))
        bias = self.param("conv_bias", torch_default_bias(mlp_size), (c,))
        y = jax.lax.conv_general_dilated(
            x, kernel.astype(x.dtype), window_strides=(self.stride, 1),
            padding=((pad, 0), (0, 0)), rhs_dilation=(d, 1),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)
        y = y + bias.astype(x.dtype)

        # 'channel attention' (reference tcn.py:546-548, 593): with a truthy
        # channel_annention, the time axis is chunked into `group` contiguous
        # blocks which are averaged (comb-subsampling T -> T/group).  Only
        # sound when T' divides; group=1 (falsy) is the identity.
        if self.channel_annention:
            group = 8 if c <= 16 else c // self.reduce
            t2 = y.shape[1]
            assert t2 % group == 0, \
                f"channel_annention needs group {group} | T' {t2}"
            y = y.reshape(n, group, t2 // group, v, c).mean(axis=1)

        if self.add_tcn:
            x_tcn = TemporalConv(self.out_channels, self.kernel_size,
                                 self.stride, d, name="conv2")(x)
            if self.adaptive:
                alpha = self.param("alpha", nn.initializers.zeros_init(), (1,))
            else:
                alpha = jnp.ones((1,), x.dtype)
            if self.merge_after:
                y = PointConv(self.out_channels, name="conv1")(y)
                y = y + alpha[0] * x_tcn
            else:
                y = y + alpha[0] * x_tcn
                y = PointConv(self.out_channels, name="conv1")(y)
        else:
            y = PointConv(self.out_channels, name="conv1")(y)
        if self.norm is not None:
            y = BatchNorm(name="bn")(y, use_running_average=not train)
        if self.dropout > 0:
            y = nn.Dropout(self.dropout, deterministic=not train)(y)
        return y


class _MSBranches(nn.Module):
    """Shared multi-branch structure of mstcn/dgmstcn/msmlp (reference
    tcn.py:134-153, 215-234).

    Branch i: 1x1 -> BN -> ReLU -> {k x 1 dilated conv | causal mlp | maxpool},
    or a plain strided 1x1.  Branch 0 gets the remainder channels.
    """
    out_channels: int
    mid_channels: Optional[float] = None
    ms_cfg: Tuple[MsCfgEntry, ...] = DEFAULT_MS_CFG
    stride: int = 1
    branch_kind: str = "tcn"    # 'tcn' | 'mlp'
    channel_annention: bool = False   # mlp branches only (gcmlp passthrough)
    add_tcn: bool = False
    merge_after: bool = False
    bn_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, *, train: bool,
                 bn_weight: Optional[Array] = None,
                 as_list: bool = False):
        num_branches = len(self.ms_cfg)
        if self.mid_channels is None:
            mid = self.out_channels // num_branches
            rem = self.out_channels - mid * (num_branches - 1)
        else:
            mid = int(self.out_channels * self.mid_channels)
            rem = mid

        # Merge every branch's 1x1 pre-conv into ONE matmul so the (often
        # concat-widened, V=26) input is read once: XLA otherwise
        # materializes a layout copy of x inside each branch's conv fusion —
        # measured 6 x 2.7 GB of pure copy traffic per dgmstcn at b1024
        # (scratch HLO audit, round 3).  Math is the column-concatenation of
        # the per-branch matmuls (identical contractions); params stay the
        # per-branch modules (checkpoint-compatible), read via the scope on
        # the non-init path exactly like ms_tcn.py's eval fusion does.
        merged = {}
        if not self.is_initializing():
            from .common import accum_dtype
            ws, bs, offs = [], [], {}
            off = 0
            for i, cfg in enumerate(self.ms_cfg):
                bc = rem if i == 0 else mid
                if cfg == "1x1":
                    # TemporalConv k=1 == a 1x1: fold its (1, in, out) kernel
                    # into the same matmul; its stride applies afterwards
                    s = self.scope.push(f"branch{i}_conv", reuse=True) \
                        .push("conv", reuse=True)
                    ws.append(s.get_variable("params", "kernel")[0, 0])
                else:
                    s = self.scope.push(f"branch{i}_pre", reuse=True)
                    ws.append(s.get_variable("params", "kernel"))
                bs.append(s.get_variable("params", "bias"))
                offs[i] = (off, bc)
                off += bc
            W = jnp.concatenate(ws, axis=-1).astype(x.dtype)
            B = jnp.concatenate(bs).astype(x.dtype)
            big = jnp.einsum("...i,io->...o", x, W,
                             preferred_element_type=accum_dtype(x.dtype)
                             ).astype(x.dtype) + B
            merged = {i: big[..., o:o + bc] for i, (o, bc) in offs.items()}

        outs: List[Array] = []
        for i, cfg in enumerate(self.ms_cfg):
            branch_c = rem if i == 0 else mid
            if cfg == "1x1":
                if i in merged:
                    b = merged[i][:, ::self.stride]
                else:
                    b = TemporalConv(branch_c, kernel_size=1,
                                     stride=self.stride,
                                     name=f"branch{i}_conv")(x)
                outs.append(b)
                continue
            kind, val = cfg
            b = merged[i] if i in merged else \
                PointConv(branch_c, name=f"branch{i}_pre")(x)
            b = BatchNorm(name=f"branch{i}_bn", axis_name=self.bn_axis)(
                b, use_running_average=not train, weight=bn_weight)
            b = jax.nn.relu(b)
            if kind == "max":
                b = max_pool_t(b, window=val, stride=self.stride, padding=1)
            elif self.branch_kind == "mlp":
                b = UnitMLP(branch_c, kernel_size=kind, stride=self.stride,
                            dilation=val, norm=None,
                            channel_annention=self.channel_annention,
                            add_tcn=self.add_tcn,
                            merge_after=self.merge_after,
                            name=f"branch{i}_mlp")(b, train=train)
            else:
                b = UnitTCN(branch_c, kernel_size=kind, stride=self.stride,
                            dilation=val, norm=None, name=f"branch{i}_tcn")(
                                b, train=train)
            outs.append(b)
        # as_list: callers that consume branches per-slice (eval fast path)
        # skip the concat — XLA assigns it a layout the downstream matmuls
        # reject, costing a full copy of the block tensor (HLO audit)
        return outs if as_list else jnp.concatenate(outs, axis=-1)


class MSTCN(nn.Module):
    """STGCN++ multi-scale TCN (reference mstcn, tcn.py:104-180); with
    branch_kind='mlp' it becomes the author's msmlp (tcn.py:182-262)."""
    out_channels: int
    mid_channels: Optional[float] = None
    dropout: float = 0.0
    ms_cfg: Tuple[MsCfgEntry, ...] = DEFAULT_MS_CFG
    stride: int = 1
    branch_kind: str = "tcn"
    use_pallas: bool = False    # fused eval kernel (ops/pallas/ms_tcn.py)
    pallas_interpret: bool = False

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        if (self.use_pallas and not train and not self.is_initializing()
                and self.branch_kind == "tcn" and self.mid_channels is None
                and self.ms_cfg == DEFAULT_MS_CFG):
            # same fused region as dgmstcn minus the global joint
            return _fused_ms_eval(self, x, None)
        feat = _MSBranches(self.out_channels, self.mid_channels, self.ms_cfg,
                           self.stride, self.branch_kind,
                           name="branches")(x, train=train)
        feat = BatchNorm(name="transform_bn")(feat, use_running_average=not train)
        feat = jax.nn.relu(feat)
        feat = PointConv(self.out_channels, name="transform_conv")(feat)
        feat = BatchNorm(name="bn")(feat, use_running_average=not train)
        if self.dropout > 0:
            feat = nn.Dropout(self.dropout, deterministic=not train)(feat)
        return feat


class GCMLP(nn.Module):
    """msmlp without the post-concat 1x1 transform (reference gcmlp,
    tcn.py:263-340): branches -> concat -> BN -> dropout.  Output width is
    the sum of branch widths (== out_channels for default mid_channels).

    Reference quirks reproduced/documented: its default channel_annention=1
    turns on unitmlp's time-comb averaging (tcn.py:546-548), which shrinks T
    on mlp branches and makes the concat crash — usable only with
    channel_annention falsy, the form implemented by default here.  Its only
    consumer, METAGC/GClock, is dead code as committed (GClock.forward
    returns a single tensor, metagc.py:36-42, while METAGC.forward unpacks
    three, metagc.py:100-101)."""
    out_channels: int
    mid_channels: Optional[float] = None
    dropout: float = 0.0
    ms_cfg: Tuple[MsCfgEntry, ...] = DEFAULT_MS_CFG
    stride: int = 1
    channel_annention: bool = False
    add_tcn: bool = False
    merge_after: bool = False

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        feat = _MSBranches(self.out_channels, self.mid_channels, self.ms_cfg,
                           self.stride, "mlp",
                           channel_annention=self.channel_annention,
                           add_tcn=self.add_tcn, merge_after=self.merge_after,
                           name="branches")(x, train=train)
        feat = BatchNorm(name="bn")(feat, use_running_average=not train)
        if self.dropout > 0:
            feat = nn.Dropout(self.dropout, deterministic=not train)(feat)
        return feat


class DGMSTCN(nn.Module):
    """DG-STGCN multi-scale TCN with a global joint-mean branch
    (reference dgmstcn, tcn.py:344-431).

    A V-mean pseudo-joint is appended before the branches; afterwards the global
    node's features are broadcast back to every joint scaled by a learned
    per-joint coefficient (tcn.py:407-423).
    """
    out_channels: int
    mid_channels: Optional[float] = None
    num_joints: int = 25
    dropout: float = 0.0
    ms_cfg: Tuple[MsCfgEntry, ...] = DEFAULT_MS_CFG
    stride: int = 1
    branch_kind: str = "tcn"    # 'mlp' -> the author's dgmsmlp (tcn.py:432-524)
    graph_axis: Optional[str] = None   # joint-partition mesh axis
    use_pallas: bool = False    # fused eval kernel (ops/pallas/ms_tcn.py)
    pallas_interpret: bool = False
    # eval layout: 'split' runs the branch stack separately on x and the
    # (N, T, 1, C) global joint (no 26-joint tensor copy — wins at large
    # batch); 'concat' appends the global joint as a 26th row and runs the
    # stack ONCE (half the op count — at small batch the split form's ~80
    # small ops cost a measured ~0.56 ms/block of batch-independent per-op
    # overhead, ~5.6 ms of the b16 step).  'auto' picks by effective batch
    # at trace time (shapes are static under jit).
    eval_layout: str = "auto"   # 'auto' | 'split' | 'concat'
    # joint-padded eval mode (see ops/gcn.py DGGCN.v_pad): the joint axis is
    # zero-padded to v_pad; the global branch means over the REAL num_joints
    # only, the global broadcast-back uses a zero coefficient at padded
    # joints, and in the concat layout the global pseudo-joint is written
    # INTO padded slot ``num_joints`` instead of appending a 26th row (the
    # tensor stays at the aligned 32-row width)
    v_pad: int = 0

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        if self.eval_layout not in ("auto", "split", "concat"):
            raise ValueError(
                f"eval_layout must be 'auto', 'split' or 'concat'; "
                f"got {self.eval_layout!r}")
        n, t, v, c = x.shape
        padded = bool(self.v_pad) and v > self.num_joints
        if self.v_pad:
            assert not train and self.graph_axis is None \
                and v == self.v_pad, (self.v_pad, v, train)
        use_split_eval = (self.eval_layout == "split"
                          or (self.eval_layout == "auto" and n >= 64))
        add_coeff = self.param("add_coeff", nn.initializers.zeros_init(),
                               (self.num_joints,))
        if padded:
            # padded joints: no global contribution (their rows are garbage
            # and sliced off by the backbone)
            coeff_pad = jnp.concatenate(
                [add_coeff, jnp.zeros((v - self.num_joints,),
                                      add_coeff.dtype)])
        if (self.use_pallas and not train and not self.is_initializing()
                and self.graph_axis is None and self.branch_kind == "tcn"
                and self.mid_channels is None and not padded
                and self.ms_cfg == DEFAULT_MS_CFG):
            # eval-only fusion: the five BatchNorms fold into affines from
            # running stats; params are read from the tree the XLA path
            # created at init (identical tree in both modes)
            return _fused_ms_eval(self, x, add_coeff[:v])
        if (self.graph_axis is None and not train
                and not self.is_initializing() and use_split_eval):
            # eval fast path — exact (every BN here is an affine from running
            # stats and all ops are per-joint/per-channel):
            # 1. the SAME branches module (shared params) runs on x and on
            #    the global mean joint separately — no 26-joint tensor;
            # 2. the transform region runs as per-branch BN-affine + relu,
            #    ONE channel concat, then ONE (C, C_out) transform matmul.
            #    Measured (scratch/tcn_decomp, NM=1024 stage shape): the
            #    six per-branch row-block partial matmuls cost 9.9 us/sample
            #    (K=10..14 on the 128x128 MXU); the single K=64 matmul cuts
            #    the block to 13.7 us from 17.8, and the concat of aligned
            #    elementwise producers adds no layout copy (unlike the
            #    pre-merged-conv structure round 3 started from).  Peak
            #    liveness matches the plain concat path, which fits the
            #    fp32 NM=2048 regime.
            from .pallas.ms_tcn import fold_bn
            from .common import accum_dtype
            branches = _MSBranches(self.out_channels, self.mid_channels,
                                   self.ms_cfg, self.stride,
                                   self.branch_kind, name="branches")
            if padded:
                mean_joint = x[:, :, :self.num_joints].mean(
                    axis=2, keepdims=True).astype(x.dtype)
                coeff = coeff_pad.astype(x.dtype)
            else:
                mean_joint = x.mean(axis=2, keepdims=True).astype(x.dtype)
                coeff = add_coeff[:v].astype(x.dtype)
            locals_ = branches(x, train=False, as_list=True)
            globals_ = branches(mean_joint, train=False, as_list=True)

            sbn = self.scope.push("transform_bn", reuse=True) \
                .push("bn", reuse=True)
            a_bn, b_bn = fold_bn(sbn.get_variable("params", "scale"),
                                 sbn.get_variable("params", "bias"),
                                 sbn.get_variable("batch_stats", "mean"),
                                 sbn.get_variable("batch_stats", "var"))
            stc = self.scope.push("transform_conv", reuse=True)
            w_t = stc.get_variable("params", "kernel").astype(x.dtype)
            b_t = stc.get_variable("params", "bias").astype(x.dtype)

            zs = []
            off = 0
            for bl, gl in zip(locals_, globals_):
                bc = bl.shape[-1]
                f = bl + gl[:, :, 0][:, :, None, :] * coeff[None, None, :, None]
                f = f * a_bn[off:off + bc].astype(x.dtype) \
                    + b_bn[off:off + bc].astype(x.dtype)
                zs.append(jax.nn.relu(f))
                off += bc
            z = jnp.concatenate(zs, axis=-1)
            feat = jnp.einsum(
                "...i,io->...o", z, w_t,
                preferred_element_type=accum_dtype(x.dtype)
            ).astype(x.dtype) + b_t
            feat = BatchNorm(name="bn")(feat, use_running_average=True)
            if self.dropout > 0:
                feat = nn.Dropout(self.dropout, deterministic=True)(feat)
            return feat
        if self.graph_axis is None:
            if padded:
                # global pseudo-joint written INTO padded slot num_joints —
                # the tensor keeps its aligned v_pad-row width (no 26th-row
                # append); rows past it stay garbage and are sliced off by
                # the backbone
                vr = self.num_joints
                mean_joint = x[:, :, :vr].mean(axis=2, keepdims=True)
                xg = jax.lax.dynamic_update_slice_in_dim(
                    x, mean_joint.astype(x.dtype), vr, axis=2)
                out = _MSBranches(self.out_channels, self.mid_channels,
                                  self.ms_cfg, self.stride, self.branch_kind,
                                  name="branches")(xg, train=train)
                global_feat = out[:, :, vr]                  # (N, T', C')
                feat = out + global_feat[:, :, None, :] \
                    * coeff_pad[None, None, :, None]
                feat = BatchNorm(name="transform_bn")(
                    feat, use_running_average=not train)
                feat = jax.nn.relu(feat)
                feat = PointConv(self.out_channels, name="transform_conv")(feat)
                feat = BatchNorm(name="bn")(feat, use_running_average=not train)
                if self.dropout > 0:
                    feat = nn.Dropout(self.dropout, deterministic=True)(feat)
                return feat
            mean_joint = x.mean(axis=2, keepdims=True)
            coeff = add_coeff[:v]
            bn_weight = None
        else:
            # every shard appends the SAME global-mean joint; branch BN stats
            # weight it 1/G so it counts once, matching the unsharded model
            gsz = jax.lax.axis_size(self.graph_axis)
            gi = jax.lax.axis_index(self.graph_axis)
            mean_joint = jax.lax.psum(x.sum(axis=2, keepdims=True),
                                      self.graph_axis) / (gsz * v)
            coeff = jax.lax.dynamic_slice_in_dim(add_coeff, gi * v, v)
            bn_weight = jnp.concatenate(
                [jnp.ones((v, 1), x.dtype),
                 jnp.full((1, 1), 1.0 / gsz, x.dtype)], axis=0)
        # append global mean joint (tcn.py:409)
        xg = jnp.concatenate([x, mean_joint.astype(x.dtype)], axis=2)
        out = _MSBranches(self.out_channels, self.mid_channels, self.ms_cfg,
                          self.stride, self.branch_kind,
                          bn_axis=self.graph_axis,
                          name="branches")(xg, train=train,
                                           bn_weight=bn_weight)
        local_feat = out[:, :, :v]
        global_feat = out[:, :, v]                       # (N, T', C')
        feat = local_feat + global_feat[:, :, None, :] * coeff[None, None, :, None]
        feat = BatchNorm(name="transform_bn", axis_name=self.graph_axis)(
            feat, use_running_average=not train)
        feat = jax.nn.relu(feat)
        feat = PointConv(self.out_channels, name="transform_conv")(feat)
        feat = BatchNorm(name="bn", axis_name=self.graph_axis)(
            feat, use_running_average=not train)
        if self.dropout > 0:
            feat = nn.Dropout(self.dropout, deterministic=not train)(feat)
        return feat

def _fused_ms_eval(mod, x: Array, coeff: Optional[Array]) -> Array:
    """Whole-region Pallas fusion for MSTCN/DGMSTCN eval (x read once,
    output written once).

    Reads the params/batch_stats the XLA path laid down (same tree in both
    modes; eval never mutates), folds each BatchNorm into a per-channel
    affine, and folds the branch BNs into the fused pre-1x1 weights.
    ``coeff=None`` -> plain MSTCN (no global joint)."""
    from .pallas.ms_tcn import fold_bn, fused_dgmstcn_eval, pack_branches

    br = mod.scope.push("branches", reuse=True)

    def bn_fold(scope, name):
        s = scope.push(name, reuse=True).push("bn", reuse=True)
        return fold_bn(s.get_variable("params", "scale"),
                       s.get_variable("params", "bias"),
                       s.get_variable("batch_stats", "mean"),
                       s.get_variable("batch_stats", "var"))

    wp_cols, bp_cols, taps_w, taps_b = [], [], [], []
    dilations, in_slots, out_slots = [], [], []
    in_off = out_off = 0
    max_slot = None
    for i, cfg in enumerate(mod.ms_cfg):
        if cfg == "1x1":
            s = br.push(f"branch{i}_conv", reuse=True).push("conv",
                                                            reuse=True)
            w11 = s.get_variable("params", "kernel")[0, 0]   # (C, mid)
            b11 = s.get_variable("params", "bias")
            out_off += b11.shape[0]
            continue
        sp = br.push(f"branch{i}_pre", reuse=True)
        a, b = bn_fold(br, f"branch{i}_bn")
        wp_cols.append(sp.get_variable("params", "kernel") * a[None])
        bp_cols.append(sp.get_variable("params", "bias") * a + b)
        kind, _val = cfg
        cb = a.shape[0]
        if kind == "max":
            max_slot = (in_off, cb, out_off)
        else:
            s = br.push(f"branch{i}_tcn", reuse=True) \
                  .push("conv", reuse=True).push("conv", reuse=True)
            taps_w.append(s.get_variable("params", "kernel")[:, 0])
            taps_b.append(s.get_variable("params", "bias"))
            dilations.append(_val)
            in_slots.append(in_off)
            out_slots.append(out_off)
        in_off += cb
        out_off += cb
    a_tr, b_tr = bn_fold(mod.scope, "transform_bn")
    stc = mod.scope.push("transform_conv", reuse=True)
    w_tc = stc.get_variable("params", "kernel")
    b_tc = stc.get_variable("params", "bias")
    a_out, b_out = bn_fold(mod.scope, "bn")
    shifts, ws, wmax, w11e, bias_all, pad = pack_branches(
        taps_w, taps_b, max_slot, w11, b11, tuple(dilations),
        tuple(in_slots), tuple(out_slots), in_off, mod.out_channels)
    return fused_dgmstcn_eval(
        x, jnp.concatenate(wp_cols, axis=1), jnp.concatenate(bp_cols),
        shifts, ws, wmax, w11e, bias_all,
        a_tr, b_tr, w_tc, b_tc, a_out, b_out, coeff,
        pad=pad, stride=mod.stride, interpret=mod.pallas_interpret)


class CTRMSTCN(nn.Module):
    """CTR-GCN's multi-scale TCN (reference MSTCN, msg3d_utils.py:64-142).

    Differs from :class:`MSTCN`: per-branch trailing BN, the *last* (1x1) branch
    takes the remainder channels, and act comes after the residual add.
    """
    out_channels: int
    kernel_size: Union[int, Sequence[int]] = 3
    stride: int = 1
    dilations: Tuple[int, ...] = (1, 2, 3, 4)
    residual: bool = True
    tcn_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        in_c = x.shape[-1]
        num_branches = len(self.dilations) + 2
        branch_c = self.out_channels // num_branches
        branch_rem = self.out_channels - branch_c * (num_branches - 1)
        ks = self.kernel_size
        kernel_sizes = list(ks) if isinstance(ks, (list, tuple)) else [ks] * len(self.dilations)

        if not self.residual:
            res = 0.0
        elif in_c == self.out_channels and self.stride == 1:
            res = x
        else:
            res = UnitTCN(self.out_channels, kernel_size=1, stride=self.stride,
                          name="residual")(x, train=train)

        outs: List[Array] = []
        for i, (k, d) in enumerate(zip(kernel_sizes, self.dilations)):
            b = PointConv(branch_c, name=f"branch{i}_pre",
                          kernel_init=kaiming_normal_fan_out())(x)
            b = BatchNorm(name=f"branch{i}_bn")(b, use_running_average=not train)
            b = jax.nn.relu(b)
            b = UnitTCN(branch_c, kernel_size=k, stride=self.stride, dilation=d,
                        name=f"branch{i}_tcn")(b, train=train)
            outs.append(b)
        i = len(self.dilations)
        b = PointConv(branch_c, name=f"branch{i}_pre",
                      kernel_init=kaiming_normal_fan_out())(x)
        b = BatchNorm(name=f"branch{i}_bn")(b, use_running_average=not train)
        b = jax.nn.relu(b)
        b = max_pool_t(b, window=3, stride=self.stride, padding=1)
        b = BatchNorm(name=f"branch{i}_bn2")(b, use_running_average=not train)
        outs.append(b)
        i += 1
        # strided 1x1 branch with remainder channels (msg3d_utils.py:114-117)
        b = TemporalConv(branch_rem, kernel_size=1, stride=self.stride,
                         name=f"branch{i}_conv",
                         kernel_init=kaiming_normal_fan_out())(x)
        b = BatchNorm(name=f"branch{i}_bn")(b, use_running_average=not train)
        outs.append(b)

        out = jnp.concatenate(outs, axis=-1)
        out = out + res
        out = jax.nn.relu(out)
        if self.tcn_dropout > 0:
            out = nn.Dropout(self.tcn_dropout, deterministic=not train)(out)
        return out


class UnitTCNEdge(nn.Module):
    """unit_tcnedge (reference tcn.py:39-103): temporal conv that fuses the
    temporal-edge representation into the node stream and re-emits updated
    temporal edges; the spatial-edge stream is time-strided to match.

    Faithful quirks: the node output passes the shared BN twice
    (tcn.py:85/97), and the 'node_remove' stream zeroes only frame 0.
    """
    out_channels: int
    kernel_size: int = 9
    stride: int = 1
    dilation: int = 1
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, edge_t: Array, edge_s: Array, *,
                 train: bool):
        n, t, v, c = x.shape
        bn = BatchNorm(name="bn")
        drop = (lambda h: nn.Dropout(self.dropout,
                                     deterministic=not train)(h)) \
            if self.dropout > 0 else (lambda h: h)

        node = TemporalConv(self.out_channels, self.kernel_size, self.stride,
                            self.dilation, name="conv")(x + edge_t)
        node = drop(bn(node, use_running_average=not train))

        node_remove = x.at[:, 0].set(0.0) if t > 0 else x
        edge_cat = jnp.concatenate([x, edge_t, node_remove], axis=-1)
        edge_out = TemporalConv(self.out_channels, self.kernel_size,
                                self.stride, self.dilation,
                                name="edge_conv")(edge_cat)

        if edge_s.shape[1] != node.shape[1]:
            ns, ts = edge_s.shape[0], edge_s.shape[1]
            flat = edge_s.reshape(ns, ts, -1, edge_s.shape[-1])
            flat = TemporalConv(self.out_channels, self.kernel_size,
                                self.stride, self.dilation,
                                name="edge_conv_S")(flat)
            flat = drop(bn(flat, use_running_average=not train))
            edge_s = flat.reshape(ns, flat.shape[1], v, v, -1)

        return (drop(bn(node, use_running_average=not train)),
                drop(bn(edge_out, use_running_average=not train)),
                edge_s)
