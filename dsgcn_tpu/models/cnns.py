"""3D-CNN backbones for the PoseC3D heatmap pathway.

TPU-native ResNet3d / SlowOnly (reference pyskl/models/cnns/resnet3d.py:201-626,
resnet3d_slowonly.py:7-17) in channels-last ``(N, T, H, W, C)`` — 3D convs run
as NDHWC on the MXU, BN stats in fp32.  The canonical PoseC3D configuration is
SlowOnly-R50 with 17 heatmap channels in, base 32, 3 stages (pyskl upstream
posec3d configs).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.common import Array, TorchBN


def _triple(x):
    return x if isinstance(x, (tuple, list)) else (x, x, x)


class ConvBN3d(nn.Module):
    """Conv3d (no bias) + BN (+ optional ReLU/Swish), torch ConvModule
    equivalent.  ``groups`` maps to feature_group_count (depthwise convs);
    ``zero_gamma`` zero-inits the BN scale (zero_init_residual)."""
    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    act: bool = True
    groups: int = 1
    zero_gamma: bool = False
    with_bn: bool = True

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        pad = tuple(((k - 1) // 2, (k - 1) // 2) for k in self.kernel)
        y = nn.Conv(self.features, kernel_size=self.kernel,
                    strides=self.stride, padding=pad, use_bias=False,
                    feature_group_count=self.groups,
                    dtype=x.dtype,
                    kernel_init=nn.initializers.variance_scaling(
                        2.0, "fan_out", "normal"),
                    name="conv")(x)
        if self.with_bn:
            y = TorchBN(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                scale_init=(nn.initializers.zeros_init() if self.zero_gamma
                            else nn.initializers.ones_init()),
                name="bn")(y.astype(jnp.float32))
            y = y.astype(x.dtype)
        return jax.nn.relu(y) if self.act else y


class Bottleneck3d(nn.Module):
    """1x1x1 -> 3x3x3/1x3x3 -> 1x1x1 bottleneck (resnet3d.py:97-198);
    inflate_style '3x1x1' puts the temporal kernel on conv1."""
    planes: int
    stride: Tuple[int, int] = (1, 1)     # (temporal, spatial)
    inflate: bool = True
    inflate_style: str = "3x1x1"
    downsample: bool = False
    advanced: bool = False
    expansion: int = 4

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        mode = "no_inflate" if not self.inflate else self.inflate_style
        k1 = {"no_inflate": (1, 1, 1), "3x1x1": (3, 1, 1), "3x3x3": (1, 1, 1)}[mode]
        k2 = {"no_inflate": (1, 3, 3), "3x1x1": (1, 3, 3), "3x3x3": (3, 3, 3)}[mode]
        ts, ss = self.stride

        out = ConvBN3d(self.planes, k1, (1, 1, 1), name="conv1")(x, train=train)
        out = ConvBN3d(self.planes, k2, (ts, ss, ss), name="conv2")(out,
                                                                    train=train)
        out = ConvBN3d(self.planes * self.expansion, (1, 1, 1), act=False,
                       name="conv3")(out, train=train)

        if self.downsample:
            if self.advanced:
                identity = ConvBN3d(self.planes * self.expansion, (1, 1, 1),
                                    act=False, name="downsample_conv")(
                                        x, train=train)
                identity = nn.avg_pool(identity, (ts, ss, ss), (ts, ss, ss))
            else:
                identity = ConvBN3d(self.planes * self.expansion, (1, 1, 1),
                                    (ts, ss, ss), act=False,
                                    name="downsample")(x, train=train)
        else:
            identity = x
        return jax.nn.relu(out + identity)


class BasicBlock3d(nn.Module):
    """Two 3x3x3 convs (resnet3d.py:14-94)."""
    planes: int
    stride: Tuple[int, int] = (1, 1)
    inflate: bool = True
    downsample: bool = False
    expansion: int = 1

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        k = (3, 3, 3) if self.inflate else (1, 3, 3)
        ts, ss = self.stride
        out = ConvBN3d(self.planes, k, (ts, ss, ss), name="conv1")(x, train=train)
        out = ConvBN3d(self.planes, k, (1, 1, 1), act=False, name="conv2")(
            out, train=train)
        if self.downsample:
            identity = ConvBN3d(self.planes, (1, 1, 1), (ts, ss, ss),
                                act=False, name="downsample")(x, train=train)
        else:
            identity = x
        return jax.nn.relu(out + identity)


ARCH_SETTINGS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class ResNet3d(nn.Module):
    """ResNet3d trunk (resnet3d.py:201-626), input (N, T, H, W, C)."""
    depth: int = 50
    in_channels: int = 3
    base_channels: int = 64
    num_stages: int = 4
    stage_blocks: Optional[Tuple[int, ...]] = None
    spatial_strides: Tuple[int, ...] = (1, 2, 2, 2)
    temporal_strides: Tuple[int, ...] = (1, 1, 1, 1)
    conv1_kernel: Tuple[int, int, int] = (3, 7, 7)
    conv1_stride: Tuple[int, int] = (1, 2)
    pool1_stride: Tuple[int, int] = (1, 2)
    with_pool2: bool = False
    advanced: bool = False
    inflate: Tuple[int, ...] = (1, 1, 1, 1)
    inflate_style: str = "3x1x1"

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        kind, default_blocks = ARCH_SETTINGS[self.depth]
        blocks = (self.stage_blocks or default_blocks)[: self.num_stages]
        expansion = 4 if kind == "bottleneck" else 1

        # stem (resnet3d.py:526-543)
        cs_t, cs_s = self.conv1_stride
        x = ConvBN3d(self.base_channels, _triple(self.conv1_kernel),
                     (cs_t, cs_s, cs_s), name="conv1")(x, train=train)
        ps_t, ps_s = self.pool1_stride
        x = nn.max_pool(x, (1, 3, 3), strides=(ps_t, ps_s, ps_s),
                        padding=((0, 0), (1, 1), (1, 1)))

        inplanes = self.base_channels
        for i, nblocks in enumerate(blocks):
            planes = self.base_channels * 2 ** i
            stage_inflate = self.inflate[i] if i < len(self.inflate) else 1
            infl = (stage_inflate,) * nblocks if isinstance(stage_inflate, int) \
                else stage_inflate
            for b in range(nblocks):
                stride = (self.temporal_strides[i], self.spatial_strides[i]) \
                    if b == 0 else (1, 1)
                need_down = b == 0 and (stride[1] != 1
                                        or inplanes != planes * expansion)
                if kind == "bottleneck":
                    x = Bottleneck3d(planes, stride, inflate=bool(infl[b]),
                                     inflate_style=self.inflate_style,
                                     downsample=need_down,
                                     advanced=self.advanced,
                                     name=f"layer{i + 1}_{b}")(x, train=train)
                else:
                    x = BasicBlock3d(planes, stride, inflate=bool(infl[b]),
                                     downsample=need_down,
                                     name=f"layer{i + 1}_{b}")(x, train=train)
                inplanes = planes * expansion
            if self.with_pool2 and i == 0:
                x = nn.max_pool(x, (2, 1, 1), strides=(2, 1, 1))
        return x


class ResNet3dSlowOnly(ResNet3d):
    """SlowOnly: 2D-style stem, temporal kernels only in late stages
    (resnet3d_slowonly.py:7-17).  PoseC3D defaults per pyskl upstream configs:
    in_channels=17 heatmaps, base 32, 3 stages, strides (2,2,2)/(1,1,2)."""
    conv1_kernel: Tuple[int, int, int] = (1, 7, 7)
    inflate: Tuple[int, ...] = (0, 0, 1, 1)


def posec3d_slowonly(**kw) -> ResNet3dSlowOnly:
    defaults = dict(depth=50, in_channels=17, base_channels=32, num_stages=3,
                    stage_blocks=(4, 6, 3), conv1_stride=(1, 1),
                    pool1_stride=(1, 1), inflate=(0, 1, 1),
                    spatial_strides=(2, 2, 2), temporal_strides=(1, 1, 2))
    defaults.update(kw)
    return ResNet3dSlowOnly(**defaults)


class C3D(nn.Module):
    """C3D backbone (reference cnns/c3d.py:11-95): 3x3x3 conv stacks with
    average pools; used for heatmap-volume PoseC3D variants."""
    in_channels: int = 3
    base_channels: int = 64
    num_stages: int = 4
    temporal_downsample: bool = True

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        assert self.num_stages in (3, 4)
        b = self.base_channels
        pk = (2, 2, 2) if self.temporal_downsample else (1, 2, 2)

        def conv(f, name):
            return lambda h: ConvBN3d(f, (3, 3, 3), name=name)(h, train=train)

        x = conv(b, "conv1a")(x)
        x = nn.avg_pool(x, (1, 2, 2), strides=(1, 2, 2))
        x = conv(b * 2, "conv2a")(x)
        x = nn.avg_pool(x, pk, strides=pk)
        x = conv(b * 4, "conv3a")(x)
        x = conv(b * 4, "conv3b")(x)
        x = nn.avg_pool(x, pk, strides=pk)
        x = conv(b * 8, "conv4a")(x)
        x = conv(b * 8, "conv4b")(x)
        if self.num_stages == 4:
            x = nn.avg_pool(x, pk, strides=pk)
            x = conv(b * 8, "conv5a")(x)
            x = conv(b * 8, "conv5b")(x)
        return x


def _round_width(width, multiplier, min_width=8, divisor=8):
    """X3D filter rounding (reference cnns/x3d.py:26-34, 299-311)."""
    if not multiplier:
        return int(width)
    width *= multiplier
    min_width = min_width or divisor
    out = max(min_width, int(width + divisor / 2) // divisor * divisor)
    if out < 0.9 * width:
        out += divisor
    return int(out)


def _round_repeats(repeats, multiplier):
    """X3D depth rounding (reference cnns/x3d.py:313-318)."""
    import math
    if not multiplier:
        return repeats
    return int(math.ceil(multiplier * repeats))


class SEModule3d(nn.Module):
    """Squeeze-and-excitation over (T, H, W) (reference cnns/x3d.py:13-43)."""
    channels: int
    reduction: float

    @nn.compact
    def __call__(self, x: Array) -> Array:
        bottleneck = _round_width(self.channels, self.reduction)
        s = x.mean(axis=(1, 2, 3), keepdims=True)
        s = nn.Conv(bottleneck, (1, 1, 1), dtype=x.dtype,
                    kernel_init=nn.initializers.variance_scaling(
                        2.0, "fan_out", "normal"), name="fc1")(s)
        s = jax.nn.relu(s)
        s = nn.Conv(self.channels, (1, 1, 1), dtype=x.dtype,
                    kernel_init=nn.initializers.variance_scaling(
                        2.0, "fan_out", "normal"), name="fc2")(s)
        return x * jax.nn.sigmoid(s)


class BlockX3D(nn.Module):
    """X3D inverted-bottleneck block (reference cnns/x3d.py:46-157):
    1x1x1 expand -> depthwise 3x3x3 -> (SE) -> swish -> 1x1x1 project."""
    planes: int
    outplanes: int
    spatial_stride: int = 1
    downsample: bool = False
    se_ratio: Optional[float] = None
    use_swish: bool = True

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        s = self.spatial_stride
        out = ConvBN3d(self.planes, (1, 1, 1), name="conv1")(x, train=train)
        out = ConvBN3d(self.planes, (3, 3, 3), (1, s, s), act=False,
                       groups=self.planes, name="conv2")(out, train=train)
        if self.se_ratio is not None:
            out = SEModule3d(self.planes, self.se_ratio,
                             name="se_module")(out)
        if self.use_swish:
            out = out * jax.nn.sigmoid(out)
        out = ConvBN3d(self.outplanes, (1, 1, 1), act=False, zero_gamma=True,
                       name="conv3")(out, train=train)
        if self.downsample:
            identity = ConvBN3d(self.outplanes, (1, 1, 1), (1, s, s),
                                act=False, name="downsample")(x, train=train)
        else:
            identity = x
        return jax.nn.relu(out + identity)


class X3D(nn.Module):
    """X3D backbone (reference cnns/x3d.py:161-503), input (N, T, H, W, C).

    Channel/depth scaling via gamma_w/gamma_b/gamma_d; depthwise temporal stem;
    SE in half (or all) blocks; swish pre-projection.
    """
    gamma_w: float = 1.0
    gamma_b: float = 2.25
    gamma_d: float = 2.2
    in_channels: int = 3
    base_channels: int = 24
    num_stages: int = 4
    stage_blocks: Tuple[int, ...] = (1, 2, 5, 3)
    spatial_strides: Tuple[int, ...] = (2, 2, 2, 2)
    se_style: str = "half"
    se_ratio: Optional[float] = 1 / 16
    use_swish: bool = True

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        assert self.se_style in ("all", "half")
        base = _round_width(self.base_channels, self.gamma_w)
        blocks = [_round_repeats(b, self.gamma_d)
                  for b in self.stage_blocks][: self.num_stages]

        # stem (x3d.py:416-439): spatial conv (no BN/act) + depthwise temporal
        x = ConvBN3d(base, (1, 3, 3), (1, 2, 2), act=False, with_bn=False,
                     name="conv1_s")(x, train=train)
        x = ConvBN3d(base, (5, 1, 1), groups=base, name="conv1_t")(
            x, train=train)

        layer_inplanes = base
        for i, nblocks in enumerate(blocks):
            inplanes = base * 2 ** i
            planes = int(inplanes * self.gamma_b)
            stride = self.spatial_strides[i]
            for b in range(nblocks):
                use_se = (self.se_style == "all") or (b % 2 == 0)
                x = BlockX3D(
                    planes, inplanes,
                    spatial_stride=stride if b == 0 else 1,
                    downsample=(b == 0 and (stride != 1
                                            or layer_inplanes != inplanes)),
                    se_ratio=self.se_ratio if use_se else None,
                    use_swish=self.use_swish,
                    name=f"layer{i + 1}_{b}")(x, train=train)
                layer_inplanes = inplanes

        feat_dim = base * 2 ** (len(blocks) - 1)
        return ConvBN3d(int(feat_dim * self.gamma_b), (1, 1, 1),
                        name="conv5")(x, train=train)


class ConvBN2d(nn.Module):
    """Conv2d (no bias) + BN + ReLU (PoTion ConvModule)."""
    features: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        pad = tuple(((k - 1) // 2, (k - 1) // 2) for k in self.kernel)
        y = nn.Conv(self.features, self.kernel, strides=self.stride,
                    padding=pad, use_bias=False, dtype=x.dtype,
                    kernel_init=nn.initializers.variance_scaling(
                        2.0, "fan_out", "normal"), name="conv")(x)
        y = TorchBN(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(y.astype(jnp.float32))
        return jax.nn.relu(y.astype(x.dtype))


class PoTion(nn.Module):
    """PoTion 2D-CNN backbone over pose-motion images
    (reference cnns/potion.py:7-80), input (N, H, W, C)."""
    in_channels: int = 17
    channels: Tuple[int, ...] = (128, 256, 512)
    num_layers: Tuple[int, ...] = (2, 2, 2)
    lw_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        assert len(self.channels) == len(self.num_layers)
        for i, (ch, nl) in enumerate(zip(self.channels, self.num_layers)):
            for j in range(nl):
                x = ConvBN2d(ch, (3, 3), stride=2 if j == 0 else 1,
                             name=f"layer{i + 1}_{j}")(x, train=train)
                if self.lw_dropout > 0:
                    x = nn.Dropout(self.lw_dropout,
                                   deterministic=not train)(x)
        return x


def _torch_nearest_resize_t(x: Array, out_t: int) -> Array:
    """torch F.interpolate(mode='nearest') on the T axis of (N, T, H, W, C):
    src index = floor(dst * in/out) — exact parity with the reference's
    slow/fast frame resampling (resnet3d_slowfast.py:300-306)."""
    in_t = x.shape[1]
    idx = np.floor(np.arange(out_t) * (in_t / out_t)).astype(np.int32)
    return jnp.take(x, jnp.asarray(idx), axis=1)


class _PathwayStem(nn.Module):
    """Pathway stem: conv1 + maxpool (resnet3d.py:526-543)."""
    base_channels: int
    conv1_kernel: Tuple[int, int, int]
    conv1_stride: Tuple[int, int]
    pool1_stride: Tuple[int, int]

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        cs_t, cs_s = self.conv1_stride
        x = ConvBN3d(self.base_channels, _triple(self.conv1_kernel),
                     (cs_t, cs_s, cs_s), name="conv1")(x, train=train)
        ps_t, ps_s = self.pool1_stride
        return nn.max_pool(x, (1, 3, 3), strides=(ps_t, ps_s, ps_s),
                           padding=((0, 0), (1, 1), (1, 1)))


class _ResStage(nn.Module):
    """One ResNet3d stage; downsample inferred from the (possibly
    lateral-widened) input channels."""
    kind: str
    planes: int
    blocks: int
    stride: Tuple[int, int]
    inflate: Tuple[int, ...]
    inflate_style: str = "3x1x1"

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        expansion = 4 if self.kind == "bottleneck" else 1
        for b in range(self.blocks):
            stride = self.stride if b == 0 else (1, 1)
            need_down = b == 0 and (stride[1] != 1
                                    or x.shape[-1] != self.planes * expansion)
            if self.kind == "bottleneck":
                x = Bottleneck3d(self.planes, stride,
                                 inflate=bool(self.inflate[b]),
                                 inflate_style=self.inflate_style,
                                 downsample=need_down,
                                 name=f"block{b}")(x, train=train)
            else:
                x = BasicBlock3d(self.planes, stride,
                                 inflate=bool(self.inflate[b]),
                                 downsample=need_down,
                                 name=f"block{b}")(x, train=train)
        return x


class _LateralConv(nn.Module):
    """Cross-pathway fusion conv (resnet3d_slowfast.py:40-72).  Output width
    is 2x the source pathway's channels (divided by ``infl`` for the inverse
    rgb->pose direction); ``inv=True`` upsamples time via transposed conv."""
    speed_ratio: int
    fusion_kernel: int = 7
    inv: bool = False
    infl: int = 1

    @nn.compact
    def __call__(self, x: Array) -> Array:
        out_ch = x.shape[-1] * 2 // self.infl if self.inv else x.shape[-1] * 2
        k = (self.fusion_kernel, 1, 1)
        init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        if self.inv:
            return nn.ConvTranspose(
                out_ch, k, strides=(self.speed_ratio, 1, 1), padding="SAME",
                use_bias=False, dtype=x.dtype, kernel_init=init,
                name="conv")(x)
        pad = ((self.fusion_kernel - 1) // 2,) * 2
        return nn.Conv(out_ch, k, strides=(self.speed_ratio, 1, 1),
                       padding=(pad, (0, 0), (0, 0)), use_bias=False,
                       dtype=x.dtype, kernel_init=init, name="conv")(x)


class ResNet3dPathway(nn.Module):
    """One SlowFast/RGBPose pathway (reference cnns/resnet3d_slowfast.py:15-94).

    A ResNet3d trunk whose stages are independently callable so the parent can
    interleave cross-pathway lateral fusion.  ``lateral_inv=True`` makes the
    lateral convs transposed in time (upsampling; the RGBPose pose->rgb
    direction, reference cnns/rgbposeconv3d.py:41-56 — NOTE the reference
    constructor crashes as committed, see RGBPoseConv3D docstring).
    """
    depth: int = 50
    in_channels: int = 3
    base_channels: int = 64
    num_stages: int = 4
    stage_blocks: Optional[Tuple[int, ...]] = None
    spatial_strides: Tuple[int, ...] = (1, 2, 2, 2)
    temporal_strides: Tuple[int, ...] = (1, 1, 1, 1)
    conv1_kernel: Tuple[int, int, int] = (1, 7, 7)
    conv1_stride: Tuple[int, int] = (1, 2)
    pool1_stride: Tuple[int, int] = (1, 2)
    inflate: Tuple[int, ...] = (0, 0, 1, 1)
    inflate_style: str = "3x1x1"
    lateral: bool = False
    lateral_inv: bool = False
    lateral_infl: int = 1
    lateral_activate: Optional[Tuple[int, ...]] = None
    speed_ratio: int = 8
    channel_ratio: int = 8
    fusion_kernel: int = 7

    def _blocks(self):
        kind, default_blocks = ARCH_SETTINGS[self.depth]
        return kind, (self.stage_blocks or default_blocks)[: self.num_stages]

    def setup(self):
        kind, blocks = self._blocks()
        self.stem_m = _PathwayStem(self.base_channels, self.conv1_kernel,
                                   self.conv1_stride, self.pool1_stride,
                                   name="stem")
        stages = []
        for i, nblocks in enumerate(blocks):
            stage_inflate = self.inflate[i] if i < len(self.inflate) else 1
            infl = (stage_inflate,) * nblocks \
                if isinstance(stage_inflate, int) else tuple(stage_inflate)
            stages.append(_ResStage(
                kind, self.base_channels * 2 ** i, nblocks,
                (self.temporal_strides[i], self.spatial_strides[i]),
                infl, self.inflate_style, name=f"layer{i + 1}"))
        self.stages = stages
        if self.lateral:
            lats = {}
            for i in range(self.num_stages):
                active = bool(self.lateral_activate[i]) \
                    if self.lateral_activate is not None else True
                if active:
                    name = "conv1_lateral" if i == 0 else f"layer{i}_lateral"
                    lats[i] = _LateralConv(self.speed_ratio,
                                           self.fusion_kernel,
                                           inv=self.lateral_inv,
                                           infl=self.lateral_infl, name=name)
            self.lateral_convs = lats

    def stem(self, x: Array, *, train: bool) -> Array:
        return self.stem_m(x, train=train)

    def lateral_conv(self, i: int, x: Array, *, train: bool) -> Array:
        """Lateral fusion conv feeding stage i (0 = stem level)."""
        del train
        return self.lateral_convs[i](x)

    def stage(self, i: int, x: Array, *, train: bool) -> Array:
        return self.stages[i](x, train=train)

    def __call__(self, x: Array, *, train: bool) -> Array:
        x = self.stem(x, train=train)
        for i in range(len(self.stages)):
            x = self.stage(i, x, train=train)
        return x


class ResNet3dSlowFast(nn.Module):
    """SlowFast backbone (reference cnns/resnet3d_slowfast.py:220-328).

    Input (N, T, H, W, C); slow path sees T/resample_rate frames, fast path
    T/(resample_rate/speed_ratio); fast->slow lateral convs after the stem and
    every non-final stage.  Returns (x_slow, x_fast).
    """
    resample_rate: int = 8
    speed_ratio: int = 8
    channel_ratio: int = 8
    slow_depth: int = 50
    fast_depth: int = 50
    fast_base_channels: int = 8

    def setup(self):
        self.slow_path = ResNet3dPathway(
            depth=self.slow_depth, lateral=True,
            conv1_kernel=(1, 7, 7), inflate=(0, 0, 1, 1),
            speed_ratio=self.speed_ratio, channel_ratio=self.channel_ratio,
            name="slow_path")
        self.fast_path = ResNet3dPathway(
            depth=self.fast_depth, lateral=False,
            base_channels=self.fast_base_channels, conv1_kernel=(5, 7, 7),
            inflate=(1, 1, 1, 1), name="fast_path")

    def __call__(self, x: Array, *, train: bool):
        t = x.shape[1]
        x_slow = _torch_nearest_resize_t(x, t // self.resample_rate)
        x_fast = _torch_nearest_resize_t(
            x, t // (self.resample_rate // self.speed_ratio))

        x_slow = self.slow_path.stem(x_slow, train=train)
        x_fast = self.fast_path.stem(x_fast, train=train)
        x_slow = jnp.concatenate(
            [x_slow, self.slow_path.lateral_conv(0, x_fast, train=train)],
            axis=-1)

        n_stages = len(self.slow_path._blocks()[1])
        for i in range(n_stages):
            x_slow = self.slow_path.stage(i, x_slow, train=train)
            x_fast = self.fast_path.stage(i, x_fast, train=train)
            if i != n_stages - 1:
                lat = self.slow_path.lateral_conv(i + 1, x_fast, train=train)
                x_slow = jnp.concatenate([x_slow, lat], axis=-1)
        return x_slow, x_fast


class RGBPoseConv3D(nn.Module):
    """Two-stream RGB + pose-heatmap backbone with bidirectional laterals
    (reference cnns/rgbposeconv3d.py:13-179).

    NOTE: the reference module is unconstructible as committed — its pathway
    configs pass lateral_inv/lateral_infl/lateral_activate kwargs that
    resnet3d_slowfast.ResNet3dPathway forwards to ResNet3d.__init__, which
    accepts none of them (TypeError; resnet3d.py:240-262).  This is the
    working TPU realisation of the documented forward contract
    (rgbposeconv3d.py:101-170): rgb laterals receive pose features
    (time-strided convs), pose laterals receive rgb features (transposed
    time-upsampling convs); exchange happens after (rgb layer2, pose layer1)
    and (rgb layer3, pose layer2).
    """
    speed_ratio: int = 4
    channel_ratio: int = 4
    rgb_detach: bool = False
    pose_detach: bool = False
    rgb_drop_path: float = 0.0
    pose_drop_path: float = 0.0

    def setup(self):
        self.rgb_path = ResNet3dPathway(
            depth=50, num_stages=4, base_channels=64,
            conv1_kernel=(1, 7, 7), inflate=(0, 0, 1, 1),
            lateral=True, lateral_infl=1, lateral_activate=(0, 0, 1, 1),
            speed_ratio=self.speed_ratio, channel_ratio=self.channel_ratio,
            fusion_kernel=7, name="rgb_path")
        self.pose_path = ResNet3dPathway(
            depth=50, num_stages=3, stage_blocks=(4, 6, 3), base_channels=32,
            conv1_kernel=(1, 7, 7), conv1_stride=(1, 1), pool1_stride=(1, 1),
            inflate=(0, 1, 1), spatial_strides=(2, 2, 2),
            temporal_strides=(1, 1, 1),
            lateral=True, lateral_inv=True, lateral_infl=16,
            lateral_activate=(0, 1, 1),
            speed_ratio=self.speed_ratio, channel_ratio=self.channel_ratio,
            fusion_kernel=7, name="pose_path")

    def _drop(self, lat, p, train):
        """Whole-lateral drop-path (rgbposeconv3d.py:112-116)."""
        if p <= 0 or not train:
            return lat
        keep = jax.random.uniform(self.make_rng("dropout"), ()) >= p
        return lat * keep.astype(lat.dtype)

    def __call__(self, imgs: Array, heatmap_imgs: Array, *, train: bool):
        sg = jax.lax.stop_gradient
        x_rgb = self.rgb_path.stem(imgs, train=train)
        x_pose = self.pose_path.stem(heatmap_imgs, train=train)

        x_rgb = self.rgb_path.stage(0, x_rgb, train=train)
        x_rgb = self.rgb_path.stage(1, x_rgb, train=train)
        x_pose = self.pose_path.stage(0, x_pose, train=train)

        # bidirectional exchange #1 (rgbposeconv3d.py:128-144)
        feat_p = sg(x_pose) if self.rgb_detach else x_pose
        lat_p = self._drop(self.rgb_path.lateral_conv(2, feat_p, train=train),
                           self.rgb_drop_path, train)
        feat_r = sg(x_rgb) if self.pose_detach else x_rgb
        lat_r = self._drop(self.pose_path.lateral_conv(1, feat_r, train=train),
                           self.pose_drop_path, train)
        x_rgb = jnp.concatenate([x_rgb, lat_p], axis=-1)
        x_pose = jnp.concatenate([x_pose, lat_r], axis=-1)

        x_rgb = self.rgb_path.stage(2, x_rgb, train=train)
        x_pose = self.pose_path.stage(1, x_pose, train=train)

        # bidirectional exchange #2 (rgbposeconv3d.py:149-165)
        feat_p = sg(x_pose) if self.rgb_detach else x_pose
        lat_p = self._drop(self.rgb_path.lateral_conv(3, feat_p, train=train),
                           self.rgb_drop_path, train)
        feat_r = sg(x_rgb) if self.pose_detach else x_rgb
        lat_r = self._drop(self.pose_path.lateral_conv(2, feat_r, train=train),
                           self.pose_drop_path, train)
        x_rgb = jnp.concatenate([x_rgb, lat_p], axis=-1)
        x_pose = jnp.concatenate([x_pose, lat_r], axis=-1)

        x_rgb = self.rgb_path.stage(3, x_rgb, train=train)
        x_pose = self.pose_path.stage(2, x_pose, train=train)
        return x_rgb, x_pose


class RecognizerPoseC3D(nn.Module):
    """PoseC3D: heatmap volumes (N, T, H, W, C=V) -> SlowOnly -> I3D-style head."""
    backbone: nn.Module
    num_classes: int = 60
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        feat = self.backbone(x, train=train)        # (N, T', H', W', C')
        pooled = feat.mean(axis=(1, 2, 3))
        if self.dropout > 0:
            pooled = nn.Dropout(self.dropout, deterministic=not train)(pooled)
        return nn.Dense(self.num_classes,
                        kernel_init=nn.initializers.normal(0.01),
                        bias_init=nn.initializers.zeros_init(),
                        name="fc_cls")(pooled)
