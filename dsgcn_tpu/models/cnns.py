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

from ..ops.common import Array


def _triple(x):
    return x if isinstance(x, (tuple, list)) else (x, x, x)


class ConvBN3d(nn.Module):
    """Conv3d (no bias) + BN (+ optional ReLU), torch ConvModule equivalent."""
    features: int
    kernel: Tuple[int, int, int]
    stride: Tuple[int, int, int] = (1, 1, 1)
    act: bool = True

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        pad = tuple(((k - 1) // 2, (k - 1) // 2) for k in self.kernel)
        y = nn.Conv(self.features, kernel_size=self.kernel,
                    strides=self.stride, padding=pad, use_bias=False,
                    dtype=x.dtype,
                    kernel_init=nn.initializers.variance_scaling(
                        2.0, "fan_out", "normal"),
                    name="conv")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, name="bn")(y.astype(jnp.float32))
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
