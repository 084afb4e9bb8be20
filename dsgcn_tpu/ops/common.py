"""Shared building blocks for the GCN/TCN op library.

Layout convention (TPU-first): activations are channels-last ``(N, T, V, C)``
— time and joints as spatial dims, channels on the 128-lane axis so every 1x1
"conv" is a plain Dense matmul on the MXU and temporal convs run as NHWC convs.
The PyTorch reference uses NCHW=(N, C, T, V) (pyskl/models/gcns/utils/gcn.py);
all ops here are numerically equivalent after transposition.

Initializers reproduce the reference init rules (gcns/utils/init_func.py:6-22
and torch defaults) so training dynamics match.
"""
from __future__ import annotations

import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Array = jax.Array


def accum_dtype(dtype):
    """Matmul accumulation dtype: at least f32 (bf16 inputs accumulate in
    f32 on the MXU); f64 inputs keep f64 (for float64 parity testing)."""
    return jnp.promote_types(dtype, jnp.float32)


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def _fan_in_out(shape: Sequence[int]) -> Tuple[int, int]:
    """Fan computation for Dense (I, O) or conv (kh, kw, I, O) kernels."""
    if len(shape) == 2:
        return shape[0], shape[1]
    receptive = int(np.prod(shape[:-2]))
    return shape[-2] * receptive, shape[-1] * receptive


def kaiming_normal_fan_out() -> Callable:
    """conv_init: kaiming normal, mode=fan_out (reference init_func.py:15-17)."""
    def init(key, shape, dtype=jnp.float32):
        _, fan_out = _fan_in_out(shape)
        std = math.sqrt(2.0 / fan_out)
        return jax.random.normal(key, shape, dtype) * std
    return init


def branch_init(branches: int) -> Callable:
    """conv_branch_init: normal(0, sqrt(2/(n*k1*k2*branches))) where n=out_ch,
    k1=in_ch, k2=kernel (reference init_func.py:6-12, torch weight (O, I, kh, kw)
    uses sizes 0,1,2)."""
    def init(key, shape, dtype=jnp.float32):
        if len(shape) == 2:  # Dense (I, O): n=O, k1=I, k2=1
            n, k1, k2 = shape[1], shape[0], 1
        else:  # conv (kh, kw, I, O): n=O, k1=I, k2=kh
            n, k1, k2 = shape[-1], shape[-2], shape[0]
        std = math.sqrt(2.0 / (n * k1 * k2 * branches))
        return jax.random.normal(key, shape, dtype) * std
    return init


def torch_default_kernel() -> Callable:
    """torch nn.Conv2d/Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in))."""
    def init(key, shape, dtype=jnp.float32):
        fan_in, _ = _fan_in_out(shape)
        bound = math.sqrt(1.0 / fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_default_bias(fan_in: int) -> Callable:
    def init(key, shape, dtype=jnp.float32):
        bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def zeros_init():
    return nn.initializers.zeros_init()


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

class PointConv(nn.Module):
    """1x1 conv == Dense over the trailing channel axis (runs on the MXU).

    Equivalent to the reference's ``nn.Conv2d(in, out, 1)``; kernel shape (I, O).
    """
    features: int
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        in_features = x.shape[-1]
        kinit = self.kernel_init or torch_default_kernel()
        binit = self.bias_init or torch_default_bias(in_features)
        kernel = self.param("kernel", kinit, (in_features, self.features))
        # mixed precision: compute in the activation dtype (bf16 matmuls on
        # the MXU when the model runs bf16), params stay fp32
        y = jnp.einsum("...i,io->...o", x, kernel.astype(x.dtype),
                       preferred_element_type=accum_dtype(x.dtype)).astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(x.dtype)
        return y


class TemporalConv(nn.Module):
    """k x 1 temporal convolution over (T, V) spatial dims, channels-last.

    Matches reference ``nn.Conv2d(..., kernel_size=(k, 1), stride=(s, 1),
    dilation=(d, 1), padding=(pad, 0))`` with pad = (k + (k-1)(d-1) - 1) // 2
    (tcn.py:19-27).
    """
    features: int
    kernel_size: int = 9
    stride: int = 1
    dilation: int = 1
    use_bias: bool = True
    kernel_init: Optional[Callable] = None
    bias_init: Optional[Callable] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        k, d = self.kernel_size, self.dilation
        pad = (k + (k - 1) * (d - 1) - 1) // 2
        in_features = x.shape[-1]
        kinit = self.kernel_init or torch_default_kernel()
        binit = self.bias_init or torch_default_bias(in_features * k)
        y = nn.Conv(
            features=self.features,
            kernel_size=(k, 1),
            strides=(self.stride, 1),
            kernel_dilation=(d, 1),
            padding=((pad, pad), (0, 0)),
            use_bias=self.use_bias,
            kernel_init=kinit,
            bias_init=binit,
            dtype=x.dtype,           # mixed precision: compute in act dtype
            name="conv",
        )(x)
        return y


class BatchNorm(nn.Module):
    """BatchNorm over all leading axes, per-channel (== torch BatchNorm2d on NCTV).

    torch defaults: eps=1e-5, momentum=0.1 (i.e. running = 0.9*running + 0.1*new).

    ``axis_name``: sync batch statistics across a mesh axis (joint-partition
    sharding — the statistics must match the unsharded model exactly).
    ``weight``: optional per-location weight broadcastable to x's non-channel
    dims (trailing 1); used by graph-sharded dgmstcn where the appended
    global joint is replicated on every shard and must count once.
    """
    use_running_average: Optional[bool] = None
    scale_init: Callable = nn.initializers.ones_init()
    bias_init: Callable = nn.initializers.zeros_init()
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, use_running_average: Optional[bool] = None,
                 weight: Optional[Array] = None) -> Array:
        ura = nn.merge_param("use_running_average", self.use_running_average,
                             use_running_average)
        # Same variable layout/semantics as delegating to flax nn.BatchNorm on
        # an accum-dtype input (stats math in >= fp32, flax reduction order,
        # biased variance, momentum meaning keep=0.9), but the eval path folds
        # the normalization into one per-channel affine applied in the
        # ACTIVATION dtype: in bf16 inference this avoids two full-tensor
        # f32 materializations per BN (HBM-bandwidth bound on TPU).
        feat = x.shape[-1]
        acc = accum_dtype(x.dtype)
        scope = self.scope.push("bn")
        scale = scope.param("scale", self.scale_init, (feat,))
        bias = scope.param("bias", self.bias_init, (feat,))
        ra_mean = scope.variable("batch_stats", "mean",
                                 lambda: jnp.zeros(feat, jnp.float32))
        ra_var = scope.variable("batch_stats", "var",
                                lambda: jnp.ones(feat, jnp.float32))
        eps = 1e-5
        if ura:
            a = jax.lax.rsqrt(ra_var.value.astype(acc) + eps) \
                * scale.astype(acc)
            b = bias.astype(acc) - ra_mean.value.astype(acc) * a
            return x * a.astype(x.dtype) + b.astype(x.dtype)
        xm = x.astype(acc)
        axes = tuple(range(x.ndim - 1))
        if weight is None and self.axis_name is None:
            mean = jnp.mean(xm, axes)
            mean2 = jnp.mean(jax.lax.square(xm), axes)
            var = mean2 - jax.lax.square(mean)
            bessel_n = float(int(np.prod([x.shape[a] for a in axes])))
        else:
            w = (jnp.ones(x.shape[:-1] + (1,), acc) if weight is None
                 else jnp.broadcast_to(weight.astype(acc),
                                       x.shape[:-1] + (1,)))
            s1 = jnp.sum(xm * w, axes)
            s2 = jnp.sum(jax.lax.square(xm) * w, axes)
            cnt = jnp.sum(w)
            if self.axis_name is not None and not self.is_initializing():
                s1 = jax.lax.psum(s1, self.axis_name)
                s2 = jax.lax.psum(s2, self.axis_name)
                cnt = jax.lax.psum(cnt, self.axis_name)
            mean = s1 / cnt
            var = s2 / cnt - jax.lax.square(mean)
            bessel_n = cnt
        if not self.is_initializing():
            # torch updates the running var with the UNBIASED batch variance
            # (Bessel n/(n-1)) while normalizing with the biased one
            bessel = bessel_n / jnp.maximum(bessel_n - 1, 1)
            ra_mean.value = 0.9 * ra_mean.value + 0.1 * mean
            ra_var.value = 0.9 * ra_var.value + 0.1 * (var * bessel)
        mul = jax.lax.rsqrt(var + eps) * scale.astype(acc)
        y = (xm - mean) * mul + bias.astype(acc)
        return y.astype(x.dtype)


class TorchBN(nn.BatchNorm):
    """flax BatchNorm with the torch running-var semantics: the running var
    is updated with the UNBIASED (Bessel n/(n-1)) batch variance while the
    normalization itself uses the biased one (torch BatchNorm1d/2d/3d).
    Identical variable layout to flax nn.BatchNorm (drop-in, checkpoint
    compatible)."""

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None, *,
                 mask=None):
        from flax.linen import normalization as fnorm

        use_running_average = nn.merge_param(
            "use_running_average", self.use_running_average,
            use_running_average)
        feature_axes = fnorm._canonicalize_axes(x.ndim, self.axis)
        reduction_axes = tuple(i for i in range(x.ndim)
                               if i not in feature_axes)
        feature_shape = [x.shape[ax] for ax in feature_axes]
        stat_dtype = (jnp.float32 if self.force_float32_reductions
                      else self.param_dtype)
        ra_mean = self.variable("batch_stats", "mean",
                                lambda s: jnp.zeros(s, stat_dtype),
                                feature_shape)
        ra_var = self.variable("batch_stats", "var",
                               lambda s: jnp.ones(s, stat_dtype),
                               feature_shape)
        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
            if not self.force_float32_reductions:
                mean = jnp.asarray(mean, self.param_dtype)
                var = jnp.asarray(var, self.param_dtype)
        else:
            mean, var = fnorm._compute_stats(
                x, reduction_axes, dtype=self.dtype,
                axis_name=(self.axis_name if not self.is_initializing()
                           else None),
                axis_index_groups=self.axis_index_groups,
                use_fast_variance=self.use_fast_variance, mask=mask,
                force_float32_reductions=self.force_float32_reductions)
            if not self.is_initializing():
                n = int(np.prod([x.shape[a] for a in reduction_axes]))
                bessel = n / max(n - 1, 1)
                ra_mean.value = (self.momentum * ra_mean.value
                                 + (1 - self.momentum) * mean)
                ra_var.value = (self.momentum * ra_var.value
                                + (1 - self.momentum) * (var * bessel))
        return fnorm._normalize(
            self, x, mean, var, reduction_axes, feature_axes, self.dtype,
            self.param_dtype, self.epsilon, self.use_bias, self.use_scale,
            self.bias_init, self.scale_init, self.force_float32_reductions)


def bn_scale_init(scale: float) -> Callable:
    """bn_init(bn, scale): constant-scale BN weight (reference init_func.py:20-22).

    scale=1e-6 on a block's final BN makes each block start near-identity."""
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, scale, dtype)
    return init


def max_pool_t(x: Array, window: int, stride: int, padding: int) -> Array:
    """Temporal max-pool (window,1)/(stride,1) with -inf padding, as torch MaxPool2d."""
    return nn.max_pool(
        x, window_shape=(window, 1), strides=(stride, 1),
        padding=((padding, padding), (0, 0)))
