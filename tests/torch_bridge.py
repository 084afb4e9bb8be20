"""Convert reference PyTorch module weights into dsgcn_tpu flax variable pytrees.

Used only by parity tests: build the reference op with random init, copy its
weights into our op, and assert elementwise-equal outputs.
"""
import numpy as np
import jax.numpy as jnp


def t2n(t):
    return np.asarray(t.detach().cpu().numpy())


def dense_p(conv):
    """torch Conv2d 1x1 (O,I,1,1) or Linear (O,I) -> PointConv params."""
    w = t2n(conv.weight)
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    p = {"kernel": jnp.asarray(w.T)}
    if conv.bias is not None:
        p["bias"] = jnp.asarray(t2n(conv.bias))
    return p


def conv1d_p(conv):
    """torch Conv1d (O,I,k) -> flax nn.Conv over one spatial dim: kernel (k,I,O)."""
    w = t2n(conv.weight)
    p = {"kernel": jnp.asarray(np.transpose(w, (2, 1, 0)))}
    if conv.bias is not None:
        p["bias"] = jnp.asarray(t2n(conv.bias))
    return p


def tconv_p(conv):
    """torch Conv2d (O,I,kh,kw) -> TemporalConv params {conv: {kernel (kh,kw,I,O)}}."""
    w = t2n(conv.weight)
    p = {"kernel": jnp.asarray(np.transpose(w, (2, 3, 1, 0)))}
    if conv.bias is not None:
        p["bias"] = jnp.asarray(t2n(conv.bias))
    return {"conv": p}


def bn_p(bn):
    return {"bn": {"scale": jnp.asarray(t2n(bn.weight)),
                   "bias": jnp.asarray(t2n(bn.bias))}}


def bn_s(bn):
    return {"bn": {"mean": jnp.asarray(t2n(bn.running_mean)),
                   "var": jnp.asarray(t2n(bn.running_var))}}


def plain_bn_p(bn):
    """torch BatchNorm -> raw flax nn.BatchNorm params (no wrapper)."""
    return {"scale": jnp.asarray(t2n(bn.weight)), "bias": jnp.asarray(t2n(bn.bias))}


def plain_bn_s(bn):
    return {"mean": jnp.asarray(t2n(bn.running_mean)),
            "var": jnp.asarray(t2n(bn.running_var))}


def randomize_bn(bn, rng):
    """Give BN layers non-trivial affine + running stats so mapping bugs surface."""
    import torch
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rng.uniform(0.5, 1.5, bn.weight.shape[0]), dtype=torch.float32))
        bn.bias.copy_(torch.tensor(rng.uniform(-0.3, 0.3, bn.bias.shape[0]), dtype=torch.float32))
        bn.running_mean.copy_(torch.tensor(rng.uniform(-0.2, 0.2, bn.running_mean.shape[0]), dtype=torch.float32))
        bn.running_var.copy_(torch.tensor(rng.uniform(0.5, 1.5, bn.running_var.shape[0]), dtype=torch.float32))


def randomize_all_bns(module, rng):
    import torch.nn as nn
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm1d, nn.BatchNorm2d)):
            randomize_bn(m, rng)


def to_nctv(x_ntvc):
    """our (N,T,V,C) -> torch (N,C,T,V)"""
    return np.ascontiguousarray(np.transpose(x_ntvc, (0, 3, 1, 2)))


def from_nctv(y):
    return np.transpose(t2n(y), (0, 2, 3, 1))
