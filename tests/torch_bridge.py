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


# ---------------------------------------------------------------------------
# Per-op variable builders: reference module -> (params, batch_stats)
# ---------------------------------------------------------------------------

def _down_vars(ref):
    """Sequential(Conv2d, BN) 'down' residual projection."""
    return ({"down_conv": dense_p(ref[0]), "down_bn": bn_p(ref[1])},
            {"down_bn": bn_s(ref[1])})


def unit_gcn_vars(ref):
    import jax.numpy as jnp
    import torch.nn as nn
    params = {"conv": dense_p(ref.conv), "bn": bn_p(ref.bn)}
    stats = {"bn": bn_s(ref.bn)}
    if ref.with_res and isinstance(ref.down, nn.Sequential):
        p, s = _down_vars(ref.down)
        params.update(p)
        stats.update(s)
    if ref.adaptive == "init":
        params["A"] = jnp.asarray(t2n(ref.A))
    elif ref.adaptive in ("offset", "importance"):
        params["PA"] = jnp.asarray(t2n(ref.PA))
        if ref.adaptive == "offset":
            params["PA"] = params["PA"] + 1e-6
    return params, stats


def unit_tcn_vars(ref):
    params = {"conv": tconv_p(ref.conv)}
    stats = {}
    import torch.nn as nn
    if not isinstance(ref.bn, nn.Identity):
        params["bn"] = bn_p(ref.bn)
        stats["bn"] = bn_s(ref.bn)
    return params, stats


def _ms_branches_vars(ref_branches, ms_cfg):
    params, stats = {}, {}
    for i, cfg in enumerate(ms_cfg):
        br = ref_branches[i]
        if cfg == "1x1":
            params[f"branch{i}_conv"] = {"conv": tconv_p(br)["conv"]}
            continue
        params[f"branch{i}_pre"] = dense_p(br[0])
        params[f"branch{i}_bn"] = bn_p(br[1])
        stats[f"branch{i}_bn"] = bn_s(br[1])
        if cfg[0] != "max":
            params[f"branch{i}_tcn"] = {"conv": tconv_p(br[3].conv)}
    return params, stats


def mstcn_vars(ref):
    bp, bs = _ms_branches_vars(ref.branches, ref.ms_cfg)
    params = {"branches": bp, "transform_bn": bn_p(ref.transform[0]),
              "transform_conv": dense_p(ref.transform[2]), "bn": bn_p(ref.bn)}
    stats = {"branches": bs, "transform_bn": bn_s(ref.transform[0]),
             "bn": bn_s(ref.bn)}
    return params, stats


def dgmstcn_vars(ref):
    import jax.numpy as jnp
    params, stats = mstcn_vars(ref)
    params["add_coeff"] = jnp.asarray(t2n(ref.add_coeff))
    return params, stats


def ctr_mstcn_vars(ref, n_dil=2, residual=False):
    params, stats = {}, {}
    for i in range(n_dil):
        br = ref.branches[i]
        params[f"branch{i}_pre"] = dense_p(br[0])
        params[f"branch{i}_bn"] = bn_p(br[1])
        stats[f"branch{i}_bn"] = bn_s(br[1])
        params[f"branch{i}_tcn"] = {"conv": tconv_p(br[3].conv),
                                    "bn": bn_p(br[3].bn)}
        stats[f"branch{i}_tcn"] = {"bn": bn_s(br[3].bn)}
    i = n_dil
    br = ref.branches[i]
    params[f"branch{i}_pre"] = dense_p(br[0])
    params[f"branch{i}_bn"] = bn_p(br[1])
    stats[f"branch{i}_bn"] = bn_s(br[1])
    params[f"branch{i}_bn2"] = bn_p(br[4])
    stats[f"branch{i}_bn2"] = bn_s(br[4])
    i += 1
    br = ref.branches[i]
    params[f"branch{i}_conv"] = {"conv": tconv_p(br[0])["conv"]}
    params[f"branch{i}_bn"] = bn_p(br[1])
    stats[f"branch{i}_bn"] = bn_s(br[1])
    import torch.nn as _nn
    if residual and isinstance(ref.residual, _nn.Module):
        p, s = unit_tcn_vars(ref.residual)
        params["residual"] = p
        stats["residual"] = s
    return params, stats


def unit_aagcn_vars(ref):
    import jax.numpy as jnp
    import torch.nn as nn
    K = ref.num_subset
    params, stats = {}, {}
    params["bn"] = bn_p(ref.bn)
    stats["bn"] = bn_s(ref.bn)
    if isinstance(ref.down, nn.Sequential):
        p, s = _down_vars(ref.down)
        params.update(p)
        stats.update(s)
    for i in range(K):
        params[f"conv_d{i}"] = dense_p(ref.conv_d[i])
    if ref.adaptive:
        params["A"] = jnp.asarray(t2n(ref.A))
        params["alpha"] = jnp.asarray(t2n(ref.alpha))
        for i in range(K):
            params[f"conv_a{i}"] = dense_p(ref.conv_a[i])
            params[f"conv_b{i}"] = dense_p(ref.conv_b[i])
    if ref.attention:
        params["att"] = {"conv_sa": conv1d_p(ref.conv_sa),
                         "conv_ta": conv1d_p(ref.conv_ta),
                         "fc1c": dense_p(ref.fc1c),
                         "fc2c": dense_p(ref.fc2c)}
    return params, stats


def unit_ctrgcn_vars(ref):
    import jax.numpy as jnp
    import torch.nn as nn
    params = {"A": jnp.asarray(t2n(ref.A)), "alpha": jnp.asarray(t2n(ref.alpha)),
              "bn": bn_p(ref.bn)}
    stats = {"bn": bn_s(ref.bn)}
    if isinstance(ref.down, nn.Sequential):
        p, s = _down_vars(ref.down)
        params.update(p)
        stats.update(s)
    for i in range(ref.num_subset):
        params[f"convs{i}"] = {f"conv{j}": dense_p(getattr(ref.convs[i], f"conv{j}"))
                               for j in (1, 2, 3, 4)}
    return params, stats


def dggcn_vars(ref):
    import jax.numpy as jnp
    import torch.nn as nn
    params = {"A": jnp.asarray(t2n(ref.A)),
              "alpha": jnp.asarray(t2n(ref.alpha)),
              "beta": jnp.asarray(t2n(ref.beta)),
              "pre_conv": dense_p(ref.pre[0]), "pre_bn": bn_p(ref.pre[1]),
              "post_conv": dense_p(ref.post), "bn": bn_p(ref.bn)}
    stats = {"pre_bn": bn_s(ref.pre[1]), "bn": bn_s(ref.bn)}
    if isinstance(ref.down, nn.Sequential):
        p, s = _down_vars(ref.down)
        params.update(p)
        stats.update(s)
    if hasattr(ref, "conv1"):
        params["conv1"] = dense_p(ref.conv1)
        params["conv2"] = dense_p(ref.conv2)
    return params, stats


def dgphgcn1_vars(ref):
    params, stats = dggcn_vars(ref)
    if hasattr(ref, "conv1_se"):
        params["conv1_se"] = dense_p(ref.conv1_se)
    if hasattr(ref, "nodeconv"):
        params["nodeconv_conv"] = dense_p(ref.nodeconv[0])
        params["nodeconv_bn"] = bn_p(ref.nodeconv[1])
        stats["nodeconv_bn"] = bn_s(ref.nodeconv[1])
    if hasattr(ref, "edge_linears"):
        params["edge_linears"] = dense_p(ref.edge_linears)
    if hasattr(ref, "ada_linears"):
        params["ada_linears"] = dense_p(ref.ada_linears)
    return params, stats


def to_nctv(x_ntvc):
    """our (N,T,V,C) -> torch (N,C,T,V)"""
    return np.ascontiguousarray(np.transpose(x_ntvc, (0, 3, 1, 2)))


def from_nctv(y):
    return np.transpose(t2n(y), (0, 2, 3, 1))


def conv3d_p(conv):
    """torch Conv3d (O,I,kt,kh,kw) -> flax NDHWC kernel (kt,kh,kw,I,O)."""
    p = {"kernel": jnp.asarray(np.transpose(t2n(conv.weight), (2, 3, 4, 1, 0)))}
    if conv.bias is not None:
        p["bias"] = jnp.asarray(t2n(conv.bias))
    return p


def conv2d_p(conv):
    """torch Conv2d (O,I,kh,kw) -> flax NHWC kernel (kh,kw,I,O)."""
    p = {"kernel": jnp.asarray(np.transpose(t2n(conv.weight), (2, 3, 1, 0)))}
    if conv.bias is not None:
        p["bias"] = jnp.asarray(t2n(conv.bias))
    return p


def convbn3d_vars(cm):
    """mmcv-style ConvModule (conv+bn) -> our ConvBN3d params/stats."""
    params = {"conv": conv3d_p(cm.conv)}
    stats = {}
    if getattr(cm, "with_norm", False):
        params["bn"] = plain_bn_p(cm.bn)
        stats["bn"] = plain_bn_s(cm.bn)
    return params, stats


def convbn2d_vars(cm):
    params = {"conv": conv2d_p(cm.conv)}
    stats = {}
    if getattr(cm, "with_norm", False):
        params["bn"] = plain_bn_p(cm.bn)
        stats["bn"] = plain_bn_s(cm.bn)
    return params, stats
