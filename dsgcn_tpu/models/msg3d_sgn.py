"""MS-G3D and SGN backbones (reference msg3d.py:11-79, sgn.py:10-102)."""
from __future__ import annotations



import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..graph import Graph, GraphConfig
from ..ops.common import Array, BatchNorm, PointConv, TorchBN
from ..ops.msg3d import MLP, MSGCN, MWMSG3DBlock
from ..ops.tcn import CTRMSTCN
from .backbones import DataBN


class MSG3D(nn.Module):
    """MS-G3D: three STGC stages of (parallel MS-GCN pathway + windowed G3D
    pathway) followed by an MS-TCN (reference msg3d.py:30-76)."""
    graph_cfg: GraphConfig = GraphConfig(layout="nturgb+d", mode="binary_adj")
    in_channels: int = 3
    base_channels: int = 96
    num_gcn_scales: int = 13
    num_g3d_scales: int = 6
    num_person: int = 2
    tcn_dropout: float = 0.0

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        n, m, t, v, c = x.shape
        graph = Graph.from_config(self.graph_cfg)
        A_bin = graph.A[0].astype(np.float32)   # 2D binary adjacency

        x = DataBN("MVC", name="data_bn")(x, train=train)
        x = x.reshape(n * m, t, v, c)

        c1 = self.base_channels
        c2, c3 = c1 * 2, c1 * 4
        stages = [
            (self.in_channels, c1, c1, 1),
            (c1, c1, c2, 2),
            (c2, c2, c3, 2),
        ]
        for i, (cin, cmid, cout, stride) in enumerate(stages, start=1):
            g3d = MWMSG3DBlock(cin, cout, A_bin, self.num_g3d_scales,
                               window_stride=stride,
                               name=f"gcn3d{i}")(x, train=train)
            s = MSGCN(self.num_gcn_scales, cmid, A_bin,
                      name=f"sgcn{i}_gcn")(x, train=train)
            s = CTRMSTCN(cout, stride=stride,
                         name=f"sgcn{i}_tcn1")(s, train=train)
            # final pathway MSTCN has act disabled (msg3d.py:38)
            s = _no_act_mstcn(cout, f"sgcn{i}_tcn2")(s, train=train)
            x = jax.nn.relu(s + g3d)
            x = CTRMSTCN(cout, tcn_dropout=self.tcn_dropout,
                         name=f"tcn{i}")(x, train=train)
        return x.reshape((n, m) + x.shape[1:])


def _no_act_mstcn(out_channels: int, name: str):
    """CTR-MSTCN with the trailing activation removed (msg3d.py:38:
    ``self.sgcn1[-1].act = nn.Identity()``)."""
    return _NoActInner(out_channels, name=name)


class _NoActInner(nn.Module):
    out_channels: int

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        from ..ops.tcn import UnitTCN, _MSBranches  # reuse branch structure
        # replicate CTRMSTCN branches without the trailing ReLU
        import jax.numpy as jnp
        from ..ops.common import BatchNorm, PointConv, max_pool_t, \
            kaiming_normal_fan_out
        in_c = x.shape[-1]
        dilations = (1, 2, 3, 4)
        num_branches = len(dilations) + 2
        branch_c = self.out_channels // num_branches
        branch_rem = self.out_channels - branch_c * (num_branches - 1)
        outs = []
        for i, d in enumerate(dilations):
            b = PointConv(branch_c, name=f"branch{i}_pre",
                          kernel_init=kaiming_normal_fan_out())(x)
            b = BatchNorm(name=f"branch{i}_bn")(b, use_running_average=not train)
            b = jax.nn.relu(b)
            b = UnitTCN(branch_c, kernel_size=3, stride=1, dilation=d,
                        name=f"branch{i}_tcn")(b, train=train)
            outs.append(b)
        i = len(dilations)
        b = PointConv(branch_c, name=f"branch{i}_pre",
                      kernel_init=kaiming_normal_fan_out())(x)
        b = BatchNorm(name=f"branch{i}_bn")(b, use_running_average=not train)
        b = jax.nn.relu(b)
        b = max_pool_t(b, window=3, stride=1, padding=1)
        b = BatchNorm(name=f"branch{i}_bn2")(b, use_running_average=not train)
        outs.append(b)
        i += 1
        from ..ops.common import TemporalConv
        b = TemporalConv(branch_rem, kernel_size=1, stride=1,
                         name=f"branch{i}_conv",
                         kernel_init=kaiming_normal_fan_out())(x)
        b = BatchNorm(name=f"branch{i}_bn")(b, use_running_average=not train)
        outs.append(b)
        out = jnp.concatenate(outs, axis=-1)
        # residual=True in-range (in==out, stride 1) per reference Sequential
        if in_c == self.out_channels:
            out = out + x
        return out  # no activation (msg3d.py:38)


class SGN(nn.Module):
    """Semantics-Guided Network (reference sgn.py:10-102): joint+motion
    embeddings with joint/frame index codes, per-frame data-dependent graph."""
    in_channels: int = 3
    base_channels: int = 64
    num_joints: int = 25
    T: int = 30
    bias: bool = True

    @nn.compact
    def __call__(self, x: Array, *, train: bool) -> Array:
        n, m, t, v, c = x.shape
        assert t == self.T, f"SGN expects T={self.T} input frames"
        b = self.base_channels
        x = x.reshape(n * m, t, v, c)
        nm = n * m

        motion = jnp.diff(x, axis=1, append=jnp.zeros((nm, 1, v, c), x.dtype))

        # BatchNorm1d(C*V) over (NM, C*V, T): feature order (c, v) (sgn.py:79-80)
        def cv_bn(name, arr):
            y = jnp.transpose(arr, (0, 1, 3, 2)).reshape(nm, t, c * v)
            y = TorchBN(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=name)(y)
            return jnp.transpose(y.reshape(nm, t, c, v), (0, 1, 3, 2))

        joint = cv_bn("joint_bn", x)
        motion = cv_bn("motion_bn", motion)

        def conv_bn_relu(arr, feats, name, norm=True):
            y = PointConv(feats, use_bias=self.bias, name=f"{name}_conv")(arr)
            if norm:
                y = BatchNorm(name=f"{name}_bn")(y, use_running_average=not train)
            return jax.nn.relu(y)

        def embed(arr, mid, out, name):
            y = conv_bn_relu(arr, mid, f"{name}0", norm=False)
            return conv_bn_relu(y, out, f"{name}1", norm=False)

        joint_embed = embed(joint, b, b, "joint_embed")
        motion_embed = embed(motion, b, b, "motion_embed")

        t_code = jnp.broadcast_to(jnp.eye(t, dtype=x.dtype)[None, :, None],
                                  (nm, t, v, t))       # [..., f] = eye[t, f]
        s_code = jnp.broadcast_to(jnp.eye(v, dtype=x.dtype)[None, None],
                                  (nm, t, v, v))
        # embed_mlp(in, OUT, MID): t_embed out = base*4, mid = base (sgn.py:27)
        t_embed = embed(t_code, b, b * 4, "t_embed")
        s_embed = embed(s_code, b, b, "s_embed")

        h = jnp.concatenate([joint_embed + motion_embed, s_embed], axis=-1)

        # per-frame dynamic graph (sgn.py:66-71)
        a1 = conv_bn_relu(h, b * 4, "compute_A1", norm=False)
        a2 = conv_bn_relu(h, b * 4, "compute_A2", norm=False)
        A = jax.nn.softmax(jnp.einsum("ntvc,ntwc->ntvw", a1, a2), axis=-1)

        # unit_sgn x3 (gcn.py:932-944): x1 = A @ x, conv + residual conv
        def unit_sgn(arr, feats, name):
            agg = jnp.einsum("ntvw,ntwc->ntvc", A, arr)
            y = PointConv(feats, use_bias=False, name=f"{name}_conv")(agg)
            r = PointConv(feats, use_bias=self.bias, name=f"{name}_res")(arr)
            y = BatchNorm(name=f"{name}_bn")(y + r, use_running_average=not train)
            return jax.nn.relu(y)

        h = unit_sgn(h, b * 2, "gcn1")
        h = unit_sgn(h, b * 4, "gcn2")
        h = unit_sgn(h, b * 4, "gcn3")

        h = h + t_embed
        # temporal head (sgn.py:36-41): adaptive max-pool T->20 & V->1,
        # k=3 temporal conv + BN + ReLU, dropout, 1x1 conv + BN + ReLU
        h = _adaptive_max_pool(h, out_t=20)
        from ..ops.common import TemporalConv
        h = TemporalConv(b * 4, kernel_size=3, name="tcn_conv1")(h)
        h = BatchNorm(name="tcn_bn1")(h, use_running_average=not train)
        h = jax.nn.relu(h)
        h = nn.Dropout(0.2, deterministic=not train)(h)
        h = PointConv(b * 8, use_bias=self.bias, name="tcn_conv2")(h)
        h = BatchNorm(name="tcn_bn2")(h, use_running_average=not train)
        h = jax.nn.relu(h)
        return h.reshape((n, m) + h.shape[1:])


def _adaptive_max_pool(x: Array, out_t: int) -> Array:
    """torch AdaptiveMaxPool2d((out_t, 1)) on (N, C, T, V): bin i spans
    [floor(i*T/out), ceil((i+1)*T/out)); V pooled entirely."""
    n, t, v, c = x.shape
    x = x.max(axis=2, keepdims=True)       # pool V -> 1
    bins = []
    for i in range(out_t):
        lo = (i * t) // out_t
        hi = -(-((i + 1) * t) // out_t)
        bins.append(x[:, lo:hi].max(axis=1))
    return jnp.stack(bins, axis=1)         # (N, out_t, 1, C)
