"""MS-G3D op/backbone parity vs reference + SGN smoke/shape tests."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_loader
import torch_bridge as tb
from dsgcn_tpu.graph import Graph
from dsgcn_tpu.ops.msg3d import (MSGCN, MWMSG3DBlock, multi_scale_adjacency,
                                 unfold_temporal_windows)

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def msg3d_ref():
    return ref_loader.load_ref_msg3d()


def _x(n=2, t=12, v=25, c=8):
    return RNG.standard_normal((n, t, v, c)).astype(np.float32)


def test_multi_scale_adjacency_matches(msg3d_ref):
    g = Graph(layout="nturgb+d", mode="binary_adj")
    A = g.A[0]
    ref = msg3d_ref.MSGCN(5, 8, 16, torch.tensor(A, dtype=torch.float32))
    ours = multi_scale_adjacency(A, 5)
    np.testing.assert_allclose(ours, tb.t2n(ref.A), rtol=1e-6, atol=1e-7)


def test_unfold_temporal_windows_matches(msg3d_ref):
    x = _x()
    ref = msg3d_ref.UnfoldTemporalWindows(window_size=3, window_stride=2)
    want = tb.t2n(ref(torch.tensor(tb.to_nctv(x))))     # (N, C, NW, 3*V)
    got = np.asarray(unfold_temporal_windows(jnp.asarray(x), 3, 2))
    got_nctv = np.transpose(got, (0, 3, 1, 2))
    np.testing.assert_allclose(got_nctv, want, rtol=1e-6, atol=0)


def test_msgcn_parity(msg3d_ref):
    g = Graph(layout="nturgb+d", mode="binary_adj")
    A = torch.tensor(g.A[0], dtype=torch.float32)
    ref = msg3d_ref.MSGCN(5, 8, 16, A)
    tb.randomize_all_bns(ref, RNG)
    with torch.no_grad():
        ref.PA.copy_(torch.tensor(
            RNG.standard_normal(tuple(ref.PA.shape)) * 0.01, dtype=torch.float32))
    x = _x()
    ours = MSGCN(5, 16, g.A[0].astype(np.float32))
    params = {"PA": jnp.asarray(tb.t2n(ref.PA)),
              "mlp": {"conv0": tb.dense_p(ref.mlp.layers[0]),
                      "bn0": tb.bn_p(ref.mlp.layers[1])}}
    stats = {"mlp": {"bn0": tb.bn_s(ref.mlp.layers[1])}}
    ref.eval()
    with torch.no_grad():
        want = tb.from_nctv(ref(torch.tensor(tb.to_nctv(x))))
    got = np.asarray(ours.apply({"params": params, "batch_stats": stats},
                                jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_msg3d_backbone_runs():
    from dsgcn_tpu.models.builder import build_named_model
    m = build_named_model("msg3d", num_classes=10)
    x = jnp.zeros((1, 2, 16, 25, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 10)


def test_sgn_backbone_runs_and_trains():
    from dsgcn_tpu.models.builder import build_named_model
    m = build_named_model("sgn", num_classes=10)
    x = jnp.asarray(RNG.standard_normal((2, 2, 30, 25, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 10)
    out2, muts = m.apply(v, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    assert out2.shape == (2, 10)


# ---------------------------------------------------------------------------
# full-backbone weight-copy parity
# ---------------------------------------------------------------------------

def _mlp_vars(ref_mlp):
    """Reference msg3d_utils.MLP -> our MLP {conv{i}, bn{i}}."""
    params, stats = {}, {}
    convs = [m for m in ref_mlp.layers if isinstance(m, torch.nn.Conv2d)]
    bns = [m for m in ref_mlp.layers if isinstance(m, torch.nn.BatchNorm2d)]
    for i, (cv, bn) in enumerate(zip(convs, bns)):
        params[f"conv{i}"] = tb.dense_p(cv)
        params[f"bn{i}"] = tb.bn_p(bn)
        stats[f"bn{i}"] = tb.bn_s(bn)
    return params, stats


def _msg3d_block_vars(ref_blk):
    """Reference MSG3DBlock -> our MSG3DBlock tree."""
    import numpy as _np
    st = ref_blk.gcn3d[1]
    mp, ms = _mlp_vars(st.mlp)
    params = {"st_msgcn": {"PA": jnp.asarray(tb.t2n(st.PA)), "mlp": mp}}
    stats = {"st_msgcn": {"mlp": ms}}
    w = tb.t2n(ref_blk.out_conv.weight)      # (O, I, 1, ws, 1)
    params["out_conv_kernel"] = jnp.asarray(
        _np.transpose(w[:, :, 0, :, 0], (2, 1, 0)))
    params["out_conv_bias"] = jnp.asarray(tb.t2n(ref_blk.out_conv.bias))
    params["out_bn"] = tb.bn_p(ref_blk.out_bn)
    stats["out_bn"] = tb.bn_s(ref_blk.out_bn)
    return params, stats


def _msgcn_vars(ref):
    mp, ms = _mlp_vars(ref.mlp)
    return ({"PA": jnp.asarray(tb.t2n(ref.PA)), "mlp": mp}, {"mlp": ms})


@pytest.mark.slow
def test_msg3d_full_backbone_parity():
    """Whole MSG3D backbone (reference msg3d.py:11-79), weight-copied."""
    refmod = ref_loader.load_ref_gcn_module("msg3d")
    torch.manual_seed(0)
    ref = refmod.MSG3D(graph_cfg=dict(layout="nturgb+d", mode="binary_adj"),
                       base_channels=12, num_gcn_scales=4, num_g3d_scales=3)
    tb.randomize_all_bns(ref, RNG)
    ref.eval()

    from dsgcn_tpu.graph import GraphConfig
    from dsgcn_tpu.models.msg3d_sgn import MSG3D as OurMSG3D
    our = OurMSG3D(graph_cfg=GraphConfig(layout="nturgb+d", mode="binary_adj"),
                   base_channels=12, num_gcn_scales=4, num_g3d_scales=3)

    params = {"data_bn": {"bn": tb.plain_bn_p(ref.data_bn)}}
    stats = {"data_bn": {"bn": tb.plain_bn_s(ref.data_bn)}}
    for i in (1, 2, 3):
        mw = getattr(ref, f"gcn3d{i}")
        gp, gs = {}, {}
        for j, blk in enumerate(mw.gcn3d):
            p, s = _msg3d_block_vars(blk)
            gp[f"gcn3d{j}"], gs[f"gcn3d{j}"] = p, s
        params[f"gcn3d{i}"], stats[f"gcn3d{i}"] = gp, gs

        sgcn = getattr(ref, f"sgcn{i}")
        params[f"sgcn{i}_gcn"], stats[f"sgcn{i}_gcn"] = _msgcn_vars(sgcn[0])
        p, s = tb.ctr_mstcn_vars(sgcn[1], n_dil=4, residual=True)
        params[f"sgcn{i}_tcn1"], stats[f"sgcn{i}_tcn1"] = p, s
        p, s = tb.ctr_mstcn_vars(sgcn[2], n_dil=4, residual=True)
        params[f"sgcn{i}_tcn2"], stats[f"sgcn{i}_tcn2"] = p, s
        p, s = tb.ctr_mstcn_vars(getattr(ref, f"tcn{i}"), n_dil=4,
                                 residual=True)
        params[f"tcn{i}"], stats[f"tcn{i}"] = p, s

    x = RNG.standard_normal((1, 2, 16, 25, 3)).astype(np.float32)
    with torch.no_grad():
        want = tb.t2n(ref(torch.tensor(np.ascontiguousarray(x))))
    want = np.transpose(want, (0, 1, 3, 4, 2))
    got = np.asarray(our.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_sgn_full_backbone_parity():
    """Whole SGN backbone (reference sgn.py:10-102 + unit_sgn gcn.py:932-944),
    weight-copied."""
    refmod = ref_loader.load_ref_gcn_module("sgn")
    torch.manual_seed(0)
    ref = refmod.SGN(base_channels=16)
    tb.randomize_all_bns(ref, RNG)
    ref.eval()

    from dsgcn_tpu.models.msg3d_sgn import SGN as OurSGN
    our = OurSGN(base_channels=16)

    def embed_vars(seq, name):
        return {f"{name}0_conv": tb.dense_p(seq[0].conv),
                f"{name}1_conv": tb.dense_p(seq[1].conv)}

    params = {"joint_bn": tb.plain_bn_p(ref.joint_bn),
              "motion_bn": tb.plain_bn_p(ref.motion_bn)}
    stats = {"joint_bn": tb.plain_bn_s(ref.joint_bn),
             "motion_bn": tb.plain_bn_s(ref.motion_bn)}
    for nm in ("joint_embed", "motion_embed", "t_embed", "s_embed"):
        params.update(embed_vars(getattr(ref, nm), nm))
    params["compute_A1_conv"] = tb.dense_p(ref.compute_A1.conv)
    params["compute_A2_conv"] = tb.dense_p(ref.compute_A2.conv)
    for i in (1, 2, 3):
        g = getattr(ref, f"gcn{i}")
        params[f"gcn{i}_conv"] = tb.dense_p(g.conv)
        params[f"gcn{i}_res"] = tb.dense_p(g.residual)
        params[f"gcn{i}_bn"] = tb.bn_p(g.bn)
        stats[f"gcn{i}_bn"] = tb.bn_s(g.bn)
    params["tcn_conv1"] = tb.tconv_p(ref.tcn[1].conv)
    params["tcn_bn1"] = tb.bn_p(ref.tcn[1].bn)
    stats["tcn_bn1"] = tb.bn_s(ref.tcn[1].bn)
    params["tcn_conv2"] = tb.dense_p(ref.tcn[3].conv)
    params["tcn_bn2"] = tb.bn_p(ref.tcn[3].bn)
    stats["tcn_bn2"] = tb.bn_s(ref.tcn[3].bn)

    x = RNG.standard_normal((2, 1, 30, 25, 3)).astype(np.float32)
    with torch.no_grad():
        want = tb.t2n(ref(torch.tensor(np.ascontiguousarray(x))))
    want = np.transpose(want, (0, 1, 3, 4, 2))
    got = np.asarray(our.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)
