"""GTGCN graph-transformer family parity (reference GTGC gcn.py:1054-1222,
unit_gtgcn gcn.py:1224-1294, GTGCN backbone gtgcn.py:68-141, MEGASTGCN
MEGA.py:97-178)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_loader
import torch_bridge as tb
from dsgcn_tpu.graph import Graph
from dsgcn_tpu.models.builder import build_backbone
from dsgcn_tpu.ops.gcn import UnitGTGCN

RNG = np.random.default_rng(23)


@pytest.fixture(scope="module")
def refops():
    return ref_loader.load_ref_ops()


def _graph():
    return Graph(layout="nturgb+d", mode="spatial")


def _unit_gtgcn_vars(ref):
    params = {"bn": tb.bn_p(ref.bn)}
    stats = {"bn": tb.bn_s(ref.bn)}
    if hasattr(ref, "PA"):
        params["PA"] = jnp.asarray(tb.t2n(ref.PA))
    elif ref.adaptive == "init":
        params["A"] = jnp.asarray(tb.t2n(ref.A))
    import torch.nn as nn
    if isinstance(ref.down, nn.Sequential):
        params["down_conv"] = tb.dense_p(ref.down[0])
        params["down_bn"] = tb.bn_p(ref.down[1])
        stats["down_bn"] = tb.bn_s(ref.down[1])
    g = ref.convs
    cp = {"pre_conv": tb.dense_p(g.pre_conv[0]),
          "pre_bn": tb.bn_p(g.pre_conv[1]),
          "k_linears": tb.dense_p(g.k_linears),
          "q_linears": tb.dense_p(g.q_linears),
          "out_linears": tb.dense_p(g.out_linears),
          "alpha": jnp.asarray(tb.t2n(g.alpha))}
    cs = {"pre_bn": tb.bn_s(g.pre_conv[1])}
    if g.edge_attention:
        cp["edge_linears"] = tb.dense_p(g.edge_linears)
    if g.global_attention:
        cp["beta"] = jnp.asarray(tb.t2n(g.beta))
    params["convs"] = cp
    stats["convs"] = cs
    return params, stats


@pytest.mark.parametrize("knobs", [
    dict(),
    dict(edge_attention=True),
    dict(target_specific=True),
    dict(global_attention=True),
    dict(edge_attention=True, target_specific=True, global_attention=True),
    dict(adaptive="offset"),
    dict(adaptive="importance"),
])
def test_unit_gtgcn_parity(refops, knobs):
    refgcn, _ = refops
    torch.manual_seed(0)
    g = _graph()
    A = torch.tensor(g.A, dtype=torch.float32)
    node_type = torch.tensor(np.asarray(g.node_type))
    edge_type = torch.tensor(g.edge_type, dtype=torch.float32)

    ref = refgcn.unit_gtgcn(16, 24, A, A.shape[0], edge_type, node_type,
                            **knobs)
    tb.randomize_all_bns(ref, RNG)
    with torch.no_grad():
        ref.convs.alpha.copy_(torch.tensor([0.7]))
        if hasattr(ref.convs, "beta"):
            ref.convs.beta.copy_(torch.tensor([0.4]))
        if hasattr(ref, "PA") and ref.adaptive == "offset":
            ref.PA.copy_(torch.tensor(
                RNG.standard_normal((25, 25)).astype(np.float32) * 0.01))
    ref.eval()

    our = UnitGTGCN(24, A_init=g.A, node_type=np.asarray(g.node_type),
                    edge_type=g.edge_type, **knobs)
    params, stats = _unit_gtgcn_vars(ref)

    x = RNG.standard_normal((2, 8, 25, 16)).astype(np.float32)
    with torch.no_grad():
        want = tb.from_nctv(ref(torch.tensor(tb.to_nctv(x)), None))
    got = np.asarray(our.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_gtgcn_backbone_parity():
    """Full GTGCN backbone weight-copy parity (gtgcn.py:68-141)."""
    refmod = ref_loader.load_ref_gcn_module("gtgcn")
    torch.manual_seed(0)
    ref = refmod.GTGCN(graph_cfg=dict(layout="nturgb+d", mode="spatial"),
                       num_stages=4, inflate_stages=[3], down_stages=[3])
    tb.randomize_all_bns(ref, RNG)
    ref.eval()

    our = build_backbone(dict(
        type="GTGCN", num_stages=4, inflate_stages=[3], down_stages=[3],
        graph_cfg=dict(layout="nturgb+d", mode="spatial")))

    params = {"data_bn": {"bn": tb.plain_bn_p(ref.data_bn)}}
    stats = {"data_bn": {"bn": tb.plain_bn_s(ref.data_bn)}}
    for i, blk in enumerate(ref.net):
        gp, gs = _unit_gtgcn_vars(blk.gcn1)
        bp = {"gcn1": gp, "tcn1": {"conv": tb.tconv_p(blk.tcn1.conv),
                                   "bn": tb.bn_p(blk.tcn1.bn)}}
        bs = {"gcn1": gs, "tcn1": {"bn": tb.bn_s(blk.tcn1.bn)}}
        import torch.nn as nn
        if isinstance(blk.residual, nn.Module):
            rp, rs = tb.unit_tcn_vars(blk.residual)
            bp["residual"] = {"down": rp}
            bs["residual"] = {"down": rs}
        params[f"block{i}"], stats[f"block{i}"] = bp, bs

    x = RNG.standard_normal((1, 2, 12, 25, 3)).astype(np.float32)
    with torch.no_grad():
        want = tb.t2n(ref(torch.tensor(np.ascontiguousarray(x))))
    want = np.transpose(want, (0, 1, 3, 4, 2))
    got = np.asarray(our.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_megastgcn_is_stgcn():
    """Reference MEGASTGCN (MEGA.py:97-178) is structurally identical to the
    reference STGCN trunk (same blocks, same stage plan); its LGA module is
    dead code (never instantiated, and references undefined attributes
    self.in_channels/self.tcn/self.gcn, MEGA.py:68-95).  We therefore alias
    MEGASTGCN to our STGCN: same-seed reference MEGASTGCN and STGCN produce
    identical outputs."""
    refmega = ref_loader.load_ref_gcn_module("MEGA")
    refbb = ref_loader.load_ref_backbones()
    torch.manual_seed(0)
    a = refmega.MEGASTGCN(graph_cfg=dict(layout="nturgb+d", mode="spatial"),
                          num_stages=3, inflate_stages=[2], down_stages=[2])
    torch.manual_seed(0)
    b = refbb["stgcn"].STGCN(graph_cfg=dict(layout="nturgb+d", mode="spatial"),
                             num_stages=3, inflate_stages=[2], down_stages=[2])
    a.eval(), b.eval()
    x = torch.tensor(RNG.standard_normal((1, 2, 8, 25, 3)).astype(np.float32))
    with torch.no_grad():
        np.testing.assert_allclose(tb.t2n(a(x)), tb.t2n(b(x)), rtol=1e-6)

    from dsgcn_tpu.models.builder import BACKBONES
    from dsgcn_tpu.models.backbones import STGCN
    assert BACKBONES["MEGASTGCN"] is STGCN


def _stgin_block_vars(blk):
    """Reference STGINBlock (unit_gcnedge + unit_tcnedge) -> our tree."""
    import torch.nn as nn
    g, tc = blk.gcn, blk.tcn
    gp = {"conv": tb.dense_p(g.conv), "edge_conv": tb.dense_p(g.edge_conv),
          "bn": tb.bn_p(g.bn)}
    gs = {"bn": tb.bn_s(g.bn)}
    if hasattr(g, "PA"):
        gp["PA"] = jnp.asarray(tb.t2n(g.PA))
    elif g.adaptive == "init":
        gp["A"] = jnp.asarray(tb.t2n(g.A))
    gp["edge_conv_T"] = tb.dense_p(g.edge_conv_T)
    tp = {"conv": tb.tconv_p(tc.conv), "edge_conv": tb.tconv_p(tc.edge_conv),
          "bn": tb.bn_p(tc.bn)}
    ts = {"bn": tb.bn_s(tc.bn)}
    if hasattr(tc, "edge_conv_S"):
        tp["edge_conv_S"] = tb.tconv_p(tc.edge_conv_S)
    params = {"gcn": gp, "tcn": tp}
    stats = {"gcn": gs, "tcn": ts}
    if isinstance(blk.residual, nn.Module):
        rp, rs = tb.unit_tcn_vars(blk.residual)
        params["residual"] = {"down": rp}
        stats["residual"] = {"down": rs}
    return params, stats


def test_stgin_backbone_parity():
    """ST-GIN with edge-representation units: full-backbone weight-copy
    parity (stgin.py:74-162; unit_gcnedge gcn.py:212-323, unit_tcnedge
    tcn.py:39-103 — live ONLY through STGIN; the STGCN-side usage is dead
    code, stgcn.py:64-67 passes (x, A) into a forward wanting edge reps)."""
    refmod = ref_loader.load_ref_gcn_module("stgin")
    torch.manual_seed(0)
    ref = refmod.STGIN(graph_cfg=dict(layout="nturgb+d", mode="spatial"),
                       gcn_type="unit_gcnedge", tcn_type="unit_tcnedge",
                       num_stages=4, inflate_stages=[3], down_stages=[3])
    tb.randomize_all_bns(ref, RNG)
    ref.eval()

    our = build_backbone(dict(
        type="STGIN", gcn_type="unit_gcnedge", tcn_type="unit_tcnedge",
        num_stages=4, inflate_stages=[3], down_stages=[3],
        graph_cfg=dict(layout="nturgb+d", mode="spatial")))

    params = {"data_bn": {"bn": tb.plain_bn_p(ref.data_bn)},
              "edge_conv": tb.dense_p(ref.edge_conv)}
    stats = {"data_bn": {"bn": tb.plain_bn_s(ref.data_bn)}}
    for i, blk in enumerate(ref.gcn):
        p, s = _stgin_block_vars(blk)
        params[f"block{i}"], stats[f"block{i}"] = p, s

    x = RNG.standard_normal((1, 2, 8, 25, 3)).astype(np.float32)
    with torch.no_grad():
        want = tb.t2n(ref(torch.tensor(np.ascontiguousarray(x))))
    want = np.transpose(want, (0, 1, 3, 4, 2))
    got = np.asarray(our.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_stgcn_gc_backbone_parity():
    """STGCN_GC: STGCN trunk fed an external (causality) adjacency
    (stgcn_gc.py:68-149).  Works only with gcn_adaptive in (None, 'offset',
    'importance'): the default 'init' crashes (unit_gcn.forward assigns the
    fed tensor onto nn.Parameter A, gcn.py:57-58)."""
    refmod = ref_loader.load_ref_gcn_module("stgcn_gc")
    torch.manual_seed(0)

    with pytest.raises(TypeError):
        bad = refmod.STGCN_GC(
            graph_cfg=dict(layout="nturgb+d", mode="spatial"), num_stages=3,
            inflate_stages=[2], down_stages=[2])
        bad(torch.zeros(1, 2, 8, 25, 3), torch.zeros(3, 25, 25))

    ref = refmod.STGCN_GC(graph_cfg=dict(layout="nturgb+d", mode="spatial"),
                          gcn_adaptive=None, num_stages=3,
                          inflate_stages=[2], down_stages=[2])
    tb.randomize_all_bns(ref, RNG)
    ref.eval()

    our = build_backbone(dict(
        type="STGCN_GC", gcn_adaptive=None, num_stages=3,
        inflate_stages=[2], down_stages=[2],
        graph_cfg=dict(layout="nturgb+d", mode="spatial")))

    params = {"data_bn": {"bn": tb.plain_bn_p(ref.data_bn)}}
    stats = {"data_bn": {"bn": tb.plain_bn_s(ref.data_bn)}}
    import torch.nn as nn
    for i, blk in enumerate(ref.gcn):
        bp = {"gcn": {"conv": tb.dense_p(blk.gcn.conv),
                      "bn": tb.bn_p(blk.gcn.bn)},
              "tcn": {"conv": tb.tconv_p(blk.tcn.conv),
                      "bn": tb.bn_p(blk.tcn.bn)}}
        bs = {"gcn": {"bn": tb.bn_s(blk.gcn.bn)},
              "tcn": {"bn": tb.bn_s(blk.tcn.bn)}}
        if isinstance(blk.residual, nn.Module):
            rp, rs = tb.unit_tcn_vars(blk.residual)
            bp["residual"] = {"down": rp}
            bs["residual"] = {"down": rs}
        params[f"block{i}"], stats[f"block{i}"] = bp, bs

    x = RNG.standard_normal((1, 2, 8, 25, 3)).astype(np.float32)
    A_ext = np.abs(RNG.standard_normal((3, 25, 25))).astype(np.float32) * 0.1
    with torch.no_grad():
        want = tb.t2n(ref(torch.tensor(np.ascontiguousarray(x)),
                          torch.tensor(A_ext)))
    want = np.transpose(want, (0, 1, 3, 4, 2))
    got = np.asarray(our.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), jnp.asarray(A_ext),
                               train=False))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_stgcn_causal_is_dead_code():
    """STGCN_causal (STGCN_causal.py:70-152) is dead as committed: its block
    unpacks `x, causal_loss = self.gcn(x, A)` (STGCN_causal.py:63) but the
    only allowed gcn types return a single tensor, so forward fails for any
    batch size (tensor mis-unpacking then 3D input into BatchNorm2d)."""
    refmod = ref_loader.load_ref_gcn_module("STGCN_causal")
    torch.manual_seed(0)
    ref = refmod.STGCN_causal(
        graph_cfg=dict(layout="nturgb+d", mode="spatial"), num_stages=3,
        inflate_stages=[2], down_stages=[2])
    ref.eval()
    with pytest.raises((ValueError, RuntimeError)):
        with torch.no_grad():
            ref(torch.zeros(1, 2, 8, 25, 3))


def test_causal_transforms():
    """Causalmetrix percentile threshold parity (pose_related.py:106-127) and
    GaussAug's faithful 'keyoint' typo (pose_related.py:83-104)."""
    import ref_loader as rl
    pipelines = rl.load_ref_pipelines()
    pr = pipelines["pose_related"]
    from dsgcn_tpu.data.transforms import Causalmetrix, GaussAug

    causal = np.abs(RNG.standard_normal((25, 25))).astype(np.float64)
    want = pr.Causalmetrix(thr=75)(dict(causal=causal.copy()))["causal"]
    got = Causalmetrix(thr=75)(dict(causal=causal.copy()))["causal"]
    np.testing.assert_allclose(got, want)

    res = dict(keypoint=np.zeros((1, 4, 25, 3), np.float32))
    out = GaussAug(thr=0.0)(dict(res), np.random.RandomState(1))
    assert "keyoint" in out and out["keypoint"].sum() == 0


def test_pte_parity():
    """Phase-transfer-entropy matrix parity (pipelines/causal.py:30-58)."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "ref_causal", "/root/reference/pyskl/datasets/pipelines/causal.py")
    refc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(refc)
    from dsgcn_tpu.data.causal_pte import pte

    z = RNG.standard_normal((6, 2, 60))
    # make series causally coupled so determinants stay positive
    z[1, :, 1:] += 0.5 * z[0, :, :-1]
    want = refc.pTE(z.copy(), lag=1, model_order=2, to_norm=True)
    got = pte(z.copy(), lag=1, model_order=2, to_norm=True)
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-10)
    want2 = refc.pTE(z.copy(), model_order=1)
    got2 = pte(z.copy(), model_order=1)
    np.testing.assert_allclose(got2, want2, rtol=1e-8, atol=1e-10)
