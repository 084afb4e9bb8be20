"""Full-backbone parity vs the reference STGCN/AAGCN/CTRGCN/DGSTGCN modules.

Builds each reference backbone in its canonical configuration, copies all
weights block-by-block, and compares (N, M, T, V, C) forward outputs.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ref_loader
import torch_bridge as tb
from dsgcn_tpu.graph import Graph, GraphConfig
from dsgcn_tpu.models.builder import build_named_model, model_cfg, build_model

RNG = np.random.default_rng(1)
TOL = dict(rtol=5e-4, atol=5e-4)


@pytest.fixture(scope="module")
def refbb():
    return ref_loader.load_ref_backbones()


def _x(n=2, m=2, t=24, v=25, c=3):
    return RNG.standard_normal((n, m, t, v, c)).astype(np.float32)


def _data_bn_vars(ref_bn):
    return {"bn": tb.plain_bn_p(ref_bn)}, {"bn": tb.plain_bn_s(ref_bn)}


def _residual_vars(ref_res):
    import torch.nn as nn
    if not isinstance(ref_res, nn.Module):
        return None
    p, s = tb.unit_tcn_vars(ref_res)
    return {"down": p}, {"down": s}


def _block_vars(ref_block, gcn_fn, tcn_fn, gcn_attr="gcn", tcn_attr="tcn"):
    params, stats = {}, {}
    gp, gs = gcn_fn(getattr(ref_block, gcn_attr))
    params["gcn"] = gp
    stats["gcn"] = gs
    tp, ts = tcn_fn(getattr(ref_block, tcn_attr))
    params["tcn"] = tp
    stats["tcn"] = ts
    rv = _residual_vars(ref_block.residual)
    if rv is not None:
        params["residual"], stats["residual"] = rv
    return params, stats


def _assemble(ref, block_specs):
    """data_bn + blocks -> full variables dict."""
    params, stats = {}, {}
    if hasattr(ref, "data_bn") and not isinstance(ref.data_bn, torch.nn.Identity):
        p, s = _data_bn_vars(ref.data_bn)
        params["data_bn"] = p
        stats["data_bn"] = s
    for i, (pb, sb) in enumerate(block_specs):
        params[f"block{i}"] = pb
        stats[f"block{i}"] = sb
    return {"params": params, "batch_stats": stats}


def _compare_backbone(our_bb, variables, ref_bb, x):
    ref_bb.eval()
    with torch.no_grad():
        want = tb.t2n(ref_bb(torch.tensor(np.ascontiguousarray(x))))
    want = np.transpose(want, (0, 1, 3, 4, 2))   # (N,M,C,T,V) -> (N,M,T,V,C)
    got = np.asarray(our_bb.apply(variables, jnp.asarray(x), train=False))
    # randomized BN stats make 10-stage activations explode (1e3+); scale the
    # absolute tolerance by output magnitude — per-op parity is tested tightly
    # in test_ops_parity, this guards the wiring.
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4 * scale)


def test_stgcnpp_backbone(refbb):
    """STGCN++: gcn_adaptive='init', gcn_with_res, mstcn (STGCN++_model.py)."""
    cfg = model_cfg("stgcn++")["backbone"]
    ref = refbb["stgcn"].STGCN(
        graph_cfg=dict(layout="nturgb+d", mode="spatial"),
        gcn_adaptive="init", gcn_with_res=True, tcn_type="mstcn")
    tb.randomize_all_bns(ref, RNG)
    from dsgcn_tpu.models.builder import build_backbone
    our = build_backbone(cfg)
    specs = [_block_vars(ref.gcn[i], tb.unit_gcn_vars, tb.mstcn_vars)
             for i in range(ref.num_stages)]
    _compare_backbone(our, _assemble(ref, specs), ref, _x())


def test_stgcn_backbone(refbb):
    """Plain ST-GCN: stgcn_spatial graph, unit_tcn, no gcn residual."""
    cfg = model_cfg("stgcn")["backbone"]
    ref = refbb["stgcn"].STGCN(
        graph_cfg=dict(layout="nturgb+d", mode="stgcn_spatial"))
    tb.randomize_all_bns(ref, RNG)
    from dsgcn_tpu.models.builder import build_backbone
    our = build_backbone(cfg)
    specs = [_block_vars(ref.gcn[i], tb.unit_gcn_vars, tb.unit_tcn_vars)
             for i in range(ref.num_stages)]
    _compare_backbone(our, _assemble(ref, specs), ref, _x())


def test_aagcn_backbone(refbb):
    cfg = model_cfg("aagcn")["backbone"]
    ref = refbb["aagcn"].AAGCN(
        graph_cfg=dict(layout="nturgb+d", mode="spatial"),
        gcn_type="unit_aagcn")
    tb.randomize_all_bns(ref, RNG)
    from dsgcn_tpu.models.builder import build_backbone
    our = build_backbone(cfg)
    specs = [_block_vars(ref.gcn[i], tb.unit_aagcn_vars, tb.unit_tcn_vars)
             for i in range(ref.num_stages)]
    _compare_backbone(our, _assemble(ref, specs), ref, _x())


def test_ctrgcn_backbone(refbb):
    cfg = model_cfg("ctrgcn")["backbone"]
    ref = refbb["ctrgcn"].CTRGCN(
        graph_cfg=dict(layout="nturgb+d", mode="spatial"),
        gcn_type="unit_ctrgcn")
    tb.randomize_all_bns(ref, RNG)
    from dsgcn_tpu.models.builder import build_backbone
    our = build_backbone(cfg)
    specs = [_block_vars(ref.net[i], tb.unit_ctrgcn_vars,
                         lambda m: tb.ctr_mstcn_vars(m, n_dil=2),
                         gcn_attr="gcn1", tcn_attr="tcn1")
             for i in range(10)]
    _compare_backbone(our, _assemble(ref, specs), ref, _x())


def _dgstgcn_pair(refbb, gcn_type, **extra):
    g = Graph(layout="nturgb+d", mode="random", num_filter=3, seed=11)
    ref = refbb["dgstgcn"].DGSTGCN(
        graph_cfg=dict(layout="nturgb+d", mode="random", num_filter=3,
                       init_off=0.04, init_std=0.02),
        gcn_type=gcn_type, tcn_type="dgmstcn", **extra)
    from dsgcn_tpu.models.builder import build_backbone
    cfg = dict(type="DGSTGCN", gcn_type=gcn_type, tcn_type="dgmstcn",
               graph_cfg=dict(layout="nturgb+d", mode="random", num_filter=3,
                              init_off=0.04, init_std=0.02, seed=11), **extra)
    our = build_backbone(cfg)
    return ref, our


def test_dgstgcn_backbone(refbb):
    """DG-STGCN: dggcn + dgmstcn, random trained graph."""
    ref, our = _dgstgcn_pair(refbb, "dggcn", gcn_ratio=0.25, gcn_ctr="T",
                             gcn_ada="T")
    tb.randomize_all_bns(ref, RNG)
    specs = [_block_vars(ref.gcn[i], tb.dggcn_vars, tb.dgmstcn_vars)
             for i in range(ref.num_stages)]
    _compare_backbone(our, _assemble(ref, specs), ref, _x())


def test_dsgcn_backbone(refbb):
    """DS-GCN flagship: dgphgcn1 with node+edge attention, decompose,
    subset_wise, ratio=0.125 (configs/dsstgcn/DSSTGCN_model.py)."""
    ref, our = _dgstgcn_pair(
        refbb, "dgphgcn1", gcn_ratio=0.125, gcn_node_attention=True,
        gcn_edge_attention=True, gcn_decompose=True, gcn_subset_wise=True,
        gcn_ctr="T", gcn_ada="T")
    tb.randomize_all_bns(ref, RNG)
    # randomize the alpha/beta gates so dynamic branches actually contribute
    with torch.no_grad():
        for blk in ref.gcn:
            blk.gcn.alpha.copy_(torch.tensor(
                RNG.uniform(-0.5, 0.5, blk.gcn.alpha.shape[0]), dtype=torch.float32))
            blk.gcn.beta.copy_(torch.tensor(
                RNG.uniform(-0.5, 0.5, blk.gcn.beta.shape[0]), dtype=torch.float32))
    specs = [_block_vars(ref.gcn[i], tb.dgphgcn1_vars, tb.dgmstcn_vars)
             for i in range(ref.num_stages)]
    _compare_backbone(our, _assemble(ref, specs), ref, _x())


def test_model_builds_and_runs():
    """Smoke: every preset builds, inits, and produces (N, classes) logits."""
    import jax
    for name in ("stgcn", "stgcn++", "aagcn", "ctrgcn", "dgstgcn", "dsgcn"):
        model = build_named_model(name, num_classes=60)
        x = jnp.asarray(_x(n=1, t=16))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (1, 60), name
