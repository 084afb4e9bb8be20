"""CTRGCN_sparse full-backbone parity (reference ctrgcn_sparse.py:9-163,
gcn_sparse.py CTRGC_sparse/unit_ctrgcn_sparse, tcn_sparse.py)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_loader
import torch_bridge as tb
from dsgcn_tpu.sparse.models import SparseCTRGCN
from dsgcn_tpu.sparse.supermask import torch_percentile

RNG = np.random.default_rng(43)


def _sparse_dense(conv):
    w = tb.t2n(conv.weight)[:, :, 0, 0]
    s = tb.t2n(conv.weight_score)[:, :, 0, 0]
    p = {"kernel": jnp.asarray(w.T), "score": jnp.asarray(s.T)}
    if conv.bias is not None:
        p["bias"] = jnp.asarray(tb.t2n(conv.bias))
    return p


def _sparse_tconv(conv):
    w = np.transpose(tb.t2n(conv.weight), (2, 3, 1, 0))
    s = np.transpose(tb.t2n(conv.weight_score), (2, 3, 1, 0))
    return {"kernel": jnp.asarray(w), "score": jnp.asarray(s),
            "bias": jnp.asarray(tb.t2n(conv.bias))}


def _randomize_scores(model):
    with torch.no_grad():
        for name, p in model.named_parameters():
            if hasattr(p, "is_score") and p.is_score:
                p.copy_(torch.tensor(
                    RNG.standard_normal(tuple(p.shape)).astype(np.float32)))


def test_sparse_ctrgcn_backbone_parity():
    """Weight+score-copied forward parity at sparsity 0.5, including the
    per-stage global percentile threshold (get_threshold,
    ctrgcn_sparse.py:145-157) and the quirks: inner CTRGC scores excluded
    from the pool (sparse_ratio=0, gcn_sparse.py:272), unused trailing bn
    (gcn_sparse.py:286), default gcn_type='unit_ctrhgcn' unconstructible
    (asserted allowed but no branch creates gcn1, ctrgcn_sparse.py:29-36)."""
    refmod = ref_loader.load_ref_gcn_module("ctrgcn_sparse")
    torch.manual_seed(0)

    bad = refmod.CTRGCN_sparse(
        graph_cfg=dict(layout="nturgb+d", mode="spatial"), num_stages=3,
        inflate_stages=[2], down_stages=[2],
        gcn_sparse_ratio=0.5, tcn_sparse_ratio=0.5, linear_sparsity=0.5)
    with pytest.raises(AttributeError):
        bad(torch.zeros(1, 2, 8, 25, 3), 10, 80)

    ref = refmod.CTRGCN_sparse(
        graph_cfg=dict(layout="nturgb+d", mode="spatial"), num_stages=3,
        inflate_stages=[2], down_stages=[2], gcn_type="unit_ctrgcn_sparse",
        gcn_sparse_ratio=0.5, tcn_sparse_ratio=0.5, linear_sparsity=0.5)
    _randomize_scores(ref)
    tb.randomize_all_bns(ref, RNG)
    with torch.no_grad():
        for blk in ref.net:
            blk.gcn1.alpha.copy_(torch.tensor([0.4]))
    ref.eval()

    our = SparseCTRGCN(num_stages=3, inflate_stages=(2,), down_stages=(2,),
                       linear_sparsity=0.5)

    params = {"data_bn": {"bn": tb.plain_bn_p(ref.data_bn)}}
    stats = {"data_bn": {"bn": tb.plain_bn_s(ref.data_bn)}}
    import torch.nn as nn
    for i, blk in enumerate(ref.net):
        g = blk.gcn1
        gp = {"A": jnp.asarray(tb.t2n(g.A)),
              "alpha": jnp.asarray(tb.t2n(g.alpha))}
        gs = {}
        for j, cv in enumerate(g.convs):
            gp[f"convs{j}"] = {f"conv{k + 1}": _sparse_dense(
                getattr(cv, f"conv{k + 1}")) for k in range(4)}
        if isinstance(g.down, nn.Sequential):
            gp["down_conv"] = _sparse_dense(g.down[0])
            gp["down_bn"] = tb.bn_p(g.down[1])
            gs["down_bn"] = tb.bn_s(g.down[1])
        tp, ts = {}, {}
        ms_cfg = [(3, 1), (3, 2), (3, 3), (3, 4), ("max", 3), "1x1"]
        for j, cfg in enumerate(ms_cfg):
            br = blk.tcn1.branches[j]
            if cfg == "1x1":
                tp[f"branch{j}_conv"] = _sparse_tconv(br)
                continue
            tp[f"branch{j}_pre"] = _sparse_dense(br[0])
            tp[f"branch{j}_bn"] = tb.bn_p(br[1])
            ts[f"branch{j}_bn"] = tb.bn_s(br[1])
            if cfg[0] != "max":
                tp[f"branch{j}_tcn"] = _sparse_tconv(br[3].conv)
        tp["transform_bn"] = tb.bn_p(blk.tcn1.transform[0])
        ts["transform_bn"] = tb.bn_s(blk.tcn1.transform[0])
        tp["transform_conv"] = _sparse_dense(blk.tcn1.transform[2])
        tp["bn"] = tb.bn_p(blk.tcn1.bn)
        ts["bn"] = tb.bn_s(blk.tcn1.bn)
        bp = {"gcn1": gp, "tcn1": tp}
        bs = {"gcn1": gs, "tcn1": ts}
        if isinstance(blk.residual, nn.Module):
            bp["residual"] = _sparse_tconv(blk.residual.conv)
            bp["residual_bn"] = tb.bn_p(blk.residual.bn)
            bs["residual_bn"] = tb.bn_s(blk.residual.bn)
        params[f"block{i}"], stats[f"block{i}"] = bp, bs

    x = RNG.standard_normal((1, 2, 8, 25, 3)).astype(np.float32)
    with torch.no_grad():
        want = tb.t2n(ref(torch.tensor(np.ascontiguousarray(x)), 10, 80))
    want = np.transpose(want, (0, 1, 3, 4, 2))
    got = np.asarray(our.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), 0.5, train=False))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_torch_percentile_parity():
    """torch kthvalue percentile semantics (ctrgcn_sparse.py:155-157)."""
    t = RNG.standard_normal(1001).astype(np.float32)
    for q in (0.0, 25.0, 50.0, 73.3, 100.0):
        tt = torch.tensor(t)
        k = 1 + round(0.01 * q * (tt.numel() - 1))
        want = tt.view(-1).kthvalue(k).values.item()
        got = float(torch_percentile(jnp.asarray(t), q))
        np.testing.assert_allclose(got, want, rtol=1e-6)


def test_sparse_stgcn_exact_backbone_parity():
    """STGCN_sparse global-threshold backbone parity (stgcn_sparse.py:78-212);
    default gcn_type='unit_gcn' documented dead (rejects sparse_ratio)."""
    refmod = ref_loader.load_ref_gcn_module("stgcn_sparse")
    torch.manual_seed(0)

    with pytest.raises(TypeError):
        refmod.STGCN_sparse(graph_cfg=dict(layout="nturgb+d", mode="spatial"),
                            gcn_sparse_ratio=0.5, tcn_sparse_ratio=0.5)

    ref = refmod.STGCN_sparse(
        graph_cfg=dict(layout="nturgb+d", mode="spatial"),
        gcn_type="unit_gcn_sparse", tcn_type="unit_tcn_sparse",
        gcn_sparse_ratio=0.5, tcn_sparse_ratio=0.5, linear_sparsity=0.5,
        num_stages=3, inflate_stages=[2], down_stages=[2])
    _randomize_scores(ref)
    tb.randomize_all_bns(ref, RNG)
    ref.eval()

    from dsgcn_tpu.sparse.models import SparseSTGCNExact
    our = SparseSTGCNExact(num_stages=3, inflate_stages=(2,),
                           down_stages=(2,), linear_sparsity=0.5)

    params = {"data_bn": {"bn": tb.plain_bn_p(ref.data_bn)}}
    stats = {"data_bn": {"bn": tb.plain_bn_s(ref.data_bn)}}
    import torch.nn as nn
    for i, blk in enumerate(ref.gcn):
        bp = {"gcn": {"A": jnp.asarray(tb.t2n(blk.gcn.A)),
                      "conv": _sparse_dense(blk.gcn.conv),
                      "bn": tb.bn_p(blk.gcn.bn)},
              "tcn_conv": _sparse_tconv(blk.tcn.conv),
              "tcn_bn": tb.bn_p(blk.tcn.bn)}
        bs = {"gcn": {"bn": tb.bn_s(blk.gcn.bn)},
              "tcn_bn": tb.bn_s(blk.tcn.bn)}
        if isinstance(blk.residual, nn.Module):
            bp["residual"] = _sparse_tconv(blk.residual.conv)
            bp["residual_bn"] = tb.bn_p(blk.residual.bn)
            bs["residual_bn"] = tb.bn_s(blk.residual.bn)
        params[f"block{i}"], stats[f"block{i}"] = bp, bs

    x = RNG.standard_normal((1, 2, 8, 25, 3)).astype(np.float32)
    with torch.no_grad():
        want = tb.t2n(ref(torch.tensor(np.ascontiguousarray(x)), 10, 80))
    want = np.transpose(want, (0, 1, 3, 4, 2))
    got = np.asarray(our.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), 0.5, train=False))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-4)


def test_unit_aagcn_sparse_is_dead_code():
    """gcn_sparse.unit_aagcn_sparse (102-205) is dead: forward calls its
    SparseConv2d layers without the mandatory threshold argument
    (gcn_sparse.py:186-198 vs sparse_mosules.py:203), so every call raises;
    its down-projection also mismatches channels (inter vs out,
    gcn_sparse.py:146-150)."""
    import importlib
    ref_loader.load_ref_ops()
    gs = importlib.import_module("refops.gcn_sparse")
    torch.manual_seed(0)
    A = torch.eye(25).unsqueeze(0).repeat(3, 1, 1)
    mod = gs.unit_aagcn_sparse(16, 16, A, sparse_ratio=0.5)
    with pytest.raises(TypeError):
        with torch.no_grad():
            mod(torch.zeros(1, 16, 8, 25))
