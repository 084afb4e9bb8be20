"""Nested-copy sparse family parity: AAGCN_sparse and DGSTGCN_sparse
(reference pyskl/pyskl/models/gcns/{aagcn_sparse,dggcn_sparse}.py + the
nested gcn_sparse.py whose threshold threading differs from the outer copy).

Oracles are the ACTUAL nested reference modules (ref_loader.
load_ref_nested_sparse); weights + scores + BN stats are copied and the
eval-mode forward must agree, including the per-stage percentile thresholds
and the residual-threshold quirks (AAGCN residual at threshold 0,
aagcn_sparse.py:59; DG residual thresholded, dggcn_sparse.py:70-75).
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ref_loader
import torch_bridge as tb
from dsgcn_tpu.graph import GraphConfig
from dsgcn_tpu.sparse.nested import SparseAAGCN, SparseDGSTGCN

RNG = np.random.default_rng(44)
SP = 0.4


@pytest.fixture(scope="module")
def nested():
    return ref_loader.load_ref_nested_sparse()


def _sparse_dense(conv):
    w = tb.t2n(conv.weight)[:, :, 0, 0]
    s = tb.t2n(conv.weight_score)[:, :, 0, 0]
    return {"kernel": jnp.asarray(w.T), "score": jnp.asarray(s.T),
            "bias": jnp.asarray(tb.t2n(conv.bias))}


def _sparse_tconv(conv):
    w = np.transpose(tb.t2n(conv.weight), (2, 3, 1, 0))
    s = np.transpose(tb.t2n(conv.weight_score), (2, 3, 1, 0))
    return {"kernel": jnp.asarray(w), "score": jnp.asarray(s),
            "bias": jnp.asarray(tb.t2n(conv.bias))}


def _randomize(model):
    with torch.no_grad():
        for name, p in model.named_parameters():
            if hasattr(p, "is_score") and p.is_score:
                p.copy_(torch.tensor(
                    RNG.standard_normal(tuple(p.shape)).astype(np.float32)))
            elif name.endswith("alpha") or name.endswith("beta"):
                p.copy_(torch.tensor(
                    RNG.uniform(-0.4, 0.4, tuple(p.shape)).astype(np.float32)))
    tb.randomize_all_bns(model, RNG)


def _mstcn_params(tcn):
    tp, ts = {}, {}
    ms_cfg = [(3, 1), (3, 2), (3, 3), (3, 4), ("max", 3), "1x1"]
    for j, cfg in enumerate(ms_cfg):
        br = tcn.branches[j]
        if cfg == "1x1":
            tp[f"branch{j}_conv"] = _sparse_tconv(br)
            continue
        tp[f"branch{j}_pre"] = _sparse_dense(br[0])
        tp[f"branch{j}_bn"] = tb.bn_p(br[1])
        ts[f"branch{j}_bn"] = tb.bn_s(br[1])
        if cfg[0] != "max":
            tp[f"branch{j}_tcn"] = _sparse_tconv(br[3].conv)
    tp["transform_bn"] = tb.bn_p(tcn.transform[0])
    ts["transform_bn"] = tb.bn_s(tcn.transform[0])
    tp["transform_conv"] = _sparse_dense(tcn.transform[2])
    tp["bn"] = tb.bn_p(tcn.bn)
    ts["bn"] = tb.bn_s(tcn.bn)
    return tp, ts


def _unit_tcn_params(ut):
    return ({"conv": _sparse_tconv(ut.conv), "bn": tb.bn_p(ut.bn)},
            {"bn": tb.bn_s(ut.bn)})


def test_nested_aagcn_sparse_backbone_parity(nested):
    torch.manual_seed(0)
    ref = nested["aagcn_sparse"].AAGCN_sparse(
        dict(layout="nturgb+d", mode="spatial"), num_stages=3,
        inflate_stages=[3], down_stages=[3], linear_sparsity=SP, warm_up=0,
        gcn_type="unit_aagcn_sparse", gcn_sparse_ratio=SP,
        tcn_type="unit_tcn_sparse", tcn_sparse_ratio=SP)
    _randomize(ref)
    with torch.no_grad():   # exercise attention + adaptive graph
        for blk in ref.gcn:
            torch.nn.init.normal_(blk.gcn.conv_ta.weight, 0, 0.1)
            torch.nn.init.normal_(blk.gcn.fc2c.weight, 0, 0.1)
            blk.gcn.alpha.copy_(torch.tensor([0.37]))
    ref.eval()

    params = {"data_bn": {"bn": tb.plain_bn_p(ref.data_bn)}}
    stats = {"data_bn": {"bn": tb.plain_bn_s(ref.data_bn)}}
    import torch.nn as nn
    for i, blk in enumerate(ref.gcn):
        g = blk.gcn
        gp = {"A": jnp.asarray(tb.t2n(g.A)),
              "alpha": jnp.asarray(tb.t2n(g.alpha)),
              "bn": tb.bn_p(g.bn),
              "att": {"conv_sa": tb.conv1d_p(g.conv_sa),
                      "conv_ta": tb.conv1d_p(g.conv_ta),
                      "fc1c": tb.dense_p(g.fc1c),
                      "fc2c": tb.dense_p(g.fc2c)}}
        gs = {"bn": tb.bn_s(g.bn)}
        for j in range(3):
            gp[f"conv_a{j}"] = _sparse_dense(g.conv_a[j])
            gp[f"conv_b{j}"] = _sparse_dense(g.conv_b[j])
            gp[f"conv_d{j}"] = _sparse_dense(g.conv_d[j])
        if isinstance(g.down, nn.Sequential):
            gp["down_conv"] = _sparse_dense(g.down[0])
            gp["down_bn"] = tb.bn_p(g.down[1])
            gs["down_bn"] = tb.bn_s(g.down[1])
        tp, ts = _unit_tcn_params(blk.tcn)
        bp, bs = {"gcn": gp, "tcn": tp}, {"gcn": gs, "tcn": ts}
        if isinstance(blk.residual, nn.Module):
            bp["residual"], bs["residual"] = _unit_tcn_params(blk.residual)
        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs

    x = RNG.standard_normal((2, 2, 8, 25, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x), 5, 10).numpy()      # (N, M, C, T, V)

    our = SparseAAGCN(num_stages=3, inflate_stages=(3,), down_stages=(3,),
                      linear_sparsity=SP)
    got = our.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x), SP, train=False)
    got = np.transpose(np.asarray(got), (0, 1, 4, 2, 3))
    assert got.shape == want.shape
    # randomized BN stats explode multi-stage activations (1e4+); scale-aware
    # atol as in test_models_parity.py:75-79
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4 * scale)


def test_nested_dgstgcn_sparse_backbone_parity(nested):
    torch.manual_seed(0)
    ref = nested["dggcn_sparse"].DGSTGCN_sparse(
        dict(layout="nturgb+d", mode="random", num_filter=3,
             init_off=0.04, init_std=0.02),
        num_stages=3, inflate_stages=[3], down_stages=[3],
        linear_sparsity=SP, warm_up=0,
        gcn_type="dggcn_sparse", gcn_sparse_ratio=SP,
        tcn_type="mstcn_sparse", tcn_sparse_ratio=SP)
    _randomize(ref)
    ref.eval()

    params = {"data_bn": {"bn": tb.plain_bn_p(ref.data_bn)}}
    stats = {"data_bn": {"bn": tb.plain_bn_s(ref.data_bn)}}
    import torch.nn as nn
    graph_A = tb.t2n(ref.gcn[0].gcn.A)
    for i, blk in enumerate(ref.gcn):
        g = blk.gcn
        gp = {"A": jnp.asarray(tb.t2n(g.A)),
              "alpha": jnp.asarray(tb.t2n(g.alpha)),
              "beta": jnp.asarray(tb.t2n(g.beta)),
              "pre_conv": _sparse_dense(g.pre[0]),
              "pre_bn": tb.bn_p(g.pre[1]),
              "post_conv": _sparse_dense(g.post),
              "conv1": _sparse_dense(g.conv1),
              "conv2": _sparse_dense(g.conv2),
              "bn": tb.bn_p(g.bn)}
        gs = {"pre_bn": tb.bn_s(g.pre[1]), "bn": tb.bn_s(g.bn)}
        if isinstance(g.down, nn.Sequential):
            gp["down_conv"] = _sparse_dense(g.down[0])
            gp["down_bn"] = tb.bn_p(g.down[1])
            gs["down_bn"] = tb.bn_s(g.down[1])
        tp, ts = _mstcn_params(blk.tcn)
        bp, bs = {"gcn": gp, "tcn": tp}, {"gcn": gs, "tcn": ts}
        if isinstance(blk.residual, nn.Module):
            bp["residual"], bs["residual"] = _unit_tcn_params(blk.residual)
        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs

    x = RNG.standard_normal((2, 2, 8, 25, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.tensor(x), 5, 10).numpy()

    our = SparseDGSTGCN(
        graph_cfg=GraphConfig(layout="nturgb+d", mode="random", num_filter=3,
                              init_off=0.04, init_std=0.02),
        num_stages=3, inflate_stages=(3,), down_stages=(3,),
        linear_sparsity=SP)
    variables = {"params": params, "batch_stats": stats}
    # the graph A is a copied parameter: ours must start from the same draw
    np.testing.assert_allclose(tb.t2n(ref.gcn[1].gcn.A), graph_A)
    got = our.apply(variables, jnp.asarray(x), SP, train=False)
    got = np.transpose(np.asarray(got), (0, 1, 4, 2, 3))
    assert got.shape == want.shape
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4 * scale)


def test_nested_sparse_backbones_train_step():
    """Gradients flow through the STE supermasks and per-stage thresholds of
    both nested backbones (one SGD step decreases a toy loss)."""
    import jax
    import optax

    x = jnp.asarray(RNG.standard_normal((2, 2, 8, 25, 3)).astype(np.float32))
    for model in (SparseAAGCN(num_stages=3, inflate_stages=(3,),
                              down_stages=(3,), linear_sparsity=SP),
                  SparseDGSTGCN(num_stages=3, inflate_stages=(3,),
                                down_stages=(3,), linear_sparsity=SP)):
        variables = model.init(jax.random.PRNGKey(0), x, SP, train=False)
        params, stats = variables["params"], variables["batch_stats"]

        def loss_fn(p):
            out, upd = model.apply({"params": p, "batch_stats": stats},
                                   x, SP, train=True,
                                   mutable=["batch_stats"])
            return (out ** 2).mean(), upd

        (l0, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        score_gnorm = sum(
            float(jnp.abs(g).sum()) for p, g in
            jax.tree_util.tree_leaves_with_path(grads)
            if str(getattr(p[-1], "key", "")) == "score")
        assert score_gnorm > 0, "STE must pass gradients to the scores"
        tx = optax.sgd(1e-3)
        upd, _ = tx.update(grads, tx.init(params))
        p2 = optax.apply_updates(params, upd)
        (l1, _), _ = jax.value_and_grad(loss_fn, has_aux=True)(p2)
        assert float(l1) < float(l0)


# ---------------------------------------------------------------------------
# Assemble_sparse (nested Assemble_sparse.py)
# ---------------------------------------------------------------------------


def _stgcn_block_vars(blk):
    import torch.nn as nn
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
    return bp, bs


def _ctrgcn_block_vars(blk):
    import torch.nn as nn
    g = blk.gcn1
    gp = {"A": jnp.asarray(tb.t2n(g.A)), "alpha": jnp.asarray(tb.t2n(g.alpha))}
    gs = {}
    for j, cv in enumerate(g.convs):
        gp[f"convs{j}"] = {f"conv{k + 1}": _sparse_dense(
            getattr(cv, f"conv{k + 1}")) for k in range(4)}
    if isinstance(g.down, nn.Sequential):
        gp["down_conv"] = _sparse_dense(g.down[0])
        gp["down_bn"] = tb.bn_p(g.down[1])
        gs["down_bn"] = tb.bn_s(g.down[1])
    tp, ts = _mstcn_params(blk.tcn1)
    bp, bs = {"gcn1": gp, "tcn1": tp}, {"gcn1": gs, "tcn1": ts}
    if isinstance(blk.residual, nn.Module):
        bp["residual"] = _sparse_tconv(blk.residual.conv)
        bp["residual_bn"] = tb.bn_p(blk.residual.bn)
        bs["residual_bn"] = tb.bn_s(blk.residual.bn)
    return bp, bs


@pytest.fixture(scope="module")
def ref_assemble(nested):
    torch.manual_seed(1)
    ref = nested["Assemble_sparse"].Assemble_sparse(
        dict(layout="nturgb+d", mode="random", num_filter=6,
             init_off=0.04, init_std=0.02),
        model_list=["ST-GCN", "CTR-GCN"], sparse_ratio=[0.4, 0.5],
        num_stages=3, inflate_stages=[3], down_stages=[3], warm_up=0,
        ST_kwargs=dict(gcn_type="unit_gcn_sparse",
                       tcn_type="unit_tcn_sparse"),
        CTR_kwargs=dict(gcn_type="unit_ctrgcn_sparse",
                        tcn_type="mstcn_sparse"))
    _randomize(ref)
    ref.eval()
    return ref


def _copy_assemble_vars(ref):
    params = {"data_bn": {"bn": tb.plain_bn_p(ref.data_bn)}}
    stats = {"data_bn": {"bn": tb.plain_bn_s(ref.data_bn)}}
    for i, ab in enumerate(ref.net):
        for j, blk in enumerate(ab.net):
            name = f"stage{i}_branch{j}"
            if j == 0:
                params[name], stats[name] = _stgcn_block_vars(blk)
            else:
                params[name], stats[name] = _ctrgcn_block_vars(blk)
    return {"params": params, "batch_stats": stats}


def test_assemble_sparse_backbone_parity(ref_assemble):
    """Full stacked-branch forward parity: B independent branch streams on
    their adjacency slices, per-(stage, branch) thresholds."""
    from dsgcn_tpu.sparse.nested import AssembleSparse
    x = RNG.standard_normal((2, 2, 8, 25, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref_assemble(torch.tensor(x), 5, 10).numpy()  # (B,N,M,C,T,V)

    our = AssembleSparse(
        model_list=("ST-GCN", "CTR-GCN"), sparse_ratio=(0.4, 0.5),
        graph_cfg=GraphConfig(layout="nturgb+d", mode="random", num_filter=6,
                              init_off=0.04, init_std=0.02),
        num_stages=3, inflate_stages=(3,), down_stages=(3,))
    got = our.apply(_copy_assemble_vars(ref_assemble), jnp.asarray(x),
                    5, 10, train=False)
    got = np.transpose(np.asarray(got), (0, 1, 2, 5, 3, 4))
    assert got.shape == want.shape
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=1e-4 * scale)


def test_assemble_regularize_parity(ref_assemble):
    """GSGL over per-(branch, stage) pruned weights (Assemble_sparse.py:
    217-256; single-append, unlike the SMoE double-append quirk)."""
    from dsgcn_tpu.sparse.nested import assemble_regularize
    want = float(ref_assemble.regularize(0.3, "GSGL", 5, 10))
    variables = _copy_assemble_vars(ref_assemble)
    got = float(assemble_regularize(variables["params"],
                                    ("ST-GCN", "CTR-GCN"), (0.4, 0.5),
                                    lam=0.3, penalty="GSGL"))
    np.testing.assert_allclose(got, want, rtol=1e-4)
