"""Parity of the semantic heterogeneous units (unit_aahgcn, CTRHGC,
unit_ctrhgcn) and the temporal-MLP family (unitmlp, msmlp, dgmsmlp) vs the
reference modules."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_loader
import torch_bridge as tb
from dsgcn_tpu.graph import Graph
from dsgcn_tpu.ops.gcn import CTRHGC, UnitAAHGCN, UnitCTRHGCN
from dsgcn_tpu.ops.tcn import DGMSTCN, GCMLP, MSTCN, UnitMLP

RNG = np.random.default_rng(11)
TOL = dict(rtol=3e-4, atol=3e-4)


@pytest.fixture(scope="module")
def refops():
    return ref_loader.load_ref_ops()


@pytest.fixture(scope="module")
def g():
    return Graph(layout="nturgb+d", mode="spatial")


def _x(n=2, t=12, v=25, c=16):
    return RNG.standard_normal((n, t, v, c)).astype(np.float32)


def _compare(our, variables, ref, x, **tol):
    tol = tol or TOL
    xt = torch.tensor(tb.to_nctv(x))
    ref.eval()
    with torch.no_grad():
        want = tb.from_nctv(ref(xt))
    got = np.asarray(our.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, **tol)


# ---------------------------------------------------------------------------
# unitmlp / msmlp / dgmsmlp
# ---------------------------------------------------------------------------

def _unitmlp_vars(ref):
    import numpy as _np
    w = tb.t2n(ref.conv.weight)        # (out, 1, k) depthwise Conv1d
    k = w.shape[-1]
    kernel = _np.transpose(w, (2, 1, 0)).reshape(k, 1, 1, -1)
    params = {"conv_kernel": jnp.asarray(kernel),
              "conv_bias": jnp.asarray(tb.t2n(ref.conv.bias)),
              "conv1": tb.dense_p(ref.conv1)}
    stats = {}
    import torch.nn as nn
    if not isinstance(ref.bn, nn.Identity):
        params["bn"] = tb.bn_p(ref.bn)
        stats["bn"] = tb.bn_s(ref.bn)
    if getattr(ref, "add_tcn", False):
        params["conv2"] = tb.tconv_p(ref.conv2)
        params["alpha"] = jnp.asarray(tb.t2n(ref.alpha))
    return params, stats


@pytest.mark.parametrize("stride,dilation,kernel", [(1, 1, 9), (2, 1, 9),
                                                    (1, 2, 5), (2, 3, 5)])
def test_unitmlp(refops, stride, dilation, kernel):
    _, reftcn = refops
    ref = reftcn.unitmlp(16, 16, kernel_size=kernel, stride=stride,
                         dilation=dilation)
    tb.randomize_all_bns(ref, RNG)
    params, stats = _unitmlp_vars(ref)
    our = UnitMLP(16, kernel_size=kernel, stride=stride, dilation=dilation)
    _compare(our, {"params": params, "batch_stats": stats}, ref, _x(c=16))


def test_unitmlp_add_tcn(refops):
    _, reftcn = refops
    ref = reftcn.unitmlp(16, 16, kernel_size=9, add_tcn=True)
    tb.randomize_all_bns(ref, RNG)
    with torch.no_grad():
        ref.alpha.copy_(torch.tensor([0.55]))
    params, stats = _unitmlp_vars(ref)
    our = UnitMLP(16, kernel_size=9, add_tcn=True)
    _compare(our, {"params": params, "batch_stats": stats}, ref, _x(c=16))


def _msmlp_branch_vars(ref_branches, ms_cfg):
    params, stats = {}, {}
    for i, cfg in enumerate(ms_cfg):
        br = ref_branches[i]
        if cfg == "1x1":
            params[f"branch{i}_conv"] = {"conv": tb.tconv_p(br)["conv"]}
            continue
        params[f"branch{i}_pre"] = tb.dense_p(br[0])
        params[f"branch{i}_bn"] = tb.bn_p(br[1])
        stats[f"branch{i}_bn"] = tb.bn_s(br[1])
        if cfg[0] != "max":
            p, s = _unitmlp_vars(br[3])
            params[f"branch{i}_mlp"] = p
            if s:
                stats[f"branch{i}_mlp"] = s
    return params, stats


@pytest.mark.parametrize("stride", [1, 2])
def test_msmlp(refops, stride):
    _, reftcn = refops
    ref = reftcn.msmlp(16, 24, stride=stride)
    tb.randomize_all_bns(ref, RNG)
    ms_cfg = [(3, 1), (3, 2), (3, 3), (3, 4), ("max", 3), "1x1"]
    bp, bs = _msmlp_branch_vars(ref.branches, ms_cfg)
    params = {"branches": bp, "transform_bn": tb.bn_p(ref.transform[0]),
              "transform_conv": tb.dense_p(ref.transform[2]),
              "bn": tb.bn_p(ref.bn)}
    stats = {"branches": bs, "transform_bn": tb.bn_s(ref.transform[0]),
             "bn": tb.bn_s(ref.bn)}
    our = MSTCN(24, stride=stride, branch_kind="mlp")
    _compare(our, {"params": params, "batch_stats": stats}, ref, _x(c=16))


def test_dgmsmlp(refops):
    _, reftcn = refops
    ref = reftcn.dgmsmlp(16, 24)
    tb.randomize_all_bns(ref, RNG)
    with torch.no_grad():
        ref.add_coeff.copy_(torch.tensor(RNG.standard_normal(25),
                                         dtype=torch.float32))
    ms_cfg = [(3, 1), (3, 2), (3, 3), (3, 4), ("max", 3), "1x1"]
    bp, bs = _msmlp_branch_vars(ref.branches, ms_cfg)
    params = {"branches": bp, "add_coeff": jnp.asarray(tb.t2n(ref.add_coeff)),
              "transform_bn": tb.bn_p(ref.transform[0]),
              "transform_conv": tb.dense_p(ref.transform[2]),
              "bn": tb.bn_p(ref.bn)}
    stats = {"branches": bs, "transform_bn": tb.bn_s(ref.transform[0]),
             "bn": tb.bn_s(ref.bn)}
    our = DGMSTCN(24, branch_kind="mlp")
    _compare(our, {"params": params, "batch_stats": stats}, ref, _x(c=16))


# ---------------------------------------------------------------------------
# unit_aahgcn
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("node_att,edge_att", [(False, False), (True, False),
                                               (True, True)])
def test_unit_aahgcn(refops, g, node_att, edge_att):
    refgcn, _ = refops
    A = g.A.astype(np.float32)
    ref = refgcn.unit_aahgcn(
        16, 32, torch.tensor(A),
        torch.tensor(g.edge_type, dtype=torch.float32),
        torch.tensor(np.array(g.node_type)),
        node_att=node_att, edge_att=edge_att)
    tb.randomize_all_bns(ref, RNG)
    with torch.no_grad():
        ref.alpha.copy_(torch.tensor([0.43]))
        torch.nn.init.normal_(ref.conv_ta.weight, 0, 0.1)
        torch.nn.init.normal_(ref.fc2c.weight, 0, 0.1)
    x = _x(c=16)

    params = {"A": jnp.asarray(tb.t2n(ref.A)),
              "alpha": jnp.asarray(tb.t2n(ref.alpha)),
              "bn": tb.bn_p(ref.bn),
              "down_conv": tb.dense_p(ref.down[0]),
              "down_bn": tb.bn_p(ref.down[1]),
              "att": {"conv_sa": tb.conv1d_p(ref.conv_sa),
                      "conv_ta": tb.conv1d_p(ref.conv_ta),
                      "fc1c": tb.dense_p(ref.fc1c),
                      "fc2c": tb.dense_p(ref.fc2c)}}
    stats = {"bn": tb.bn_s(ref.bn), "down_bn": tb.bn_s(ref.down[1])}
    for i in range(3):
        params[f"conv_d{i}"] = tb.dense_p(ref.conv_d[i])
        params[f"conv_a{i}"] = tb.dense_p(ref.conv_a[i])
        params[f"conv_b{i}"] = tb.dense_p(ref.conv_b[i])
        if edge_att:
            params[f"conv_edge{i}"] = tb.dense_p(ref.conv_edge[i])
    our = UnitAAHGCN(32, A_init=A, edge_type=g.edge_type,
                     node_type=np.array(g.node_type), node_att=node_att,
                     edge_att=edge_att)
    _compare(our, {"params": params, "batch_stats": stats}, ref, x)


# ---------------------------------------------------------------------------
# CTRHGC / unit_ctrhgcn
# ---------------------------------------------------------------------------

def _ctrhgc_vars(ref):
    params = {f"conv{i}": tb.dense_p(getattr(ref, f"conv{i}"))
              for i in (1, 2, 3, 4)}
    if hasattr(ref, "edge_att_conv"):
        params["edge_att_conv"] = tb.dense_p(ref.edge_att_conv)
    if hasattr(ref, "nodeconv"):
        params["nodeconv"] = tb.dense_p(ref.nodeconv)
    if hasattr(ref, "beta"):
        params["beta"] = jnp.asarray(tb.t2n(ref.beta))
    return params


@pytest.mark.parametrize("kw", [
    dict(semantic_index=True, node_attention=True),
    dict(semantic_index=True, node_attention=True, edge_attention=True),
    dict(semantic_index=True, node_attention=False, edge_attention=True,
         add_type=True),
    dict(semantic_index=True, node_attention=True, target_specific=True),
    dict(semantic_index=True, node_attention=True, ada=True),
    dict(semantic_index=False, node_attention=True),
])
def test_ctrhgc(refops, g, kw):
    refgcn, _ = refops
    ref = refgcn.CTRHGC(32, 48, **kw)
    if hasattr(ref, "beta"):
        with torch.no_grad():
            ref.beta.copy_(torch.tensor([0.3]))
    x = _x(c=32)
    A = g.A.astype(np.float32)[1]
    et = torch.tensor(g.edge_type, dtype=torch.float32)
    nt = torch.tensor(np.array(g.node_type))
    ref.eval()
    with torch.no_grad():
        want = tb.from_nctv(ref(torch.tensor(tb.to_nctv(x)), nt, et,
                                torch.tensor(A), 0.63))
    our = CTRHGC(32, 48, edge_type=g.edge_type,
                 node_type=np.array(g.node_type), **kw)
    params = _ctrhgc_vars(ref)
    got = np.asarray(our.apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(A), 0.63))
    np.testing.assert_allclose(got, want, **TOL)


@pytest.mark.parametrize("edge_attention", [False, True])
def test_unit_ctrhgcn(refops, g, edge_attention):
    refgcn, _ = refops
    A = g.A.astype(np.float32)
    et = torch.tensor(g.edge_type, dtype=torch.float32)
    nt = torch.tensor(np.array(g.node_type))
    ref = refgcn.unit_ctrhgcn(16, 32, torch.tensor(A), et, nt,
                              semantic_index=True, node_attention=True,
                              edge_attention=edge_attention)
    tb.randomize_all_bns(ref, RNG)
    with torch.no_grad():
        ref.alpha.copy_(torch.tensor(RNG.uniform(-0.5, 0.5, 3),
                                     dtype=torch.float32))
    x = _x(c=16)
    params = {"A": jnp.asarray(tb.t2n(ref.A)),
              "alpha": jnp.asarray(tb.t2n(ref.alpha)),
              "bn": tb.bn_p(ref.bn),
              "down_conv": tb.dense_p(ref.down[0]),
              "down_bn": tb.bn_p(ref.down[1])}
    stats = {"bn": tb.bn_s(ref.bn), "down_bn": tb.bn_s(ref.down[1])}
    for i in range(3):
        params[f"convs{i}"] = _ctrhgc_vars(ref.convs[i])
    our = UnitCTRHGCN(16, 32, A_init=A, edge_type=g.edge_type,
                      node_type=np.array(g.node_type), semantic_index=True,
                      node_attention=True, edge_attention=edge_attention)
    _compare(our, {"params": params, "batch_stats": stats}, ref, x)


# ---------------------------------------------------------------------------
# dghgcn
# ---------------------------------------------------------------------------

def _dghgcn_vars(ref):
    params = {"A": jnp.asarray(tb.t2n(ref.A)),
              "alpha": jnp.asarray(tb.t2n(ref.alpha)),
              "beta": jnp.asarray(tb.t2n(ref.beta)),
              "pre_conv": tb.dense_p(ref.pre[0]),
              "pre_bn": tb.bn_p(ref.pre[1]),
              "post_conv": tb.dense_p(ref.post),
              "bn": tb.bn_p(ref.bn),
              "down_conv": tb.dense_p(ref.down[0]),
              "down_bn": tb.bn_p(ref.down[1]),
              "conv1": tb.dense_p(ref.conv1),
              "conv2": tb.dense_p(ref.conv2)}
    stats = {"pre_bn": tb.bn_s(ref.pre[1]), "bn": tb.bn_s(ref.bn),
             "down_bn": tb.bn_s(ref.down[1])}
    if hasattr(ref, "edge_linears"):
        params["edge_linears"] = tb.dense_p(ref.edge_linears)
    if hasattr(ref, "ada_linears"):
        params["ada_linears"] = tb.dense_p(ref.ada_linears)
    if hasattr(ref, "nodeconv"):
        params["nodeconv"] = tb.dense_p(ref.nodeconv)
    return params, stats


@pytest.mark.parametrize("kw", [
    dict(),
    dict(node_attention=True),
    dict(node_attention=True, edge_attention=True),
    dict(node_attention=True, edge_attention=True, add_type=True),
    dict(target_specific=True),
    dict(ada_attention=True),
    dict(node_attention=True, subset_wise=True),
])
def test_dghgcn(refops, g, kw):
    from dsgcn_tpu.ops.gcn import DGHGCN
    refgcn, _ = refops
    import torch as _t
    A = Graph(layout="nturgb+d", mode="random", seed=6).A.astype(np.float32)
    ref = refgcn.dghgcn(16, 32, _t.tensor(A),
                        _t.tensor(g.edge_type, dtype=_t.float32),
                        _t.tensor(np.array(g.node_type)), **kw)
    tb.randomize_all_bns(ref, RNG)
    with _t.no_grad():
        ref.alpha.copy_(_t.tensor(RNG.uniform(-0.5, 0.5, 3), dtype=_t.float32))
        ref.beta.copy_(_t.tensor(RNG.uniform(-0.5, 0.5, 3), dtype=_t.float32))
    params, stats = _dghgcn_vars(ref)
    our = DGHGCN(32, A_init=A, edge_type=g.edge_type,
                 node_type=np.array(g.node_type), **kw)
    _compare(our, {"params": params, "batch_stats": stats}, ref, _x(c=16))


def test_unitmlp_channel_annention(refops):
    """unitmlp's 'channel attention' — time-comb block averaging over
    group = C//reduce chunks (reference tcn.py:546-548, 593)."""
    _, reftcn = refops
    ref = reftcn.unitmlp(32, 32, kernel_size=9, channel_annention=True)
    tb.randomize_all_bns(ref, RNG)
    params, stats = _unitmlp_vars(ref)
    our = UnitMLP(32, kernel_size=9, channel_annention=True)
    _compare(our, {"params": params, "batch_stats": stats}, ref,
             _x(t=24, c=32))


def test_gcmlp(refops):
    """gcmlp: msmlp minus the post-concat transform (reference tcn.py:263-340).

    channel_annention must be falsy — the reference default (1) enables the
    comb averaging on mlp branches only, making torch.cat crash on mismatched
    T (dead default; its sole consumer METAGC is dead code anyway,
    metagc.py:36-42 vs 100-101)."""
    _, reftcn = refops
    ref = reftcn.gcmlp(16, 24, channel_annention=0)
    tb.randomize_all_bns(ref, RNG)
    ms_cfg = [(3, 1), (3, 2), (3, 3), (3, 4), ("max", 3), "1x1"]
    bp, bs = _msmlp_branch_vars(ref.branches, ms_cfg)
    params = {"branches": bp, "bn": tb.bn_p(ref.bn)}
    stats = {"branches": bs, "bn": tb.bn_s(ref.bn)}
    our = GCMLP(24)
    _compare(our, {"params": params, "batch_stats": stats}, ref, _x(c=16))

    # the reference default is unusable: channel-attention comb on mlp
    # branches shrinks T and the concat crashes
    import torch as _torch
    ref_bad = reftcn.gcmlp(16, 24)
    with pytest.raises(RuntimeError):
        with _torch.no_grad():
            ref_bad(_torch.zeros(1, 16, 24, 25))
