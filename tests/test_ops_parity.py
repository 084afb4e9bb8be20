"""Elementwise parity of dsgcn_tpu ops vs the actual reference PyTorch modules.

Methodology: build the reference op, randomize every BN's affine+running stats,
copy all weights into our op (channels-last layout), and compare outputs in both
eval and train (batch-stat) modes.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ref_loader
import torch_bridge as tb
from dsgcn_tpu.graph import Graph
from dsgcn_tpu.ops.gcn import (CTRGC, DGGCN, DGPHGCN1, UnitAAGCN, UnitCTRGCN,
                               UnitGCN)
from dsgcn_tpu.ops.tcn import CTRMSTCN, DGMSTCN, MSTCN, UnitTCN

RNG = np.random.default_rng(0)
TOL = dict(rtol=2e-4, atol=2e-4)


@pytest.fixture(scope="module")
def refops():
    return ref_loader.load_ref_ops()


def _x(n=2, t=12, v=25, c=16):
    return RNG.standard_normal((n, t, v, c)).astype(np.float32)


def _compare(our_mod, variables, ref_mod, x, **tol):
    tol = tol or TOL
    xt = torch.tensor(tb.to_nctv(x))
    ref_mod.eval()
    with torch.no_grad():
        want = tb.from_nctv(ref_mod(xt))
    got = np.asarray(our_mod.apply(variables, jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, **tol)

    # train mode: batch statistics path
    ref_mod.train()
    with torch.no_grad():
        want_tr = tb.from_nctv(ref_mod(xt))
    got_tr, _ = our_mod.apply(variables, jnp.asarray(x), train=True,
                              mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(got_tr), want_tr, **tol)


# ---------------------------------------------------------------------------
# unit_gcn
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("adaptive", [None, "init", "offset", "importance"])
@pytest.mark.parametrize("conv_pos", ["pre", "post"])
def test_unit_gcn(refops, adaptive, conv_pos):
    refgcn, _ = refops
    A = Graph(layout="nturgb+d", mode="spatial").A.astype(np.float32)
    ref = refgcn.unit_gcn(16, 32, torch.tensor(A), adaptive=adaptive,
                          conv_pos=conv_pos, with_res=True)
    tb.randomize_all_bns(ref, RNG)
    x = _x(c=16)

    params = {"conv": tb.dense_p(ref.conv), "bn": tb.bn_p(ref.bn),
              "down_conv": tb.dense_p(ref.down[0]), "down_bn": tb.bn_p(ref.down[1])}
    stats = {"bn": tb.bn_s(ref.bn), "down_bn": tb.bn_s(ref.down[1])}
    if adaptive == "init":
        params["A"] = jnp.asarray(tb.t2n(ref.A))
    if adaptive in ("offset", "importance"):
        params["PA"] = jnp.asarray(tb.t2n(ref.PA))

    our = UnitGCN(32, A_init=A, adaptive=adaptive, conv_pos=conv_pos, with_res=True)
    if adaptive == "offset":
        # our stored param is PA+1e-6 (used as A + (PA-1e-6))
        params["PA"] = params["PA"] + 1e-6
    _compare(our, {"params": params, "batch_stats": stats}, ref, x)


# ---------------------------------------------------------------------------
# unit_tcn / mstcn / dgmstcn / ctr-mstcn
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("stride,dilation", [(1, 1), (2, 1), (1, 2), (2, 3)])
def test_unit_tcn(refops, stride, dilation):
    _, reftcn = refops
    ref = reftcn.unit_tcn(16, 24, kernel_size=9, stride=stride, dilation=dilation)
    tb.randomize_all_bns(ref, RNG)
    x = _x(c=16)
    params = {"conv": tb.tconv_p(ref.conv), "bn": tb.bn_p(ref.bn)}
    stats = {"bn": tb.bn_s(ref.bn)}
    our = UnitTCN(24, kernel_size=9, stride=stride, dilation=dilation)
    _compare(our, {"params": params, "batch_stats": stats}, ref, x)


def _ms_branch_vars(ref_branches, ms_cfg):
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
            params[f"branch{i}_tcn"] = {"conv": tb.tconv_p(br[3].conv)}
    return params, stats


@pytest.mark.parametrize("stride", [1, 2])
def test_mstcn(refops, stride):
    _, reftcn = refops
    ref = reftcn.mstcn(16, 24, stride=stride)
    tb.randomize_all_bns(ref, RNG)
    x = _x(c=16)
    ms_cfg = [(3, 1), (3, 2), (3, 3), (3, 4), ("max", 3), "1x1"]
    bp, bs = _ms_branch_vars(ref.branches, ms_cfg)
    params = {"branches": bp,
              "transform_bn": tb.bn_p(ref.transform[0]),
              "transform_conv": tb.dense_p(ref.transform[2]),
              "bn": tb.bn_p(ref.bn)}
    stats = {"branches": bs, "transform_bn": tb.bn_s(ref.transform[0]),
             "bn": tb.bn_s(ref.bn)}
    our = MSTCN(24, stride=stride)
    _compare(our, {"params": params, "batch_stats": stats}, ref, x)


@pytest.mark.parametrize("stride", [1, 2])
def test_dgmstcn(refops, stride):
    _, reftcn = refops
    ref = reftcn.dgmstcn(16, 24, stride=stride)
    tb.randomize_all_bns(ref, RNG)
    with torch.no_grad():
        ref.add_coeff.copy_(torch.tensor(RNG.standard_normal(25), dtype=torch.float32))
    x = _x(c=16)
    ms_cfg = [(3, 1), (3, 2), (3, 3), (3, 4), ("max", 3), "1x1"]
    bp, bs = _ms_branch_vars(ref.branches, ms_cfg)
    params = {"branches": bp, "add_coeff": jnp.asarray(tb.t2n(ref.add_coeff)),
              "transform_bn": tb.bn_p(ref.transform[0]),
              "transform_conv": tb.dense_p(ref.transform[2]),
              "bn": tb.bn_p(ref.bn)}
    stats = {"branches": bs, "transform_bn": tb.bn_s(ref.transform[0]),
             "bn": tb.bn_s(ref.bn)}
    our = DGMSTCN(24, stride=stride)
    _compare(our, {"params": params, "batch_stats": stats}, ref, x)


@pytest.mark.parametrize("stride", [1, 2])
def test_ctr_mstcn(stride):
    msg3d = ref_loader.load_ref_msg3d()
    ref = msg3d.MSTCN(16, 24, kernel_size=5, stride=stride, dilations=[1, 2],
                      residual=False)
    tb.randomize_all_bns(ref, RNG)
    x = _x(c=16)
    params, stats = {}, {}
    for i in range(2):
        br = ref.branches[i]
        params[f"branch{i}_pre"] = tb.dense_p(br[0])
        params[f"branch{i}_bn"] = tb.bn_p(br[1])
        stats[f"branch{i}_bn"] = tb.bn_s(br[1])
        params[f"branch{i}_tcn"] = {"conv": tb.tconv_p(br[3].conv),
                                    "bn": tb.bn_p(br[3].bn)}
        stats[f"branch{i}_tcn"] = {"bn": tb.bn_s(br[3].bn)}
    br = ref.branches[2]
    params["branch2_pre"] = tb.dense_p(br[0])
    params["branch2_bn"] = tb.bn_p(br[1])
    stats["branch2_bn"] = tb.bn_s(br[1])
    params["branch2_bn2"] = tb.bn_p(br[4])
    stats["branch2_bn2"] = tb.bn_s(br[4])
    br = ref.branches[3]
    params["branch3_conv"] = {"conv": tb.tconv_p(br[0])["conv"]}
    params["branch3_bn"] = tb.bn_p(br[1])
    stats["branch3_bn"] = tb.bn_s(br[1])
    our = CTRMSTCN(24, kernel_size=5, stride=stride, dilations=(1, 2),
                   residual=False)
    _compare(our, {"params": params, "batch_stats": stats}, ref, x)


# ---------------------------------------------------------------------------
# unit_aagcn
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("adaptive,attention", [(True, True), (True, False),
                                                (False, True)])
def test_unit_aagcn(refops, adaptive, attention):
    refgcn, _ = refops
    A = Graph(layout="nturgb+d", mode="spatial").A.astype(np.float32)
    ref = refgcn.unit_aagcn(16, 32, torch.tensor(A), adaptive=adaptive,
                            attention=attention)
    tb.randomize_all_bns(ref, RNG)
    with torch.no_grad():
        if adaptive:
            ref.alpha.copy_(torch.tensor([0.37]))
        if attention:
            # give attention convs non-zero weights so the path is exercised
            torch.nn.init.normal_(ref.conv_ta.weight, 0, 0.1)
            torch.nn.init.normal_(ref.fc2c.weight, 0, 0.1)
    x = _x(c=16)

    params = {"bn": tb.bn_p(ref.bn), "down_conv": tb.dense_p(ref.down[0]),
              "down_bn": tb.bn_p(ref.down[1])}
    stats = {"bn": tb.bn_s(ref.bn), "down_bn": tb.bn_s(ref.down[1])}
    for i in range(3):
        params[f"conv_d{i}"] = tb.dense_p(ref.conv_d[i])
    if adaptive:
        params["A"] = jnp.asarray(tb.t2n(ref.A))
        params["alpha"] = jnp.asarray(tb.t2n(ref.alpha))
        for i in range(3):
            params[f"conv_a{i}"] = tb.dense_p(ref.conv_a[i])
            params[f"conv_b{i}"] = tb.dense_p(ref.conv_b[i])
    if attention:
        params["att"] = {"conv_sa": tb.conv1d_p(ref.conv_sa),
                         "conv_ta": tb.conv1d_p(ref.conv_ta),
                         "fc1c": tb.dense_p(ref.fc1c),
                         "fc2c": tb.dense_p(ref.fc2c)}
    our = UnitAAGCN(32, A_init=A, adaptive=adaptive, attention=attention)
    _compare(our, {"params": params, "batch_stats": stats}, ref, x)


# ---------------------------------------------------------------------------
# CTRGC / unit_ctrgcn
# ---------------------------------------------------------------------------

def test_ctrgc(refops):
    refgcn, _ = refops
    ref = refgcn.CTRGC(32, 48)
    x = _x(c=32)
    A = Graph(layout="nturgb+d", mode="spatial").A.astype(np.float32)[1]
    params = {f"conv{i}": tb.dense_p(getattr(ref, f"conv{i}")) for i in (1, 2, 3, 4)}
    ref.eval()
    with torch.no_grad():
        want = tb.from_nctv(ref(torch.tensor(tb.to_nctv(x)), torch.tensor(A), 0.63))
    our = CTRGC(32, 48)
    got = np.asarray(our.apply({"params": params}, jnp.asarray(x),
                               jnp.asarray(A), 0.63))
    np.testing.assert_allclose(got, want, **TOL)


def test_unit_ctrgcn(refops):
    refgcn, _ = refops
    A = Graph(layout="nturgb+d", mode="spatial").A.astype(np.float32)
    ref = refgcn.unit_ctrgcn(16, 32, torch.tensor(A))
    tb.randomize_all_bns(ref, RNG)
    with torch.no_grad():
        ref.alpha.copy_(torch.tensor([0.41]))
    x = _x(c=16)
    params = {"A": jnp.asarray(tb.t2n(ref.A)),
              "alpha": jnp.asarray(tb.t2n(ref.alpha)),
              "bn": tb.bn_p(ref.bn),
              "down_conv": tb.dense_p(ref.down[0]),
              "down_bn": tb.bn_p(ref.down[1])}
    stats = {"bn": tb.bn_s(ref.bn), "down_bn": tb.bn_s(ref.down[1])}
    for i in range(3):
        params[f"convs{i}"] = {f"conv{j}": tb.dense_p(getattr(ref.convs[i], f"conv{j}"))
                               for j in (1, 2, 3, 4)}
    our = UnitCTRGCN(16, 32, A_init=A)
    _compare(our, {"params": params, "batch_stats": stats}, ref, x)


# ---------------------------------------------------------------------------
# dggcn / dgphgcn1
# ---------------------------------------------------------------------------

def _dg_common_vars(ref):
    params = {"A": jnp.asarray(tb.t2n(ref.A)),
              "alpha": jnp.asarray(tb.t2n(ref.alpha)),
              "beta": jnp.asarray(tb.t2n(ref.beta)),
              "pre_conv": tb.dense_p(ref.pre[0]),
              "pre_bn": tb.bn_p(ref.pre[1]),
              "post_conv": tb.dense_p(ref.post),
              "bn": tb.bn_p(ref.bn),
              "down_conv": tb.dense_p(ref.down[0]),
              "down_bn": tb.bn_p(ref.down[1])}
    stats = {"pre_bn": tb.bn_s(ref.pre[1]), "bn": tb.bn_s(ref.bn),
             "down_bn": tb.bn_s(ref.down[1])}
    if hasattr(ref, "conv1"):
        params["conv1"] = tb.dense_p(ref.conv1)
        params["conv2"] = tb.dense_p(ref.conv2)
    return params, stats


@pytest.mark.parametrize("ctr,ada", [("T", "T"), ("T", None), (None, "T"),
                                     ("NA", "T"), ("T", "NA"), (None, None)])
@pytest.mark.parametrize("subset_wise", [False, True])
def test_dggcn(refops, ctr, ada, subset_wise):
    refgcn, _ = refops
    A = Graph(layout="nturgb+d", mode="random", seed=3).A.astype(np.float32)
    ref = refgcn.dggcn(16, 32, torch.tensor(A), ctr=ctr, ada=ada,
                       subset_wise=subset_wise)
    tb.randomize_all_bns(ref, RNG)
    with torch.no_grad():
        ref.alpha.copy_(torch.tensor(RNG.uniform(-0.5, 0.5, 3), dtype=torch.float32))
        ref.beta.copy_(torch.tensor(RNG.uniform(-0.5, 0.5, 3), dtype=torch.float32))
    x = _x(c=16)
    params, stats = _dg_common_vars(ref)
    our = DGGCN(32, A_init=A, ctr=ctr, ada=ada, subset_wise=subset_wise)
    _compare(our, {"params": params, "batch_stats": stats}, ref, x)


def _dgph_ref(refgcn, **kw):
    g = Graph(layout="nturgb+d", mode="random", seed=5)
    A = g.A.astype(np.float32)
    ref = refgcn.dgphgcn1(16, 32, torch.tensor(A),
                          torch.tensor(g.edge_type, dtype=torch.float32),
                          torch.tensor(np.array(g.node_type)), ratio=0.25, **kw)
    return g, A, ref


@pytest.mark.parametrize("kw", [
    dict(),                                     # plain dggcn-equivalent path
    dict(decompose=True),
    dict(decompose=True, node_attention=True),
    dict(decompose=True, node_attention=True, edge_attention=True),
    dict(decompose=True, node_attention=True, edge_attention=True,
         target_specific=True),
    dict(decompose=True, edge_attention=True, ada_attention=True),
    dict(decompose=True, node_attention=True, edge_attention=True, sub_att=False),
    dict(decompose=True, node_attention=True, stage=False),
    dict(subset_wise=False),
])
def test_dgphgcn1(refops, kw):
    refgcn, _ = refops
    g, A, ref = _dgph_ref(refgcn, **kw)
    tb.randomize_all_bns(ref, RNG)
    ngates = len(tb.t2n(ref.alpha))
    with torch.no_grad():
        ref.alpha.copy_(torch.tensor(RNG.uniform(-0.5, 0.5, ngates), dtype=torch.float32))
        ref.beta.copy_(torch.tensor(RNG.uniform(-0.5, 0.5, ngates), dtype=torch.float32))
    x = _x(c=16)

    params = {"A": jnp.asarray(tb.t2n(ref.A)),
              "alpha": jnp.asarray(tb.t2n(ref.alpha)),
              "beta": jnp.asarray(tb.t2n(ref.beta)),
              "post_conv": tb.dense_p(ref.post),
              "bn": tb.bn_p(ref.bn),
              "down_conv": tb.dense_p(ref.down[0]),
              "down_bn": tb.bn_p(ref.down[1]),
              "conv1": tb.dense_p(ref.conv1),
              "conv2": tb.dense_p(ref.conv2)}
    stats = {"bn": tb.bn_s(ref.bn), "down_bn": tb.bn_s(ref.down[1])}
    params["pre_conv"] = tb.dense_p(ref.pre[0])
    params["pre_bn"] = tb.bn_p(ref.pre[1])
    stats["pre_bn"] = tb.bn_s(ref.pre[1])
    if hasattr(ref, "conv1_se"):
        params["conv1_se"] = tb.dense_p(ref.conv1_se)
    if hasattr(ref, "nodeconv"):
        params["nodeconv_conv"] = tb.dense_p(ref.nodeconv[0])
        params["nodeconv_bn"] = tb.bn_p(ref.nodeconv[1])
        stats["nodeconv_bn"] = tb.bn_s(ref.nodeconv[1])
    if hasattr(ref, "edge_linears"):
        params["edge_linears"] = tb.dense_p(ref.edge_linears)
    if hasattr(ref, "ada_linears"):
        params["ada_linears"] = tb.dense_p(ref.ada_linears)

    our = DGPHGCN1(32, A_init=A, edge_type=g.edge_type,
                   node_type=np.array(g.node_type), ratio=0.25, **kw)
    _compare(our, {"params": params, "batch_stats": stats}, ref, x)
