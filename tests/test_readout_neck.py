"""ReadoutNeck prototype-assignment readout parity
(reference necks/greadout.py:15-157, gread.py:9-164).

Covers all five read_ops (sum/mean/max/attention/set2set) plus the soft-min
alignment cost at gamma=0.1 and the hard-min gamma=0 branch, in f64 so the
argmin prototype assignment cannot tie-break differently across frameworks.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_loader
import torch_bridge as tb
from dsgcn_tpu.models.necks import ReadoutNeck

RNG = np.random.default_rng(77)
N, M, C, T, V = 3, 2, 8, 5, 7
P = 6   # num_position


@pytest.fixture(scope="module")
def refnecks():
    return ref_loader.load_ref_necks()


@pytest.fixture(scope="module", autouse=True)
def _x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


def _make_pair(refnecks, read_op, gamma=0.1):
    torch.manual_seed(3)
    ref = refnecks["greadout"].ReadoutNeck(
        in_channels=C, read_op=read_op, num_position=P, gamma=gamma).double()
    ref.eval()

    params = {"protos": jnp.asarray(tb.t2n(ref.protos))}
    if read_op == "attention":
        params["gate"] = tb.dense_p(ref.gread.gate_nn)
    elif read_op == "set2set":
        lstm = ref.gread.lstm
        params["set2set"] = {
            "w_ih": jnp.asarray(tb.t2n(lstm.weight_ih_l0)),
            "w_hh": jnp.asarray(tb.t2n(lstm.weight_hh_l0)),
            "b_ih": jnp.asarray(tb.t2n(lstm.bias_ih_l0)),
            "b_hh": jnp.asarray(tb.t2n(lstm.bias_hh_l0)),
        }
    our = ReadoutNeck(in_channels=C, num_position=P, read_op=read_op,
                      gamma=gamma)
    return ref, our, {"params": params}


def _inputs():
    x = RNG.standard_normal((N, M, C, T, V))          # torch NMCTV
    xt = torch.tensor(np.ascontiguousarray(x))
    x_cl = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))   # ours NMTVC
    return xt, x_cl


@pytest.mark.parametrize("read_op",
                         ["sum", "mean", "max", "attention", "set2set"])
def test_forward_parity(refnecks, read_op):
    ref, our, variables = _make_pair(refnecks, read_op)
    xt, x_cl = _inputs()
    with torch.no_grad():
        want = ref(xt)
    got = our.apply(variables, x_cl, train=False)
    out_c = 2 * C if read_op == "set2set" else C
    assert got.shape == (N, out_c) == tuple(want.shape)
    np.testing.assert_allclose(np.asarray(got), tb.t2n(want),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("gamma", [0.1, 0.0])
def test_aligncost_parity(refnecks, gamma):
    ref, our, variables = _make_pair(refnecks, "mean", gamma=gamma)
    xt, x_cl = _inputs()
    with torch.no_grad():
        want = ref.get_aligncost(xt)
    got = our.apply(variables, x_cl, method=ReadoutNeck.get_aligncost)
    np.testing.assert_allclose(float(got), float(want), rtol=1e-10)


def test_empty_prototype_segments(refnecks):
    """Prototypes that attract no rows must pool to 0 (torch_scatter
    semantics), not nan/-inf — exercised by pushing all rows onto one
    prototype."""
    ref, our, variables = _make_pair(refnecks, "max")
    xt, x_cl = _inputs()
    # collapse: make one prototype overwhelmingly close to everything
    protos = np.array(variables["params"]["protos"])
    rows = np.asarray(x_cl.mean(axis=1).reshape(-1, C))
    protos[0] = rows.mean(axis=0) * 100.0
    variables = {"params": {**variables["params"],
                            "protos": jnp.asarray(protos)}}
    with torch.no_grad():
        ref.protos.data = torch.tensor(protos)
        want = ref(xt)
    got = our.apply(variables, x_cl, train=False)
    np.testing.assert_allclose(np.asarray(got), tb.t2n(want),
                               rtol=1e-10, atol=1e-12)
    assert np.isfinite(np.asarray(got)).all()


def test_neck_wired_through_builder():
    """config neck= must actually change the model output (build_model used
    to drop the key silently); head accepts the neck's pooled (N, C)."""
    from dsgcn_tpu.models.builder import build_model
    outs = {}
    for read_op in ["mean", "max"]:
        cfg = dict(
            type="RecognizerGCN",
            backbone=dict(type="STGCN",
                          graph_cfg=dict(layout="coco", mode="spatial"),
                          in_channels=3, base_channels=16, num_stages=2,
                          inflate_stages=[2], down_stages=[2]),
            neck=dict(type="ReadoutNeck", in_channels=32, read_op=read_op,
                      num_position=4),
            cls_head=dict(type="GCNHead", num_classes=5, in_channels=32))
        model = build_model(cfg)
        x = jnp.asarray(RNG.standard_normal((2, 2, 8, 17, 3)), jnp.float32)
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        assert "neck" in variables["params"]
        outs[read_op] = np.asarray(model.apply(variables, x, train=False))
        assert outs[read_op].shape == (2, 5)
    assert not np.allclose(outs["mean"], outs["max"])


def test_semantic_neck_parity(refnecks):
    """SemanticNeck index-weighted person pooling vs Simple_neck.py:179-190,
    with the index derived the way recognizergcn.py:34's (dead) dispatch
    would: x.sum(-1).sum(-1).sum(-1)."""
    from dsgcn_tpu.models.necks import SemanticNeck
    ref = refnecks["simple"].SemanticNeck(in_channels=C, mode="GCN",
                                          dropout=0).double()
    ref.eval()
    xt, x_cl = _inputs()
    index = xt.sum(-1).sum(-1).sum(-1)
    with torch.no_grad():
        want = ref(xt, index)
    our = SemanticNeck(in_channels=C, dropout=0)
    variables = our.init(jax.random.PRNGKey(0), x_cl, train=False)
    got = our.apply(variables, x_cl, train=False)       # index=None derives
    np.testing.assert_allclose(np.asarray(got), tb.t2n(want),
                               rtol=1e-10, atol=1e-12)
