"""GCGCN Granger-causality backbone parity (reference gcgcn.py:10-45,
causal_GC.py gc_sparse :376-618)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_loader
import torch_bridge as tb
from dsgcn_tpu.models.builder import build_backbone

RNG = np.random.default_rng(29)


@pytest.fixture(scope="module")
def refmod():
    return ref_loader.load_ref_gcn_module("gcgcn")


def _conv1d_w(conv):
    return tb.t2n(conv.weight), tb.t2n(conv.bias)


def _gc_sparse_vars(net):
    params, stats = {}, {}
    for i, bank in enumerate(net.branches):
        ws = np.stack([tb.t2n(c.weight) for c in bank])      # (V, mid, V, k)
        bs = np.stack([tb.t2n(c.bias) for c in bank])        # (V, mid)
        params[f"branch{i}_w"] = jnp.asarray(ws)
        params[f"branch{i}_b"] = jnp.asarray(bs)
    fw = np.stack([tb.t2n(c.weight)[0, :, 0] for c in net.branches_follow])
    fb = np.stack([tb.t2n(c.bias)[0] for c in net.branches_follow])
    params["follow_w"] = jnp.asarray(fw)
    params["follow_b"] = jnp.asarray(fb)
    for i, seq in enumerate(net.feature_branches):
        params[f"feature{i}_conv"] = tb.dense_p(seq[0])
        params[f"feature{i}_bn"] = tb.bn_p(seq[1])
        stats[f"feature{i}_bn"] = tb.bn_s(seq[1])
    for i, seq in enumerate(net.Causal_branches):
        w, b = _conv1d_w(seq[0])
        params[f"causal{i}_conv"] = {"kernel": jnp.asarray(w[:, :, 0].T),
                                     "bias": jnp.asarray(b)}
        params[f"causal{i}_bn"] = tb.bn_p(seq[1])
        stats[f"causal{i}_bn"] = tb.bn_s(seq[1])
    return params, stats


def test_gcgcn_backbone_parity(refmod):
    """Weight-copied outputs: prediction MSE map, GC matrix, GSGL penalty.

    The committed GCGCN default time_serious=9 is unusable for 25 joints
    (Conv1d bank in_channels must equal V, causal_GC.py:411 vs gcgcn.py:20);
    time_serious=25 is the working configuration tested here."""
    torch.manual_seed(0)
    with pytest.raises(RuntimeError):
        bad = refmod.GCGCN()     # time_serious=9 default
        bad(torch.zeros(1, 2, 10, 25, 3))

    ref = refmod.GCGCN(time_serious=25)
    tb.randomize_all_bns(ref, RNG)
    ref.eval()

    our = build_backbone(dict(type="GCGCN"))
    params, stats = _gc_sparse_vars(ref.net)
    variables = {"params": {"net": params}, "batch_stats": {"net": stats}}

    x = RNG.standard_normal((1, 2, 10, 25, 3)).astype(np.float32)
    with torch.no_grad():
        want_loss, want_gc, want_pen = ref(
            torch.tensor(np.ascontiguousarray(x)))
    got_loss, got_gc, got_pen = our.apply(variables, jnp.asarray(x),
                                          train=False)
    np.testing.assert_allclose(np.asarray(got_loss), tb.t2n(want_loss),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_gc), tb.t2n(want_gc),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(got_pen), float(want_pen), rtol=1e-4)


def test_gc_gcn_op_is_dead_code():
    """causal_GC.gc_gcn (276-375) is unconstructible: references undefined
    ``mid_channels`` in __init__ (causal_GC.py:291)."""
    gcmod = ref_loader.load_ref_ops()  # loads refops package
    import importlib
    causal = importlib.import_module("refops.causal_GC")
    with pytest.raises(NameError):
        causal.gc_gcn(16, 32)


def test_gcgcn_component_parity():
    """gc_component VAR-attention Granger learner, weight-copied parity
    (causal_GC.py:619-842, gcgcn_componen.py:10-50)."""
    import importlib
    ref_loader.load_ref_gcn_module("gcgcn")
    refmod = importlib.import_module("refpyskl.models.gcns.gcgcn_componen")
    torch.manual_seed(0)
    ref = refmod.GCGCN_component()
    tb.randomize_all_bns(ref, RNG)
    ref.eval()
    net = ref.net

    our = build_backbone(dict(type="GCGCN_component"))
    params, stats = {}, {}
    for i, seq in enumerate(net.feature_branches):
        params[f"feature{i}_conv"] = tb.dense_p(seq[0])
        params[f"feature{i}_bn"] = tb.bn_p(seq[1])
        stats[f"feature{i}_bn"] = tb.bn_s(seq[1])
    params["conv1"] = tb.dense_p(net.conv1)
    params["conv2"] = tb.dense_p(net.conv2)
    params["weight"] = jnp.asarray(tb.t2n(net.weight))
    consts = {"weight_norm": jnp.asarray(tb.t2n(net.weight_norm))}
    cc = net.causal_channel
    for j, conv in enumerate(net.follow_branches):
        w = tb.t2n(conv.weight)      # (V*out, in, 1)
        b = tb.t2n(conv.bias)
        out = w.shape[0] // 25
        params[f"follow{j}_w"] = jnp.asarray(
            w[:, :, 0].reshape(25, out, w.shape[1]))
        params[f"follow{j}_b"] = jnp.asarray(b.reshape(25, out))

    x = RNG.standard_normal((1, 2, 20, 25, 3)).astype(np.float32)
    with torch.no_grad():
        want_gc, want_loss, want_pen, want_ridge = ref(
            torch.tensor(np.ascontiguousarray(x)))
    got_gc, got_loss, got_pen, got_ridge = our.apply(
        {"params": params, "batch_stats": stats, "constants": consts},
        jnp.asarray(x), train=False)
    np.testing.assert_allclose(np.asarray(got_gc), tb.t2n(want_gc),
                               rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-3)
    np.testing.assert_allclose(float(got_pen), float(want_pen), rtol=1e-4)
    np.testing.assert_allclose(float(got_ridge), float(want_ridge), rtol=1e-4)
