"""SMoEAssemble_sparse parity (reference pyskl/pyskl/models/gcns/SMoE.py).

Covers: noisy top-k gating math (clean + injected-noise paths, the
differentiable _prob_in_top_k load), cv^2 balancing losses, the
dispatcher-vs-dense-combine equivalence our static-shape reformulation
rests on, full eval-mode forward parity with weight-copied experts, and
regularize (GSGL with the double-append quirk).
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_loader
import torch_bridge as tb
from test_nested_sparse import (_randomize, _sparse_dense, _sparse_tconv,
                                _unit_tcn_params)
from dsgcn_tpu.graph import GraphConfig
from dsgcn_tpu.sparse.smoe import (NoisyTopKGate, SMoEAssembleSparse,
                                   cv_squared, smoe_regularize)
from flax.core import FrozenDict

RNG = np.random.default_rng(45)
STAGES = dict(num_stages=3, inflate_stages=[3], down_stages=[3])
RATIOS = (0.4, 0.5, 0.4)
MODELS = ("ST-GCN", "CTR-GCN", "ST-GCN")


@pytest.fixture(scope="module")
def ref_smoe():
    nested = ref_loader.load_ref_nested_sparse()
    torch.manual_seed(0)
    smoe = nested["SMoE"].SMoEAssemble_sparse(
        dict(layout="nturgb+d", mode="spatial"), model_list=list(MODELS),
        sparse_ratio=list(RATIOS), warm_up=0, out_channel=128, k_num=1,
        noisy_gating=True, num_stages=3,
        ST_kwargs=dict(gcn_type="unit_gcn_sparse",
                       tcn_type="unit_tcn_sparse", **STAGES),
        CTR_kwargs=dict(gcn_type="unit_ctrgcn_sparse",
                        tcn_type="mstcn_sparse", **STAGES))
    _randomize(smoe)
    with torch.no_grad():
        smoe.w_gate.copy_(torch.tensor(
            RNG.standard_normal((128, 2)).astype(np.float32)))
        smoe.w_noise.copy_(torch.tensor(
            RNG.uniform(0.1, 0.5, (128, 2)).astype(np.float32)))
    return smoe


def test_cv_squared_parity(ref_smoe):
    for arr in (np.array([3.0, 1.0]), np.array([0.5]),
                RNG.uniform(0, 4, 7).astype(np.float32)):
        want = float(ref_smoe.cv_squared(torch.tensor(arr)))
        got = float(cv_squared(jnp.asarray(arr)))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def _gate_params(ref_smoe):
    return {"w_gate": jnp.asarray(tb.t2n(ref_smoe.w_gate)),
            "w_noise": jnp.asarray(tb.t2n(ref_smoe.w_noise))}


def test_gate_eval_parity(ref_smoe):
    ref_smoe.eval()
    feat = RNG.standard_normal((6, 128)).astype(np.float32)
    gates_t, load_t = ref_smoe.noisy_top_k_gating(torch.tensor(feat), False)
    gate = NoisyTopKGate(num_experts=2, k=1, noisy_gating=True)
    gates, load = gate.apply({"params": _gate_params(ref_smoe)},
                             jnp.asarray(feat), train=False)
    np.testing.assert_allclose(np.asarray(gates), tb.t2n(gates_t),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(load), tb.t2n(load_t.float()))


def test_gate_train_noisy_parity(ref_smoe, monkeypatch):
    """Same injected noise -> same noisy logits, gates, and the
    differentiable load from _prob_in_top_k (SMoE.py:206-283)."""
    ref_smoe.train()
    feat = RNG.standard_normal((6, 128)).astype(np.float32)
    noise = RNG.standard_normal((6, 2)).astype(np.float32)
    monkeypatch.setattr(torch, "randn_like",
                        lambda t: torch.tensor(noise))
    gates_t, load_t = ref_smoe.noisy_top_k_gating(torch.tensor(feat), True)
    gate = NoisyTopKGate(num_experts=2, k=1, noisy_gating=True)
    gates, load = gate.apply({"params": _gate_params(ref_smoe)},
                             jnp.asarray(feat), train=True,
                             noise=jnp.asarray(noise))
    np.testing.assert_allclose(np.asarray(gates), tb.t2n(gates_t),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(load), tb.t2n(load_t),
                               rtol=1e-5, atol=1e-6)
    ref_smoe.eval()


def test_dispatcher_vs_dense_combine(ref_smoe):
    """Our static-shape combine (all experts on the full batch, gate-weighted
    sum) equals the reference SparseDispatcher dispatch->combine
    (SMoE.py:17-113) for any gate matrix."""
    nested = ref_loader.load_ref_nested_sparse()
    SD = nested["SMoE"].SparseDispatcher
    E, N, D, C = 3, 8, 5, 4
    gates_np = np.zeros((N, E), np.float32)
    for i in range(N):                       # k=2 routing with random gates
        idx = RNG.choice(E, size=2, replace=False)
        w = RNG.uniform(0.2, 1.0, 2).astype(np.float32)
        gates_np[i, idx] = w / w.sum()
    W = [RNG.standard_normal((D, C)).astype(np.float32) for _ in range(E)]
    x = RNG.standard_normal((N, D)).astype(np.float32)

    disp = SD(E, torch.tensor(gates_np))
    xin = disp.dispatch(torch.tensor(x))
    outs = [torch.tensor(xin[e].numpy() @ W[e]) for e in range(E)]
    want = disp.combine(outs).detach().numpy()

    dense = sum(gates_np[:, e:e + 1] * (x @ W[e]) for e in range(E))
    np.testing.assert_allclose(dense, want, rtol=1e-5, atol=1e-6)


def _stgcn_expert_vars(ref):
    import torch.nn as nn
    params = {"data_bn": {"bn": tb.plain_bn_p(ref.data_bn)}}
    stats = {"data_bn": {"bn": tb.plain_bn_s(ref.data_bn)}}
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
    return params, stats


def _ctrgcn_expert_vars(ref):
    import torch.nn as nn
    from test_nested_sparse import _mstcn_params
    params = {"data_bn": {"bn": tb.plain_bn_p(ref.data_bn)}}
    stats = {"data_bn": {"bn": tb.plain_bn_s(ref.data_bn)}}
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
        tp, ts = _mstcn_params(blk.tcn1)
        bp, bs = {"gcn1": gp, "tcn1": tp}, {"gcn1": gs, "tcn1": ts}
        if isinstance(blk.residual, nn.Module):
            bp["residual"] = _sparse_tconv(blk.residual.conv)
            bp["residual_bn"] = tb.bn_p(blk.residual.bn)
            bs["residual_bn"] = tb.bn_s(blk.residual.bn)
        params[f"block{i}"], stats[f"block{i}"] = bp, bs
    return params, stats


def _our_smoe():
    return SMoEAssembleSparse(
        model_list=MODELS, sparse_ratio=RATIOS,
        graph_cfg=GraphConfig(layout="nturgb+d", mode="spatial"),
        expert_kwargs=FrozenDict({
            "ST-GCN": dict(num_stages=3, inflate_stages=(3,),
                           down_stages=(3,)),
            "CTR-GCN": dict(num_stages=3, inflate_stages=(3,),
                            down_stages=(3,))}),
        out_channel=128, k_num=1, noisy_gating=True)


def _copy_smoe_vars(ref_smoe):
    params, stats = {"gate": _gate_params(ref_smoe)}, {}
    for j, fam in enumerate(MODELS):
        expert = ref_smoe.experts[j]
        if fam == "ST-GCN":
            p, s = _stgcn_expert_vars(expert)
        else:
            p, s = _ctrgcn_expert_vars(expert)
        params[f"expert{j}"], stats[f"expert{j}"] = p, s
    return {"params": params, "batch_stats": stats}


def test_smoe_eval_forward_parity(ref_smoe):
    """Full SMoE eval forward: pooled combined feature AND the balancing
    loss match the reference dispatcher pipeline exactly."""
    ref_smoe.eval()
    x = RNG.standard_normal((6, 2, 8, 25, 3)).astype(np.float32)
    with torch.no_grad():
        want_y, want_loss = ref_smoe(torch.tensor(x), 5, 10)
    variables = _copy_smoe_vars(ref_smoe)
    got_y, got_loss = _our_smoe().apply(
        variables, jnp.asarray(x), 5, 10, train=False)
    scale = max(1.0, float(np.abs(tb.t2n(want_y)).max()))
    np.testing.assert_allclose(np.asarray(got_y), tb.t2n(want_y),
                               rtol=2e-3, atol=1e-4 * scale)
    np.testing.assert_allclose(float(got_loss), float(want_loss),
                               rtol=1e-4, atol=1e-7)


def test_smoe_regularize_parity(ref_smoe):
    """GSGL regularizer over pruned (inverted-mask) weights incl. the
    try/except/else double-append for .gcn-attribute experts
    (SMoE.py:341-400)."""
    want = float(ref_smoe.regularize(0.7, "GSGL", 5, 10))
    variables = _copy_smoe_vars(ref_smoe)
    got = float(smoe_regularize(variables["params"], MODELS, RATIOS,
                                lam=0.7, penalty="GSGL"))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_smoe_train_step_smoke():
    """One SGD step through gates + experts decreases a toy loss; gate
    params receive gradients through the noisy routing."""
    import optax
    model = _our_smoe()
    x = jnp.asarray(RNG.standard_normal((4, 2, 8, 25, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, 0, 10, train=False)
    params, stats = variables["params"], variables["batch_stats"]
    y = jnp.asarray(RNG.standard_normal((4, 128)).astype(np.float32))

    def loss_fn(p):
        (feat, aux), upd = model.apply(
            {"params": p, "batch_stats": stats}, x, 5, 10, train=True,
            rng=jax.random.PRNGKey(1), mutable=["batch_stats"])
        return ((feat - y) ** 2).mean() + aux, upd

    (l0, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    gnorm = float(sum(jnp.abs(g).sum() for g in
                      jax.tree_util.tree_leaves(grads["gate"])))
    assert gnorm > 0, "noisy gating must backprop into w_gate/w_noise"
    tx = optax.sgd(1e-3)
    upd, _ = tx.update(grads, tx.init(params))
    (l1, _), _ = jax.value_and_grad(loss_fn, has_aux=True)(
        optax.apply_updates(params, upd))
    assert float(l1) < float(l0)


def test_smoe_expert_parallel_matches_dense():
    """EP eval (one expert per device, psum combine) == the dense
    single-device path, on a 2-device expert mesh (homogeneous experts)."""
    from dsgcn_tpu.parallel.expert_parallel import (make_ep_smoe_eval,
                                                    make_expert_mesh)
    model = SMoEAssembleSparse(
        model_list=("ST-GCN", "ST-GCN", "ST-GCN"),
        sparse_ratio=(0.4, 0.4, 0.4),
        graph_cfg=GraphConfig(layout="nturgb+d", mode="spatial"),
        expert_kwargs=FrozenDict({"ST-GCN": dict(
            num_stages=3, inflate_stages=(3,), down_stages=(3,))}),
        out_channel=128, k_num=1)
    x = jnp.asarray(RNG.standard_normal((4, 2, 8, 25, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, 0, 10, train=False)
    # non-trivial gating + distinct experts
    params = jax.device_get(variables["params"])
    params["gate"]["w_gate"] = jnp.asarray(
        RNG.standard_normal((128, 2)).astype(np.float32))
    kp = params["expert1"]["block1"]["gcn"]["conv"]["kernel"]
    params["expert1"]["block1"]["gcn"]["conv"]["kernel"] = kp + 0.05
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    want_y, want_aux = model.apply(variables, x, 5, 10, train=False)
    mesh = make_expert_mesh(2)
    got_y, got_aux = make_ep_smoe_eval(mesh, model)(variables, x, 5, 10)
    np.testing.assert_allclose(np.asarray(got_y), np.asarray(want_y),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(got_aux), float(want_aux), rtol=1e-5)


def test_smoe_recognizer_flow():
    """End-to-end SMoE training objective (RecognizerGCN_sMoE.py:22-70):
    backbone -> ClsHead -> CE + gating balance loss + warmup-gated GSGL
    penalty with the gradual lam ramp."""
    from dsgcn_tpu.core.flows import smoe_recognizer_losses
    from dsgcn_tpu.models.heads import ClsHead

    model = _our_smoe()
    x = jnp.asarray(RNG.standard_normal((4, 2, 8, 25, 3)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, 0, 10, train=False)
    head = ClsHead(num_classes=5, in_channels=128, dropout=0.0)
    feat0 = jnp.zeros((1, 128))
    hv = head.init(jax.random.PRNGKey(1), feat0, train=False)
    labels = jnp.asarray(RNG.integers(0, 5, size=4))

    feat, aux = model.apply(variables, x, 2, 10, train=True,
                            rng=jax.random.PRNGKey(2),
                            mutable=["batch_stats"])[0]
    logits = head.apply(hv, feat, train=False)
    pen = smoe_regularize(variables["params"], MODELS, RATIOS, lam=1.0)

    # inside warmup: gradual lam = 2/4
    losses = smoe_recognizer_losses(logits, labels, aux, current_epoch=2,
                                    warm_up=4, penalty_value=pen)
    np.testing.assert_allclose(float(losses["panelty_loss"]),
                               0.5 * float(pen), rtol=1e-6)
    assert float(losses["loss"]) == pytest.approx(
        float(losses["loss_cls"]) + float(losses["important_loss"])
        + float(losses["panelty_loss"]), rel=1e-6)

    # past warmup: no penalty term
    losses = smoe_recognizer_losses(logits, labels, aux, current_epoch=7,
                                    warm_up=4, penalty_value=pen)
    assert "panelty_loss" not in losses and np.isfinite(float(losses["loss"]))
