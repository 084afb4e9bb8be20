"""CausalNeck + cMLP parity (reference necks/Causal_neck.py:16-130,
causalnn.py:8-131)."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_loader
import torch_bridge as tb
from dsgcn_tpu.models.necks import CMLP, CausalNeck

RNG = np.random.default_rng(33)
NT = [0, 0, 0, 0, 1, 1, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 0, 1, 1,
      2, 2]


@pytest.fixture(scope="module")
def refnecks():
    return ref_loader.load_ref_necks()


def _causal_neck_vars(ref):
    params = {"fc_cls": tb.dense_p(ref.fc_cls)}
    l0w = np.stack([tb.t2n(net.layers[0].weight)
                    for net in ref.cMLP.networks])     # (V, 100, V, lag)
    l0b = np.stack([tb.t2n(net.layers[0].bias) for net in ref.cMLP.networks])
    l1w = np.stack([tb.t2n(net.layers[1].weight)[:, :, 0]
                    for net in ref.cMLP.networks])     # (V, 1, 100)
    l1b = np.stack([tb.t2n(net.layers[1].bias) for net in ref.cMLP.networks])
    params["cMLP"] = {"l0_w": jnp.asarray(l0w), "l0_b": jnp.asarray(l0b),
                      "l1_w": jnp.asarray(l1w), "l1_b": jnp.asarray(l1b)}
    return params


def test_causal_neck_parity(refnecks):
    torch.manual_seed(0)
    ref = refnecks["causal"].CausalNeck(in_channels=16, mode="GCN", dropout=0)
    ref.eval()

    our = CausalNeck(in_channels=16)
    params = _causal_neck_vars(ref)
    variables = {"params": params}

    x = RNG.standard_normal((2, 2, 16, 20, 25)).astype(np.float32)  # NMCTV
    xt = torch.tensor(np.ascontiguousarray(x))
    x_cl = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))            # NMTVC

    # pooled forward
    with torch.no_grad():
        want_pooled, _ = ref(xt)
    got_pooled, _ = our.apply(variables, x_cl, train=False)
    np.testing.assert_allclose(np.asarray(got_pooled), tb.t2n(want_pooled),
                               rtol=1e-4, atol=1e-5)

    # node_precost
    with torch.no_grad():
        want_npc = ref.node_precost(xt, torch.tensor(NT))
    got_npc = our.apply(variables, x_cl, NT,
                        method=CausalNeck.node_precost)
    np.testing.assert_allclose(float(got_npc), float(want_npc), rtol=1e-4)

    # GcCost (cMLP smooth loss: per-joint MSE + ridge)
    with torch.no_grad():
        want_gc = ref.GcCost(xt, lam_ridge=1e-2)
    got_gc = our.apply(variables, x_cl, method=CausalNeck.gc_cost)
    np.testing.assert_allclose(float(got_gc), float(want_gc), rtol=2e-4)


def test_cmlp_gc_matrix(refnecks):
    """cMLP per-joint predictions match reference networks exactly."""
    torch.manual_seed(1)
    cmlp_ref = refnecks["causalnn"].cMLP(25, lag=9, hidden=[100])
    cmlp_ref.eval()

    l0w = np.stack([tb.t2n(n.layers[0].weight) for n in cmlp_ref.networks])
    l0b = np.stack([tb.t2n(n.layers[0].bias) for n in cmlp_ref.networks])
    l1w = np.stack([tb.t2n(n.layers[1].weight)[:, :, 0]
                    for n in cmlp_ref.networks])
    l1b = np.stack([tb.t2n(n.layers[1].bias) for n in cmlp_ref.networks])
    params = {"l0_w": jnp.asarray(l0w), "l0_b": jnp.asarray(l0b),
              "l1_w": jnp.asarray(l1w), "l1_b": jnp.asarray(l1b)}

    our = CMLP(25, lag=9, hidden=(100,))
    x = RNG.standard_normal((3, 30, 25)).astype(np.float32)
    with torch.no_grad():
        want = tb.t2n(cmlp_ref(torch.tensor(x)))      # (B, T', V)
    got = np.asarray(our.apply({"params": params}, jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("read_op", ["mean", "sum", "max"])
def test_pretrain_neck_parity(refnecks, read_op):
    """Hierarchical prototype readout parity (pre_train.py:86-123) with
    copied prototypes, plus the soft-min alignment cost (:185-240)."""
    from dsgcn_tpu.models.necks import PretrainNeck
    torch.manual_seed(0)
    ref = refnecks["pre_train"].PretrainNeck(
        in_channels=16, read_op=read_op, num_position=20)
    ref.eval()

    our = PretrainNeck(in_channels=16, num_position=20, read_op=read_op)
    params = {f"proto{i}": jnp.asarray(tb.t2n(p))
              for i, p in enumerate(ref.protos)}
    params["fc_cls"] = {"kernel": jnp.zeros((16, 5)),
                        "bias": jnp.zeros((5,))}
    variables = {"params": params}

    x = RNG.standard_normal((2, 2, 16, 4, 25)).astype(np.float32)  # NMCTV
    x_cl = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    with torch.no_grad():
        want = tb.t2n(ref(torch.tensor(np.ascontiguousarray(x))))
    got = np.asarray(our.apply(variables, x_cl, train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    with torch.no_grad():
        _, want_align = ref.get_aligncost(torch.tensor(
            np.ascontiguousarray(x)))
    got_align = our.apply(variables, x_cl,
                          method=PretrainNeck.get_aligncost)
    np.testing.assert_allclose(float(got_align), float(want_align),
                               rtol=2e-4)


def test_pretrain_neck_contrastive(refnecks):
    """intra/inter NCE losses (pre_train.py:128-157)."""
    from dsgcn_tpu.models.necks import PretrainNeck
    torch.manual_seed(0)
    ref = refnecks["pre_train"].PretrainNeck(
        in_channels=16, read_op="mean", num_position=20)
    our = PretrainNeck(in_channels=16, num_position=20)
    params = {f"proto{i}": jnp.asarray(tb.t2n(p))
              for i, p in enumerate(ref.protos)}
    params["fc_cls"] = {"kernel": jnp.zeros((16, 5)),
                        "bias": jnp.zeros((5,))}
    variables = {"params": params}

    x = RNG.standard_normal((2, 2, 16, 4, 25)).astype(np.float32)
    y = x + RNG.standard_normal(x.shape).astype(np.float32) * 0.1
    x_cl = jnp.asarray(np.transpose(x, (0, 1, 3, 4, 2)))
    y_cl = jnp.asarray(np.transpose(y, (0, 1, 3, 4, 2)))
    with torch.no_grad():
        want_intra = ref.get_intracost(torch.tensor(x), torch.tensor(y))
        want_inter = ref.get_intercost(torch.tensor(x), torch.tensor(y))
    got_intra = our.apply(variables, x_cl, y_cl,
                          method=PretrainNeck.get_intracost)
    got_inter = our.apply(variables, x_cl, y_cl,
                          method=PretrainNeck.get_intercost)
    np.testing.assert_allclose(float(got_intra), float(want_intra), rtol=2e-4)
    np.testing.assert_allclose(float(got_inter), float(want_inter), rtol=2e-4)


def test_gcnr_flow():
    """RecognizerGCNR loss assembly (recognizergcnR.py:22-52): CE + the
    PretrainNeck alignment cost, both parity-tested pieces."""
    import jax.numpy as jnp
    from dsgcn_tpu.core.flows import gcnr_losses
    logits = jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 5)).astype(np.float32))
    labels = jnp.asarray([0, 2, 1, 4])
    losses = gcnr_losses(logits, labels, jnp.float32(0.37))
    assert float(losses["loss"]) == pytest.approx(
        float(losses["loss_cls"]) + 0.37, rel=1e-6)
