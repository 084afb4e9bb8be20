"""MS-G3D op/backbone parity vs reference + SGN smoke/shape tests."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_loader
import torch_bridge as tb
from dsgcn_tpu.graph import Graph
from dsgcn_tpu.ops.msg3d import (MSGCN, MWMSG3DBlock, multi_scale_adjacency,
                                 unfold_temporal_windows)

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def msg3d_ref():
    return ref_loader.load_ref_msg3d()


def _x(n=2, t=12, v=25, c=8):
    return RNG.standard_normal((n, t, v, c)).astype(np.float32)


def test_multi_scale_adjacency_matches(msg3d_ref):
    g = Graph(layout="nturgb+d", mode="binary_adj")
    A = g.A[0]
    ref = msg3d_ref.MSGCN(5, 8, 16, torch.tensor(A, dtype=torch.float32))
    ours = multi_scale_adjacency(A, 5)
    np.testing.assert_allclose(ours, tb.t2n(ref.A), rtol=1e-6, atol=1e-7)


def test_unfold_temporal_windows_matches(msg3d_ref):
    x = _x()
    ref = msg3d_ref.UnfoldTemporalWindows(window_size=3, window_stride=2)
    want = tb.t2n(ref(torch.tensor(tb.to_nctv(x))))     # (N, C, NW, 3*V)
    got = np.asarray(unfold_temporal_windows(jnp.asarray(x), 3, 2))
    got_nctv = np.transpose(got, (0, 3, 1, 2))
    np.testing.assert_allclose(got_nctv, want, rtol=1e-6, atol=0)


def test_msgcn_parity(msg3d_ref):
    g = Graph(layout="nturgb+d", mode="binary_adj")
    A = torch.tensor(g.A[0], dtype=torch.float32)
    ref = msg3d_ref.MSGCN(5, 8, 16, A)
    tb.randomize_all_bns(ref, RNG)
    with torch.no_grad():
        ref.PA.copy_(torch.tensor(
            RNG.standard_normal(tuple(ref.PA.shape)) * 0.01, dtype=torch.float32))
    x = _x()
    ours = MSGCN(5, 16, g.A[0].astype(np.float32))
    params = {"PA": jnp.asarray(tb.t2n(ref.PA)),
              "mlp": {"conv0": tb.dense_p(ref.mlp.layers[0]),
                      "bn0": tb.bn_p(ref.mlp.layers[1])}}
    stats = {"mlp": {"bn0": tb.bn_s(ref.mlp.layers[1])}}
    ref.eval()
    with torch.no_grad():
        want = tb.from_nctv(ref(torch.tensor(tb.to_nctv(x))))
    got = np.asarray(ours.apply({"params": params, "batch_stats": stats},
                                jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_msg3d_backbone_runs():
    from dsgcn_tpu.models.builder import build_named_model
    m = build_named_model("msg3d", num_classes=10)
    x = jnp.zeros((1, 2, 16, 25, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    assert m.apply(v, x, train=False).shape == (1, 10)


def test_sgn_backbone_runs_and_trains():
    from dsgcn_tpu.models.builder import build_named_model
    m = build_named_model("sgn", num_classes=10)
    x = jnp.asarray(RNG.standard_normal((2, 2, 30, 25, 3)).astype(np.float32))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    out = m.apply(v, x, train=False)
    assert out.shape == (2, 10)
    out2, muts = m.apply(v, x, train=True, mutable=["batch_stats"],
                         rngs={"dropout": jax.random.PRNGKey(1)})
    assert out2.shape == (2, 10)
