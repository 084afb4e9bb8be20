"""Fused eval-mode dgmstcn Pallas kernel vs the XLA module path (which is
itself reference-parity-tested in test_models_parity / test_transforms)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsgcn_tpu.ops.tcn import DGMSTCN, MSTCN

RNG = np.random.default_rng(7)


def _vars(mod, x):
    v = mod.init(jax.random.PRNGKey(0), x, train=False)
    # randomize params AND running stats so every BN fold is non-trivial
    v = jax.tree.map(
        lambda p: jnp.asarray(
            (RNG.standard_normal(p.shape) * 0.5
             + (1.0 if p.ndim == 1 else 0.0)).astype(np.float32)), v)
    return {"params": v["params"],
            "batch_stats": jax.tree.map(lambda s: jnp.abs(s) + 0.1,
                                        v["batch_stats"])}


@pytest.mark.parametrize("stride,channels,T", [(1, 64, 20), (2, 128, 21),
                                               (1, 256, 7)])
def test_fused_dgmstcn_matches_module(stride, channels, T):
    x = jnp.asarray(RNG.standard_normal((3, T, 25, channels))
                    .astype(np.float32))
    a = DGMSTCN(out_channels=channels, stride=stride)
    b = DGMSTCN(out_channels=channels, stride=stride, use_pallas=True,
                pallas_interpret=True)
    v = _vars(a, x)
    ya = a.apply(v, x, train=False)
    yb = b.apply(v, x, train=False)
    assert ya.shape == yb.shape
    scale = float(jnp.max(jnp.abs(ya))) + 1e-9
    err = float(jnp.max(jnp.abs(ya - yb))) / scale
    assert err < 2e-6, err          # fused path computes in f32 throughout


@pytest.mark.parametrize("stride", [1, 2])
def test_fused_mstcn_matches_module(stride):
    """Plain MSTCN (stgcn++ family): same fused region minus the global
    joint (coeff=None path)."""
    x = jnp.asarray(RNG.standard_normal((3, 18, 25, 96)).astype(np.float32))
    a = MSTCN(out_channels=96, stride=stride)
    b = MSTCN(out_channels=96, stride=stride, use_pallas=True,
              pallas_interpret=True)
    v = _vars(a, x)
    ya = a.apply(v, x, train=False)
    yb = b.apply(v, x, train=False)
    assert ya.shape == yb.shape
    scale = float(jnp.max(jnp.abs(ya))) + 1e-9
    err = float(jnp.max(jnp.abs(ya - yb))) / scale
    assert err < 2e-6, err


def test_fused_dgmstcn_train_falls_back():
    """Training must take the XLA path (batch stats are cross-sample):
    batch_stats mutate identically with and without the flag."""
    x = jnp.asarray(RNG.standard_normal((4, 8, 25, 32)).astype(np.float32))
    a = DGMSTCN(out_channels=32)
    b = DGMSTCN(out_channels=32, use_pallas=True, pallas_interpret=True)
    v = _vars(a, x)
    ya, sa = a.apply(v, x, train=True, mutable=["batch_stats"])
    yb, sb = b.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), rtol=1e-6)
    jax.tree.map(lambda p, q: np.testing.assert_allclose(
        np.asarray(p), np.asarray(q), rtol=1e-6), sa, sb)
