"""DGMSTCN eval-layout dispatch: 'split' (branch stack twice — x and the
(N,T,1,C) global joint) and 'concat' (one pass over the 26-joint tensor,
reference dgmstcn structure, tcn.py:407-423) must agree exactly; 'auto'
must pick concat at small effective batch (the split form costs a measured
~0.56 ms/block of batch-independent overhead on v5e — 676 -> 773 fps at the
b16 dgstgcn headline) and split at large batch (no 26-joint copy)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dsgcn_tpu.ops.tcn import DGMSTCN


@pytest.mark.parametrize("stride", [1, 2])
def test_split_concat_eval_layouts_agree(stride):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((4, 20, 25, 32)).astype(np.float32))
    split = DGMSTCN(out_channels=32, stride=stride, eval_layout="split")
    concat = DGMSTCN(out_channels=32, stride=stride, eval_layout="concat")
    v = split.init(jax.random.PRNGKey(0), x, train=False)
    # perturb running stats so BN folding is non-trivial
    v = jax.tree.map(lambda a: a + 0.1 * jnp.arange(a.size, dtype=a.dtype)
                     .reshape(a.shape) / a.size, v)
    a = split.apply(v, x, train=False)
    b = concat.apply(v, x, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_auto_layout_dispatch_by_batch():
    """'auto' == concat at n<64 and == split at n>=64 (shapes are static
    under jit, so the dispatch is a trace-time branch).  The concat form is
    recognizable in the jaxpr by its 26-joint tensor (V+1 global row)."""
    rng = np.random.default_rng(1)
    auto = DGMSTCN(out_channels=32, eval_layout="auto")
    for n, expect_concat in ((8, True), (64, False)):
        x = jnp.asarray(rng.standard_normal((n, 20, 25, 32))
                        .astype(np.float32))
        v = auto.init(jax.random.PRNGKey(0), x, train=False)
        jaxpr = str(jax.make_jaxpr(
            lambda v_, x_: auto.apply(v_, x_, train=False))(v, x))
        has_26 = f"{n},20,26,32" in jaxpr.replace(" ", "")
        assert has_26 == expect_concat, (n, expect_concat)
