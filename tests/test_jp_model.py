"""Joint-partition parallelism integrated into the full DGSTGCN model:
exactness of the graph-axis-sharded forward and training step vs the
single-device model, plus communication accounting (VERDICT round-1 item 3).

Mesh: (data=1, graph=5) on the virtual CPU devices — 5 divides NTU's 25
joints (the body-part granularity), so no joint padding exists anywhere.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dsgcn_tpu.core.train import TrainState, init_model, make_optimizer, \
    train_step
from dsgcn_tpu.models.builder import build_model
from dsgcn_tpu.parallel.mesh import GRAPH_AXIS, make_mesh, replicate, \
    shard_batch
from dsgcn_tpu.parallel.train import make_jp_eval_step, make_jp_train_step

RNG = np.random.default_rng(31)
N_CLASSES = 7


def _cfg(graph_axis=None):
    bb = dict(type="DGSTGCN", gcn_type="dggcn", gcn_ratio=0.25,
              gcn_ctr="T", gcn_ada="T", gcn_subset_wise=True,
              tcn_type="dgmstcn", num_stages=4, inflate_stages=[3],
              down_stages=[3],
              graph_cfg=dict(layout="nturgb+d", mode="random", num_filter=3,
                             init_off=0.04, init_std=0.02, seed=0))
    if graph_axis is not None:
        bb["graph_axis"] = graph_axis
    return dict(type="RecognizerGCN", backbone=bb,
                cls_head=dict(type="GCNHead", num_classes=N_CLASSES,
                              in_channels=128))


@pytest.fixture(scope="module", autouse=True)
def f64():
    """Exactness claims are made in float64: every comparison below holds to
    ~1e-12, while f32 runs only bound the error by rounding of reordered
    sums (~1e-5 absolute at the observed gradient scales)."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def setup(f64):
    assert len(jax.devices()) >= 5, "needs the 8-device CPU mesh"
    plain = build_model(_cfg())
    jp = build_model(_cfg(graph_axis=GRAPH_AXIS))
    x = jnp.asarray(RNG.standard_normal((4, 2, 8, 25, 3)))
    variables = plain.init(jax.random.PRNGKey(0), x[:1], train=False)
    # f64 params (flax init defaults to f32) + non-zero gates so the
    # dynamic-graph paths are exercised
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: (jnp.asarray(RNG.uniform(-0.3, 0.3, v.shape))
                      if any(str(getattr(k, "key", "")) in ("alpha", "beta")
                             for k in p) else v.astype(jnp.float64)),
        variables["params"])
    stats = jax.tree.map(lambda v: v.astype(jnp.float64),
                         variables["batch_stats"])
    variables = {"params": params, "batch_stats": stats}
    mesh = make_mesh(n_data=1, n_graph=5, devices=jax.devices()[:5])
    return plain, jp, variables, x, mesh


def test_param_trees_identical(setup):
    plain, jp, variables, x, mesh = setup
    jp_vars = jax.eval_shape(
        lambda: plain.init(jax.random.PRNGKey(0), x[:1], train=False))
    # the jp model consumes the SAME variable tree (replicated params)
    assert jax.tree_util.tree_structure(jp_vars) == \
        jax.tree_util.tree_structure(variables)


def test_jp_forward_matches_single_device(setup):
    plain, jp, variables, x, mesh = setup
    want = np.asarray(plain.apply(variables, x, train=False))
    fwd = make_jp_eval_step(mesh, jp.apply)
    got = np.asarray(fwd(variables["params"], variables["batch_stats"], x))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


def test_jp_train_step_matches_single_device(setup):
    plain, jp, variables, x, mesh = setup
    y = jnp.asarray(RNG.integers(0, N_CLASSES, size=4))
    batch = dict(keypoint=x, label=y)

    tx, _ = make_optimizer(lr=0.1, total_steps=10, schedule="constant")
    s_plain = TrainState.create(plain.apply, variables["params"],
                                variables["batch_stats"], tx)
    s_plain, m_plain = jax.jit(train_step)(s_plain, batch,
                                           jax.random.PRNGKey(3))

    s_jp = TrainState.create(jp.apply, variables["params"],
                             variables["batch_stats"], tx)
    s_jp = replicate(s_jp, mesh)
    step = make_jp_train_step(mesh)
    # data axis is 1 -> the fold_in(axis_index=0) matches the single-device
    # dropout stream; GCNHead has dropout 0 anyway
    s_jp, m_jp = step(s_jp, shard_batch(batch, mesh), jax.random.PRNGKey(3))

    assert abs(float(m_jp["loss"]) - float(m_plain["loss"])) < 1e-11

    def check(tree_a, tree_b):
        flat_a = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
                  jax.tree_util.tree_leaves_with_path(tree_a)}
        flat_b = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
                  jax.tree_util.tree_leaves_with_path(
                      jax.device_get(tree_b))}
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            scale = max(float(np.abs(flat_a[k]).max()), 1e-6)
            np.testing.assert_allclose(flat_b[k], flat_a[k],
                                       rtol=1e-9, atol=1e-10 * scale,
                                       err_msg=k)

    check(s_plain.params, s_jp.params)
    # BN running stats must agree too (axis-synced, weighted global joint)
    check(s_plain.batch_stats, s_jp.batch_stats)


def test_jp_comm_accounting(setup):
    """The sharded forward communicates via ring ppermutes: one per dggcn
    block in the traced program (executed G times inside its fori_loop), and
    per-hop ICI volume that the chunk contraction's FLOPs dominate."""
    from dsgcn_tpu.parallel.joint_partition import jp_comm_volume

    plain, jp, variables, x, mesh = setup
    fwd = make_jp_eval_step(mesh, jp.apply)
    text = str(jax.make_jaxpr(
        lambda p, s, xx: fwd(p, s, xx))(variables["params"],
                                        variables["batch_stats"], x))
    import re
    n_blocks = 4
    assert text.count("ppermute") == n_blocks
    # the final joint all_gather + one x1 all_gather per block
    assert len(re.findall(r"= all_gather\[", text)) == n_blocks + 1

    # honest overlap accounting: per-hop intensity is (V/G)/2 FLOP/byte
    # regardless of batch/T/K/mid (they cancel) — the ring is ICI-bound when
    # the MXU runs hot; its win is 1/G activation memory and a second
    # scaling axis, not free FLOPs (see jp_comm_volume docstring)
    acc = jp_comm_volume(n=256, t=100, V=25, K=3, mid=16, G=5)
    hop_bytes = acc["ppermute_bytes"] / 5
    np.testing.assert_allclose(acc["overlap_flops_per_hop"] / hop_bytes,
                               (25 / 5) / 2, rtol=1e-12)


# ---------------------------------------------------------------------------
# Flagship DS-GCN (dgphgcn1): joint-partitioned semantic op (VERDICT r2 #5)
# ---------------------------------------------------------------------------

def _dsgcn_cfg(graph_axis=None):
    bb = dict(type="DGSTGCN", gcn_type="dgphgcn1", gcn_ratio=0.125,
              gcn_node_attention=True, gcn_edge_attention=True,
              gcn_decompose=True, gcn_subset_wise=True,
              gcn_ctr="T", gcn_ada="T",
              tcn_type="dgmstcn", num_stages=4, inflate_stages=[3],
              down_stages=[3],
              graph_cfg=dict(layout="nturgb+d", mode="random", num_filter=3,
                             init_off=0.04, init_std=0.02, seed=0))
    if graph_axis is not None:
        bb["graph_axis"] = graph_axis
    return dict(type="RecognizerGCN", backbone=bb,
                cls_head=dict(type="GCNHead", num_classes=N_CLASSES,
                              in_channels=128))


@pytest.fixture(scope="module")
def setup_dsgcn(f64):
    assert len(jax.devices()) >= 5, "needs the 8-device CPU mesh"
    plain = build_model(_dsgcn_cfg())
    jp = build_model(_dsgcn_cfg(graph_axis=GRAPH_AXIS))
    x = jnp.asarray(RNG.standard_normal((4, 2, 8, 25, 3)))
    variables = plain.init(jax.random.PRNGKey(0), x[:1], train=False)
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: (jnp.asarray(RNG.uniform(-0.3, 0.3, v.shape))
                      if any(str(getattr(k, "key", "")) in ("alpha", "beta")
                             for k in p) else v.astype(jnp.float64)),
        variables["params"])
    stats = jax.tree.map(lambda v: v.astype(jnp.float64),
                         variables["batch_stats"])
    variables = {"params": params, "batch_stats": stats}
    mesh = make_mesh(n_data=1, n_graph=5, devices=jax.devices()[:5])
    return plain, jp, variables, x, mesh


def test_dsgcn_jp_param_trees_identical(setup_dsgcn):
    plain, jp, variables, x, mesh = setup_dsgcn
    jp_vars = jax.eval_shape(
        lambda: plain.init(jax.random.PRNGKey(0), x[:1], train=False))
    assert jax.tree_util.tree_structure(jp_vars) == \
        jax.tree_util.tree_structure(variables)


def test_dsgcn_jp_forward_matches_single_device(setup_dsgcn):
    plain, jp, variables, x, mesh = setup_dsgcn
    want = np.asarray(plain.apply(variables, x, train=False))
    fwd = make_jp_eval_step(mesh, jp.apply)
    got = np.asarray(fwd(variables["params"], variables["batch_stats"], x))
    np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-11)


def test_dsgcn_jp_train_step_matches_single_device(setup_dsgcn):
    plain, jp, variables, x, mesh = setup_dsgcn
    y = jnp.asarray(RNG.integers(0, N_CLASSES, size=4))
    batch = dict(keypoint=x, label=y)

    tx, _ = make_optimizer(lr=0.1, total_steps=10, schedule="constant")
    s_plain = TrainState.create(plain.apply, variables["params"],
                                variables["batch_stats"], tx)
    s_plain, m_plain = jax.jit(train_step)(s_plain, batch,
                                           jax.random.PRNGKey(3))

    s_jp = TrainState.create(jp.apply, variables["params"],
                             variables["batch_stats"], tx)
    s_jp = replicate(s_jp, mesh)
    step = make_jp_train_step(mesh)
    s_jp, m_jp = step(s_jp, shard_batch(batch, mesh), jax.random.PRNGKey(3))

    assert abs(float(m_jp["loss"]) - float(m_plain["loss"])) < 1e-11

    def check(tree_a, tree_b):
        flat_a = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
                  jax.tree_util.tree_leaves_with_path(tree_a)}
        flat_b = {jax.tree_util.keystr(k): np.asarray(v) for k, v in
                  jax.tree_util.tree_leaves_with_path(
                      jax.device_get(tree_b))}
        assert set(flat_a) == set(flat_b)
        for k in flat_a:
            scale = max(float(np.abs(flat_a[k]).max()), 1e-6)
            np.testing.assert_allclose(flat_b[k], flat_a[k],
                                       rtol=1e-9, atol=1e-10 * scale,
                                       err_msg=k)

    check(s_plain.params, s_jp.params)
    check(s_plain.batch_stats, s_jp.batch_stats)


def test_dsgcn_jp_comm_accounting(setup_dsgcn):
    """One ring (G ppermute executions from one traced ppermute) per block,
    one x1 all_gather per block + the final joint gather."""
    import re
    plain, jp, variables, x, mesh = setup_dsgcn
    fwd = make_jp_eval_step(mesh, jp.apply)
    text = str(jax.make_jaxpr(
        lambda p, s, xx: fwd(p, s, xx))(variables["params"],
                                        variables["batch_stats"], x))
    n_blocks = 4
    assert text.count("ppermute") == n_blocks
    assert len(re.findall(r"= all_gather\[", text)) == n_blocks + 1
