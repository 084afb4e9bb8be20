"""CNN-backbone + head family parity against the reference pyskl/models/cnns
and pyskl/models/heads, via weight-copied forward comparison."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import ref_loader
import torch_bridge as tb
from dsgcn_tpu.models import cnns as our_cnns
from dsgcn_tpu.models import heads as our_heads

RNG = np.random.default_rng(7)


@pytest.fixture(scope="module")
def refcnn():
    return ref_loader.load_ref_cnns()


@pytest.fixture(scope="module")
def refheads():
    return ref_loader.load_ref_heads()


def _nctv3d(x):
    """(N, T, H, W, C) -> torch (N, C, T, H, W)."""
    return torch.tensor(np.ascontiguousarray(np.transpose(x, (0, 4, 1, 2, 3))))


def _from_ref3d(y):
    return np.transpose(tb.t2n(y), (0, 2, 3, 4, 1))


def _block_vars(blk):
    """Reference Bottleneck3d/BasicBlock3d/BlockX3D -> our params/stats."""
    params, stats = {}, {}
    for name in ("conv1", "conv2", "conv3"):
        if hasattr(blk, name):
            p, s = tb.convbn3d_vars(getattr(blk, name))
            params[name], stats[name] = p, s
    if getattr(blk, "downsample", None) is not None:
        p, s = tb.convbn3d_vars(blk.downsample)
        params["downsample"], stats["downsample"] = p, s
    if getattr(blk, "se_ratio", None) is not None and hasattr(blk, "se_module"):
        params["se_module"] = {"fc1": tb.conv3d_p(blk.se_module.fc1),
                               "fc2": tb.conv3d_p(blk.se_module.fc2)}
    return params, stats


def _resnet3d_vars(ref, layer_names=None):
    """Reference ResNet3d-style trunk -> our compact ResNet3d params tree."""
    params, stats = {}, {}
    p, s = tb.convbn3d_vars(ref.conv1)
    params["conv1"], stats["conv1"] = p, s
    names = layer_names or ref.res_layers
    for i, lname in enumerate(names):
        layer = getattr(ref, lname)
        for b, blk in enumerate(layer):
            p, s = _block_vars(blk)
            params[f"layer{i + 1}_{b}"], stats[f"layer{i + 1}_{b}"] = p, s
    return params, stats


def test_resnet3d_slowonly_parity(refcnn):
    """PoseC3D's SlowOnly trunk: exact forward parity (resnet3d.py:201-626)."""
    torch.manual_seed(0)
    ref = refcnn["resnet3d_slowonly"].ResNet3dSlowOnly(
        depth=50, in_channels=17, base_channels=32, num_stages=3,
        out_indices=(2,),
        stage_blocks=(1, 1, 1), conv1_stride=(1, 1), pool1_stride=(1, 1),
        inflate=(0, 1, 1), spatial_strides=(2, 2, 2),
        temporal_strides=(1, 1, 2), conv1_kernel=(1, 7, 7))
    tb.randomize_all_bns(ref, RNG)
    ref.eval()

    our = our_cnns.ResNet3dSlowOnly(
        depth=50, in_channels=17, base_channels=32, num_stages=3,
        stage_blocks=(1, 1, 1), conv1_stride=(1, 1), pool1_stride=(1, 1),
        inflate=(0, 1, 1), spatial_strides=(2, 2, 2),
        temporal_strides=(1, 1, 2), conv1_kernel=(1, 7, 7))
    params, stats = _resnet3d_vars(ref)

    x = RNG.standard_normal((1, 8, 16, 16, 17)).astype(np.float32)
    with torch.no_grad():
        want = _from_ref3d(ref(_nctv3d(x)))
    got = np.asarray(our.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_c3d_parity(refcnn):
    """C3D backbone exact forward parity (c3d.py:11-101)."""
    torch.manual_seed(0)
    ref = refcnn["c3d"].C3D(in_channels=3, base_channels=8, num_stages=4)
    tb.randomize_all_bns(ref, RNG)
    ref.eval()

    our = our_cnns.C3D(in_channels=3, base_channels=8, num_stages=4)
    params, stats = {}, {}
    for name in ("conv1a", "conv2a", "conv3a", "conv3b", "conv4a", "conv4b",
                 "conv5a", "conv5b"):
        p, s = tb.convbn3d_vars(getattr(ref, name))
        params[name], stats[name] = p, s

    x = RNG.standard_normal((1, 8, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = _from_ref3d(ref(_nctv3d(x)))
    got = np.asarray(our.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_x3d_parity(refcnn):
    """X3D (SE + swish inverted bottlenecks) exact forward parity
    (x3d.py:161-503)."""
    torch.manual_seed(0)
    ref = refcnn["x3d"].X3D(
        gamma_w=1.0, gamma_b=2.0, gamma_d=1.0, num_stages=2,
        stage_blocks=(1, 2), spatial_strides=(2, 2), se_style="half",
        se_ratio=0.5)
    ref.init_weights()
    tb.randomize_all_bns(ref, RNG)
    ref.eval()

    our = our_cnns.X3D(gamma_w=1.0, gamma_b=2.0, gamma_d=1.0, num_stages=2,
                       stage_blocks=(1, 2), spatial_strides=(2, 2),
                       se_style="half", se_ratio=0.5)
    params, stats = {}, {}
    params["conv1_s"] = {"conv": tb.conv3d_p(ref.conv1_s.conv)}
    stats["conv1_s"] = {}
    p, s = tb.convbn3d_vars(ref.conv1_t)
    params["conv1_t"], stats["conv1_t"] = p, s
    for i, lname in enumerate(ref.res_layers):
        for b, blk in enumerate(getattr(ref, lname)):
            p, s = _block_vars(blk)
            params[f"layer{i + 1}_{b}"], stats[f"layer{i + 1}_{b}"] = p, s
    p, s = tb.convbn3d_vars(ref.conv5)
    params["conv5"], stats["conv5"] = p, s

    x = RNG.standard_normal((1, 4, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        want = _from_ref3d(ref(_nctv3d(x)))
    got = np.asarray(our.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_potion_parity(refcnn):
    """PoTion 2D backbone exact forward parity (potion.py:7-80)."""
    torch.manual_seed(0)
    ref = refcnn["potion"].PoTion(in_channels=17, channels=[8, 16],
                                  num_layers=[1, 1])
    tb.randomize_all_bns(ref, RNG)
    ref.eval()

    our = our_cnns.PoTion(in_channels=17, channels=(8, 16), num_layers=(1, 1))
    params, stats = {}, {}
    for i, lname in enumerate(ref.layer_names):
        for j, cm in enumerate(getattr(ref, lname)):
            p, s = tb.convbn2d_vars(cm)
            params[f"layer{i + 1}_{j}"], stats[f"layer{i + 1}_{j}"] = p, s

    x = RNG.standard_normal((2, 16, 16, 17)).astype(np.float32)
    xt = torch.tensor(np.ascontiguousarray(np.transpose(x, (0, 3, 1, 2))))
    with torch.no_grad():
        want = np.transpose(tb.t2n(ref(xt)), (0, 2, 3, 1))
    got = np.asarray(our.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(x), train=False))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def _pathway_vars(ref_path, n_stages, lateral_ids=()):
    """Reference ResNet3dPathway -> our pathway param tree."""
    params, stats = {}, {}
    p, s = tb.convbn3d_vars(ref_path.conv1)
    params["stem"] = {"conv1": p}
    stats["stem"] = {"conv1": s}
    for i in range(n_stages):
        layer = getattr(ref_path, f"layer{i + 1}")
        lp, ls = {}, {}
        for b, blk in enumerate(layer):
            bp, bs = _block_vars(blk)
            lp[f"block{b}"], ls[f"block{b}"] = bp, bs
        params[f"layer{i + 1}"], stats[f"layer{i + 1}"] = lp, ls
    for i in lateral_ids:
        name = "conv1_lateral" if i == 0 else f"layer{i}_lateral"
        cm = getattr(ref_path, name)
        params[name] = {"conv": tb.conv3d_p(cm.conv)}
    return params, stats


def test_slowfast_reference_is_dead_code(refcnn):
    """The reference ResNet3dSlowFast is unconstructible as committed:
    ResNet3dPathway.make_res_layer drops **kwargs when delegating
    (resnet3d_slowfast.py:93-94 calls super().make_res_layer(block, inplanes +
    lateral_inplanes, planes, blocks) only), so every block is built with
    norm_cfg=None / conv_cfg=None / act_cfg=None and inflate/stride defaults —
    Bottleneck3d.__init__ then calls build_activation_layer(None)
    (resnet3d.py:176) which raises.  Our ResNet3dSlowFast implements the
    documented two-pathway architecture (resnet3d_slowfast.py:220-328) with
    block numerics covered by test_resnet3d_slowonly_parity."""
    with pytest.raises((AttributeError, TypeError)):
        refcnn["resnet3d_slowfast"].ResNet3dSlowFast()


def test_torch_nearest_time_resample_parity():
    """_torch_nearest_resize_t == torch F.interpolate(mode='nearest') on T
    (the slow/fast frame-rate split, resnet3d_slowfast.py:300-306)."""
    x = RNG.standard_normal((2, 16, 3, 3, 4)).astype(np.float32)
    for rate in (2, 4, 8):
        xt = torch.tensor(np.ascontiguousarray(np.transpose(x, (0, 4, 1, 2, 3))))
        want = torch.nn.functional.interpolate(
            xt, mode="nearest", scale_factor=(1.0 / rate, 1.0, 1.0))
        want = np.transpose(tb.t2n(want), (0, 2, 3, 4, 1))
        got = np.asarray(our_cnns._torch_nearest_resize_t(
            jnp.asarray(x), x.shape[1] // rate))
        np.testing.assert_array_equal(got, want)


@pytest.mark.slow
def test_slowfast_forward_smoke():
    """Full SlowFast-R50 two-pathway forward: shapes + lateral fusion wiring."""
    m = our_cnns.ResNet3dSlowFast()
    x = jnp.zeros((1, 16, 32, 32, 3))
    v = m.init(jax.random.PRNGKey(0), x, train=False)
    ys, yf = m.apply(v, x, train=False)
    assert ys.shape == (1, 2, 1, 1, 2048)
    assert yf.shape == (1, 16, 1, 1, 256)


def test_rgbposeconv3d_reference_is_dead_code(refcnn):
    """The reference RGBPoseConv3D is unconstructible as committed: its
    pathway configs pass lateral_inv/lateral_infl/lateral_activate which
    resnet3d_slowfast.ResNet3dPathway forwards into ResNet3d.__init__
    (resnet3d.py:240-262 — no such kwargs).  Documented here; our module
    implements the forward contract (rgbposeconv3d.py:101-170)."""
    with pytest.raises(TypeError):
        refcnn["rgbposeconv3d"].RGBPoseConv3D()

    m = our_cnns.RGBPoseConv3D()
    imgs = jnp.zeros((1, 8, 32, 32, 3))
    hm = jnp.zeros((1, 32, 8, 8, 17))
    v = m.init(jax.random.PRNGKey(0), imgs, hm, train=False)
    yr, yp = m.apply(v, imgs, hm, train=False)
    assert yr.shape == (1, 8, 1, 1, 2048)
    assert yp.shape == (1, 32, 1, 1, 512)


# ---------------------------------------------------------------------------
# heads
# ---------------------------------------------------------------------------

def test_i3d_slowfast_head_parity(refheads):
    """SimpleHead 3D mode (simple_head.py:77-82) single-tensor parity.

    The reference tuple path is dead code as committed: forward probes
    ``len(x.shape)`` (simple_head.py:68) before the tuple-concat branch, so a
    SlowFast (slow, fast) tuple raises AttributeError — and even past that,
    cat-before-pool needs equal T across pathways, which SlowFast never has.
    Our SimpleHead3D pools each pathway then concatenates (the semantics
    mmaction2's SlowFastHead implements)."""
    torch.manual_seed(0)
    sh = refheads["simple_head"]
    ref = sh.SlowFastHead(num_classes=9, in_channels=12, dropout=0)
    ref.eval()
    our = our_heads.SimpleHead3D(num_classes=9, in_channels=12, dropout=0)
    params = {"fc_cls": tb.dense_p(ref.fc_cls)}

    with pytest.raises(AttributeError):
        ref((torch.zeros(2, 8, 2, 3, 3), torch.zeros(2, 4, 16, 3, 3)))

    x = RNG.standard_normal((2, 2, 3, 3, 12)).astype(np.float32)
    with torch.no_grad():
        want = tb.t2n(ref(_nctv3d(x)))
    got = np.asarray(our.apply({"params": params}, jnp.asarray(x),
                               train=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # tuple path: pool-each-then-concat semantics
    a = RNG.standard_normal((2, 2, 3, 3, 8)).astype(np.float32)
    b = RNG.standard_normal((2, 4, 3, 3, 4)).astype(np.float32)
    pooled = np.concatenate([a.mean((1, 2, 3)), b.mean((1, 2, 3))], axis=-1)
    want2 = pooled @ np.asarray(params["fc_cls"]["kernel"]) + \
        np.asarray(params["fc_cls"]["bias"])
    got2 = np.asarray(our.apply({"params": params},
                                (jnp.asarray(a), jnp.asarray(b)), train=False))
    np.testing.assert_allclose(got2, want2, rtol=1e-5, atol=1e-5)


def test_tsn_head_parity(refheads):
    """TSNHead 2D segment pooling.

    The reference TSNHead (simple_head.py:143-159) subclasses BaseHead
    directly and never implements the abstract forward/init_weights —
    unconstructible dead code (TypeError).  The live 2D pooling semantics are
    SimpleHead(mode='2D') (simple_head.py:70-77); parity is against that."""
    torch.manual_seed(0)
    with pytest.raises(TypeError):
        refheads["simple_head"].TSNHead(num_classes=5, in_channels=6)
    ref = refheads["simple_head"].SimpleHead(num_classes=5, in_channels=6,
                                             dropout=0, mode="2D")
    ref.eval()
    our = our_heads.TSNHead(num_classes=5, in_channels=6, dropout=0)
    params = {"fc_cls": tb.dense_p(ref.fc_cls)}

    x = RNG.standard_normal((2, 3, 4, 4, 6)).astype(np.float32)
    xt = torch.tensor(np.ascontiguousarray(np.transpose(x, (0, 1, 4, 2, 3))))
    with torch.no_grad():
        want = tb.t2n(ref(xt))
    got = np.asarray(our.apply({"params": params}, jnp.asarray(x),
                               train=False))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_hgt_head_parity(refheads):
    """HGTHead: action logits + auxiliary node-type CE loss
    (simple_head.py:162-245)."""
    torch.manual_seed(0)
    ref = refheads["simple_head"].HGTHead(num_classes=7, in_channels=6,
                                          pose_type="nturgb+d", dropout=0)
    ref.eval()
    our = our_heads.HGTHead(num_classes=7, in_channels=6,
                            pose_type="nturgb+d", dropout=0)
    params = {"fc_cls": tb.dense_p(ref.fc_cls),
              "node_cls": tb.dense_p(ref.node_cls)}

    x = RNG.standard_normal((2, 2, 4, 25, 6)).astype(np.float32)
    xt = torch.tensor(np.ascontiguousarray(np.transpose(x, (0, 1, 4, 2, 3))))
    with torch.no_grad():
        (tag1, want_cls), (tag2, want_loss) = ref(xt)
    assert (tag1, tag2) == ("cls_score", "node_cls_loss")
    got_cls, got_loss = our.apply({"params": params}, jnp.asarray(x),
                                  train=False)
    np.testing.assert_allclose(np.asarray(got_cls), tb.t2n(want_cls),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(float(got_loss), float(want_loss), rtol=1e-5)


def test_rgbpose_head_parity(refheads):
    """RGBPoseHead dual fc (rgbpose_head.py:9-79)."""
    torch.manual_seed(0)
    ref = refheads["rgbpose_head"].RGBPoseHead(num_classes=5,
                                               in_channels=(8, 6), dropout=0.0)
    ref.eval()
    our = our_heads.RGBPoseHead(num_classes=5, in_channels=(8, 6), dropout=0)
    params = {"fc_rgb": tb.dense_p(ref.fc_rgb),
              "fc_pose": tb.dense_p(ref.fc_pose)}

    a = RNG.standard_normal((2, 2, 3, 3, 8)).astype(np.float32)
    b = RNG.standard_normal((2, 4, 3, 3, 6)).astype(np.float32)
    with torch.no_grad():
        want = ref((_nctv3d(a), _nctv3d(b)))
    got = our.apply({"params": params}, (jnp.asarray(a), jnp.asarray(b)),
                    train=False)
    for k in ("rgb", "pose"):
        np.testing.assert_allclose(np.asarray(got[k]), tb.t2n(want[k]),
                                   rtol=1e-5, atol=1e-5)


def test_gc_cls_heads_smoke():
    """GCHead ((N,M,V,V) adjacency input) and ClsHead ((N,C) input) run."""
    h = our_heads.GCHead(num_classes=4, in_channels=625)
    v = h.init(jax.random.PRNGKey(0), jnp.zeros((2, 2, 25, 25)), train=False)
    assert h.apply(v, jnp.zeros((2, 2, 25, 25)), train=False).shape == (2, 4)
    h = our_heads.ClsHead(num_classes=4, in_channels=16)
    v = h.init(jax.random.PRNGKey(0), jnp.zeros((2, 16)), train=False)
    assert h.apply(v, jnp.zeros((2, 16)), train=False).shape == (2, 4)
