"""Name-based torch checkpoint importer: converted weights must reproduce the
reference model's outputs exactly (same oracle methodology as the parity
tests, but going through state_dict names instead of module introspection)."""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

import ref_loader
import torch_bridge as tb
from dsgcn_tpu.models.builder import build_backbone, model_cfg
from dsgcn_tpu.utils.torch_import import import_state_dict

RNG = np.random.default_rng(21)


@pytest.fixture(scope="module")
def refbb():
    return ref_loader.load_ref_backbones()


def _x(n=2, m=2, t=24, v=25, c=3):
    return RNG.standard_normal((n, m, t, v, c)).astype(np.float32)


def _check(ref, our, variables, x, tol=2e-3):
    ref.eval()
    with torch.no_grad():
        want = tb.t2n(ref(torch.tensor(np.ascontiguousarray(x))))
    want = np.transpose(want, (0, 1, 3, 4, 2))
    got = np.asarray(our.apply(variables, jnp.asarray(x), train=False))
    scale = max(1.0, float(np.abs(want).max()))
    np.testing.assert_allclose(got, want, rtol=tol, atol=1e-4 * scale)


def _convert_backbone_only(ref, **kw):
    sd = {f"backbone.{k}": v.numpy() for k, v in ref.state_dict().items()}
    v = import_state_dict(sd, **kw)
    return {"params": v["params"]["backbone"],
            "batch_stats": v["batch_stats"]["backbone"]}


def test_import_stgcnpp(refbb):
    ref = refbb["stgcn"].STGCN(
        graph_cfg=dict(layout="nturgb+d", mode="spatial"),
        gcn_adaptive="init", gcn_with_res=True, tcn_type="mstcn")
    tb.randomize_all_bns(ref, RNG)
    our = build_backbone(model_cfg("stgcn++")["backbone"])
    _check(ref, our, _convert_backbone_only(ref), _x())


def test_import_stgcn_plain(refbb):
    ref = refbb["stgcn"].STGCN(
        graph_cfg=dict(layout="nturgb+d", mode="stgcn_spatial"))
    tb.randomize_all_bns(ref, RNG)
    our = build_backbone(model_cfg("stgcn")["backbone"])
    _check(ref, our, _convert_backbone_only(ref), _x())


def test_import_dsgcn(refbb):
    ref = refbb["dgstgcn"].DGSTGCN(
        graph_cfg=dict(layout="nturgb+d", mode="random", num_filter=3,
                       init_off=0.04, init_std=0.02),
        gcn_type="dgphgcn1", gcn_ratio=0.125, gcn_node_attention=True,
        gcn_edge_attention=True, gcn_decompose=True, gcn_subset_wise=True,
        gcn_ctr="T", gcn_ada="T", tcn_type="dgmstcn")
    tb.randomize_all_bns(ref, RNG)
    with torch.no_grad():
        for blk in ref.gcn:
            blk.gcn.alpha.copy_(torch.tensor(
                RNG.uniform(-0.5, 0.5, 3), dtype=torch.float32))
            blk.gcn.beta.copy_(torch.tensor(
                RNG.uniform(-0.5, 0.5, 3), dtype=torch.float32))
    our = build_backbone(model_cfg("dsgcn")["backbone"])
    _check(ref, our, _convert_backbone_only(ref), _x())


def test_import_aagcn(refbb):
    ref = refbb["aagcn"].AAGCN(
        graph_cfg=dict(layout="nturgb+d", mode="spatial"),
        gcn_type="unit_aagcn")
    tb.randomize_all_bns(ref, RNG)
    our = build_backbone(model_cfg("aagcn")["backbone"])
    _check(ref, our, _convert_backbone_only(ref), _x(), tol=5e-3)


def test_import_full_recognizer_head():
    import torch.nn as nn
    sd = {"cls_head.fc_cls.weight": torch.randn(60, 256),
          "cls_head.fc_cls.bias": torch.randn(60)}
    v = import_state_dict({k: t.numpy() for k, t in sd.items()})
    assert v["params"]["head"]["fc_cls"]["kernel"].shape == (256, 60)
