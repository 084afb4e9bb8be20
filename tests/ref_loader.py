"""Load reference (PyTorch) modules from /root/reference by file path, as test oracles.

The reference package requires mmcv (plus a GUI-capable env for some junk imports);
neither is installed here.  We build a synthetic namespace package pointing at the
reference source directories and install minimal stubs for the missing imports, so
the *actual* reference code runs as the parity oracle — nothing is copied.

Only ever imported from tests; the framework itself has zero torch dependency.
"""
import importlib
import sys
import types

REF = "/root/reference"


def _ensure_stub_module(name, **attrs):
    if name in sys.modules:
        mod = sys.modules[name]
    else:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _install_stubs():
    import torch
    import torch.nn as nn

    # torch>=2 CPU convs may emit channels-last (mkldnn) outputs, breaking the
    # reference's .view() calls that assume contiguous NCHW; disable for oracles.
    torch.backends.mkldnn.enabled = False

    # junk IDE imports present in reference sources (gcn.py:1-9 etc.)
    _ensure_stub_module("tkinter", N="n", E="e", W="w", S="s")
    _ensure_stub_module("turtle", screensize=lambda *a, **k: None)
    _ensure_stub_module("cv2", threshold=None, KeyPoint=None)

    # minimal mmcv surface used by the ops/backbones we exercise
    def build_norm_layer(cfg, num_features, postfix=""):
        assert cfg.get("type", "BN") in ("BN", "BN2d")
        return ("bn", nn.BatchNorm2d(num_features))

    def build_activation_layer(cfg):
        t = cfg.get("type", "ReLU")
        return {"ReLU": nn.ReLU, "Tanh": nn.Tanh, "Sigmoid": nn.Sigmoid}[t]()

    def normal_init(module, mean=0, std=1, bias=0):
        nn.init.normal_(module.weight, mean, std)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    mmcv_cnn = _ensure_stub_module(
        "mmcv.cnn",
        build_norm_layer=build_norm_layer,
        build_activation_layer=build_activation_layer,
        normal_init=normal_init,
    )
    mmcv = _ensure_stub_module("mmcv", cnn=mmcv_cnn, __version__="1.9.9-stub")

    def load_checkpoint(*a, **k):
        raise NotImplementedError("stub")

    _ensure_stub_module("mmcv.runner", load_checkpoint=load_checkpoint)
    from torch.nn.modules.batchnorm import _BatchNorm

    def build_from_cfg(cfg, registry, default_args=None):
        cfg = dict(cfg)
        cfg.pop("type")
        raise NotImplementedError("stubbed registry build")

    class DataContainer:
        def __init__(self, data, **kw):
            self.data = data

    _ensure_stub_module("mmcv.utils", Registry=object, _BatchNorm=_BatchNorm,
                        build_from_cfg=build_from_cfg)
    _ensure_stub_module("mmcv.parallel", DataContainer=DataContainer)
    _ensure_stub_module("mmcv", load=None, dump=None)
    return mmcv


def _ensure_pkg(name, path):
    """Register a namespace package whose submodules resolve under `path`."""
    if name in sys.modules:
        return sys.modules[name]
    pkg = types.ModuleType(name)
    pkg.__path__ = [path]
    pkg.__package__ = name
    sys.modules[name] = pkg
    return pkg


def load_ref_ops():
    """Import reference gcns/utils (gcn.py, tcn.py, init_func.py) as package `refops`."""
    _install_stubs()
    _ensure_pkg("refops", f"{REF}/pyskl/models/gcns/utils")
    gcn = importlib.import_module("refops.gcn")
    tcn = importlib.import_module("refops.tcn")
    return gcn, tcn


def load_ref_graph():
    """Import reference pyskl/utils/graph.py as module `refgraph.graph`."""
    _install_stubs()
    _ensure_pkg("refgraph", f"{REF}/pyskl/utils")
    return importlib.import_module("refgraph.graph")


class _FakeBackboneUtils:
    pass


def load_ref_backbones():
    """Import reference backbones (stgcn.py, aagcn.py, ctrgcn.py, dgstgcn.py).

    The backbones do relative imports `from ...utils import Graph, cache_checkpoint`
    and `from ..builder import BACKBONES`; we materialize just enough package
    structure for those to resolve against the real reference sources.
    """
    _install_stubs()
    graph_mod = load_ref_graph()
    ops_pkg_path = f"{REF}/pyskl/models/gcns/utils"

    root = _ensure_pkg("refpyskl", REF + "/pyskl")
    # refpyskl.utils -> real reference utils dir, but expose only what's needed
    utils_pkg = _ensure_pkg("refpyskl.utils", f"{REF}/pyskl/utils")
    utils_pkg.Graph = graph_mod.Graph
    utils_pkg.cache_checkpoint = lambda x: x
    models_pkg = _ensure_pkg("refpyskl.models", f"{REF}/pyskl/models")

    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    builder = _ensure_stub_module("refpyskl.models.builder", BACKBONES=_Registry(),
                                  HEADS=_Registry(), RECOGNIZERS=_Registry(),
                                  LOSSES=_Registry())
    builder.__package__ = "refpyskl.models"
    gcns_pkg = _ensure_pkg("refpyskl.models.gcns", f"{REF}/pyskl/models/gcns")
    # import the REAL utils package __init__ so `from .utils import mstcn` works
    importlib.import_module("refpyskl.models.gcns.utils")

    mods = {}
    for name in ("stgcn", "aagcn", "ctrgcn", "dgstgcn"):
        mods[name] = importlib.import_module(f"refpyskl.models.gcns.{name}")
    return mods


def load_ref_msg3d():
    """Import reference msg3d_utils (needs the 4-level package for its
    `from ....utils.graph import ...`)."""
    load_ref_backbones()
    return importlib.import_module("refpyskl.models.gcns.utils.msg3d_utils")


def load_ref_pipelines():
    """Import reference dataset pipeline transforms (pose_related, sampling, formatting)."""
    _install_stubs()

    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    builder = _ensure_stub_module("refds.builder", PIPELINES=_Registry(),
                                  DATASETS=_Registry())
    builder.__package__ = "refds"
    _ensure_pkg("refds", f"{REF}/pyskl/datasets")
    pipe_pkg = _ensure_pkg("refds.pipelines", f"{REF}/pyskl/datasets/pipelines")
    builder2 = _ensure_stub_module("refds.pipelines.builder", PIPELINES=_Registry())
    builder2.__package__ = "refds.pipelines"
    compose = importlib.import_module("refds.pipelines.compose")
    pose_related = importlib.import_module("refds.pipelines.pose_related")
    sampling = importlib.import_module("refds.pipelines.sampling")
    formatting = importlib.import_module("refds.pipelines.formatting")
    return dict(compose=compose, pose_related=pose_related, sampling=sampling,
                formatting=formatting)
