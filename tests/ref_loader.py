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
    """Get module ``name``, preferring the real one; stub only if it cannot
    be imported.  Attributes are only added when missing — NEVER overwrite a
    real module's attrs (stubbing an importable module like scipy.spatial
    with an empty shell poisoned every later ``from scipy.spatial import
    ...`` in the same process — shard-order-dependent suite failures)."""
    if name in sys.modules:
        mod = sys.modules[name]
    else:
        try:
            mod = importlib.import_module(name)
        except ImportError:
            import importlib.machinery as _machinery
            mod = types.ModuleType(name)
            # a real ModuleSpec: importlib.util.find_spec raises ValueError
            # on in-sys.modules modules with __spec__=None (torch dynamo
            # trace_rules probes e.g. 'sklearn' this way when building a
            # torch optimizer)
            mod.__spec__ = _machinery.ModuleSpec(name, loader=None)
            mod.__dsgcn_stub__ = True
            sys.modules[name] = mod
    for k, v in attrs.items():
        # our own stubs take every attr (later calls override placeholder
        # values like scatter=None); REAL modules only gain missing attrs
        if getattr(mod, "__dsgcn_stub__", False) or not hasattr(mod, k):
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

    class Swish(nn.Module):
        def forward(self, x):
            return x * torch.sigmoid(x)

    class ConvModule(nn.Module):
        """Functional mmcv ConvModule: conv -> (bn) -> (act), bias='auto'."""

        def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                     padding=0, dilation=1, groups=1, bias="auto",
                     conv_cfg=None, norm_cfg=None, act_cfg=dict(type="ReLU"),
                     **kw):
            super().__init__()
            ctype = (conv_cfg or {}).get("type", "Conv2d")
            Conv = {"Conv": nn.Conv2d, "Conv2d": nn.Conv2d,
                    "Conv3d": nn.Conv3d, "Conv1d": nn.Conv1d}[ctype]
            if bias == "auto":
                bias = norm_cfg is None
            self.conv = Conv(in_channels, out_channels, kernel_size,
                             stride=stride, padding=padding,
                             dilation=dilation, groups=groups, bias=bias)
            self.with_norm = norm_cfg is not None
            if self.with_norm:
                ntype = norm_cfg.get("type", "BN")
                BN = {"BN": nn.BatchNorm2d, "BN1d": nn.BatchNorm1d,
                      "BN2d": nn.BatchNorm2d, "BN3d": nn.BatchNorm3d}[ntype]
                self.bn = BN(out_channels)
            self.with_activation = act_cfg is not None
            if self.with_activation:
                atype = act_cfg.get("type", "ReLU")
                self.activate = {"ReLU": nn.ReLU, "Swish": Swish,
                                 "Tanh": nn.Tanh,
                                 "Sigmoid": nn.Sigmoid}[atype]()

        def forward(self, x):
            x = self.conv(x)
            if self.with_norm:
                x = self.bn(x)
            if self.with_activation:
                x = self.activate(x)
            return x

    def kaiming_init(module, a=0, mode="fan_out", nonlinearity="relu",
                     bias=0, distribution="normal"):
        if distribution == "normal":
            nn.init.kaiming_normal_(module.weight, a=a, mode=mode,
                                    nonlinearity=nonlinearity)
        else:
            nn.init.kaiming_uniform_(module.weight, a=a, mode=mode,
                                     nonlinearity=nonlinearity)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    def constant_init(module, val, bias=0):
        if hasattr(module, "weight") and module.weight is not None:
            nn.init.constant_(module.weight, val)
        if hasattr(module, "bias") and module.bias is not None:
            nn.init.constant_(module.bias, bias)

    mmcv_cnn = _ensure_stub_module(
        "mmcv.cnn",
        build_norm_layer=build_norm_layer,
        build_activation_layer=build_activation_layer,
        normal_init=normal_init,
        ConvModule=ConvModule,
        Swish=Swish,
        kaiming_init=kaiming_init,
        constant_init=constant_init,
        xavier_init=lambda m, **k: nn.init.xavier_normal_(m.weight),
    )
    mmcv = _ensure_stub_module("mmcv", cnn=mmcv_cnn, __version__="1.9.9-stub")

    def load_checkpoint(*a, **k):
        raise NotImplementedError("stub")

    _ensure_stub_module("mmcv.runner", load_checkpoint=load_checkpoint,
                        _load_checkpoint=load_checkpoint)
    from torch.nn.modules.batchnorm import _BatchNorm

    def build_from_cfg(cfg, registry, default_args=None):
        cfg = dict(cfg)
        cfg.pop("type")
        raise NotImplementedError("stubbed registry build")

    class DataContainer:
        def __init__(self, data, **kw):
            self.data = data

    _ensure_stub_module("mmcv.utils", Registry=object, _BatchNorm=_BatchNorm,
                        build_from_cfg=build_from_cfg,
                        print_log=lambda msg, logger=None: None)
    _ensure_stub_module("mmcv.parallel", DataContainer=DataContainer)

    class FileClient:
        def __init__(self, *a, **k):
            pass

        def get(self, path):
            with open(path, "rb") as f:
                return f.read()

    _ensure_stub_module("mmcv.fileio", FileClient=FileClient)

    # image primitives used by augmentations.py (cv2-free numpy forms; resize
    # delegates to our bilinear so pixel-path parity tests share the primitive)
    import numpy as _np

    def is_tuple_of(seq, typ):
        return isinstance(seq, tuple) and all(isinstance(s, typ) for s in seq)

    def imnormalize_(img, mean, std, to_rgb=False):
        if to_rgb:
            img[...] = img[..., ::-1]
        img -= mean
        img /= std
        return img

    def imflip_(img, direction="horizontal"):
        if direction == "horizontal":
            img[...] = img[:, ::-1]
        else:
            img[...] = img[::-1]
        return img

    def iminvert(img):
        return _np.full_like(img, 255) - img

    def imresize(img, size, interpolation="bilinear", out=None):
        from dsgcn_tpu.data.pose_aug import bilinear_resize
        return bilinear_resize(img, size)

    def rescale_size(old_size, scale, return_scale=False):
        w, h = old_size
        if isinstance(scale, (float, int)):
            factor = scale
        else:
            max_long, max_short = max(scale), min(scale)
            factor = min(max_long / max(h, w), max_short / min(h, w))
        new_size = (int(w * factor + 0.5), int(h * factor + 0.5))
        return (new_size, factor) if return_scale else new_size

    _ensure_stub_module("mmcv", load=None, dump=None,
                        is_tuple_of=is_tuple_of, imnormalize_=imnormalize_,
                        imflip_=imflip_, iminvert=iminvert, imresize=imresize,
                        rescale_size=rescale_size)
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
    multi_modality = importlib.import_module("refds.pipelines.multi_modality")
    return dict(compose=compose, pose_related=pose_related, sampling=sampling,
                formatting=formatting, multi_modality=multi_modality)


def load_ref_cnns():
    """Import reference 3D-CNN backbones (resnet3d, slowonly, slowfast, x3d,
    c3d, potion, rgbposeconv3d) against the functional ConvModule stub."""
    load_ref_backbones()   # sets up refpyskl package + utils
    import logging
    utils_pkg = sys.modules["refpyskl.utils"]
    utils_pkg.get_root_logger = lambda *a, **k: logging.getLogger("ref")
    _ensure_pkg("refpyskl.models.cnns", f"{REF}/pyskl/models/cnns")
    mods = {}
    for name in ("resnet3d", "resnet3d_slowonly", "resnet3d_slowfast", "x3d",
                 "c3d", "potion", "rgbposeconv3d"):
        mods[name] = importlib.import_module(f"refpyskl.models.cnns.{name}")
    return mods


def load_ref_heads():
    """Import reference heads (simple_head incl. HGT/TSN/GC, rgbpose_head).

    gread.py pulls torch_geometric/torch_scatter (not installed) — stubbed to
    importable names; simple_head only references them for graph-batch heads
    we don't exercise numerically.
    """
    load_ref_backbones()
    import torch
    _ensure_stub_module("torch_geometric")
    _ensure_stub_module("torch_geometric.utils", to_dense_batch=None)
    _ensure_stub_module("torch_geometric.utils.num_nodes",
                        maybe_num_nodes=None)
    _ensure_stub_module("torch_geometric.nn")
    _ensure_stub_module("torch_geometric.nn.inits", reset=None)
    _ensure_stub_module("torch_scatter", scatter=None, scatter_add=None,
                        scatter_max=None)
    core = _ensure_stub_module("refpyskl.core",
                               top_k_accuracy=lambda *a, **k: [0.0])
    core.__package__ = "refpyskl"
    import torch.nn as nn
    builder = sys.modules["refpyskl.models.builder"]
    builder.build_loss = lambda cfg: nn.CrossEntropyLoss()
    _ensure_pkg("refpyskl.models.heads", f"{REF}/pyskl/models/heads")
    simple = importlib.import_module("refpyskl.models.heads.simple_head")
    rgbpose = importlib.import_module("refpyskl.models.heads.rgbpose_head")
    return dict(simple_head=simple, rgbpose_head=rgbpose)


def load_ref_augmentations():
    """Import reference datasets/pipelines/augmentations.py (pixel branch)."""
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
    _ensure_pkg("refds.pipelines", f"{REF}/pyskl/datasets/pipelines")
    builder2 = _ensure_stub_module("refds.pipelines.builder",
                                   PIPELINES=_Registry())
    builder2.__package__ = "refds.pipelines"
    return importlib.import_module("refds.pipelines.augmentations")


def load_ref_gcn_module(name):
    """Import an arbitrary reference gcns/<name>.py (e.g. 'msg3d', 'sgn')."""
    load_ref_backbones()
    return importlib.import_module(f"refpyskl.models.gcns.{name}")


def load_ref_necks():
    """Import reference necks (Simple_neck, Causal_neck+causalnn, pre_train)."""
    load_ref_heads()   # torch_geometric/torch_scatter stubs + builder.build_loss
    import numpy as _np

    def scatter_add(src, index, dim=0, dim_size=None):
        import torch
        size = int(index.max().item() + 1) if dim_size is None else dim_size
        shape = list(src.shape)
        shape[dim] = size
        out = torch.zeros(*shape, dtype=src.dtype)
        return out.index_add_(dim, index, src)

    def scatter(src, index, dim=0, dim_size=None, reduce="add"):
        import torch
        size = int(index.max().item() + 1) if dim_size is None else dim_size
        shape = list(src.shape)
        shape[dim] = size
        if reduce in ("add", "sum"):
            out = torch.zeros(*shape, dtype=src.dtype)
            return out.index_add_(dim, index, src)
        if reduce == "mean":
            out = torch.zeros(*shape, dtype=src.dtype)
            out.index_add_(dim, index, src)
            cnt = torch.zeros(size, dtype=src.dtype).index_add_(
                0, index, torch.ones(src.shape[dim], dtype=src.dtype))
            cnt = cnt.clamp(min=1)
            view = [1] * src.dim()
            view[dim] = size
            return out / cnt.reshape(view) if dim == 0 else out
        if reduce == "max":
            out = torch.full(shape, float("-inf"), dtype=src.dtype)
            out = out.index_reduce_(dim, index, src, "amax",
                                    include_self=True)
            out[out == float("-inf")] = 0
            return out
        raise NotImplementedError(reduce)

    def scatter_max(src, index, dim=0, dim_size=None):
        import torch
        size = int(index.max().item() + 1) if dim_size is None else dim_size
        shape = list(src.shape)
        shape[dim] = size
        out = torch.full(shape, float("-inf"), dtype=src.dtype)
        out = out.index_reduce_(dim, index, src, "amax", include_self=True)
        return out, None   # gread.softmax only uses [0]

    def tg_reset(nn):
        # torch_geometric.nn.inits.reset: recursively re-init children
        if nn is None:
            return
        if hasattr(nn, "children") and len(list(nn.children())) > 0:
            for item in nn.children():
                tg_reset(item)
        elif hasattr(nn, "reset_parameters"):
            nn.reset_parameters()

    _ensure_stub_module("torch_geometric.nn.inits", reset=tg_reset)
    _ensure_stub_module(
        "torch_geometric.utils.num_nodes",
        maybe_num_nodes=lambda index, num_nodes=None:
            int(index.max().item()) + 1 if num_nodes is None else num_nodes)
    _ensure_stub_module("torch_scatter", scatter_add=scatter_add,
                        scatter=scatter, scatter_max=scatter_max)
    _ensure_stub_module("scipy.spatial")
    builder = sys.modules["refpyskl.models.builder"]
    if not hasattr(builder, "NECKS"):
        class _Registry:
            def register_module(self, *a, **k):
                def deco(cls):
                    return cls
                return deco
        builder.NECKS = _Registry()
    _ensure_pkg("refpyskl.models.necks", f"{REF}/pyskl/models/necks")
    causal = importlib.import_module("refpyskl.models.necks.Causal_neck")
    # pre_train imports the real torch_geometric-free gread module
    _ensure_stub_module("xml.dom", HierarchyRequestErr=Exception)
    pre = importlib.import_module("refpyskl.models.necks.pre_train")
    gread = importlib.import_module("refpyskl.models.necks.greadout")
    simple = importlib.import_module("refpyskl.models.necks.Simple_neck")
    return dict(causal=causal, pre_train=pre, greadout=gread,
                simple=simple,
                causalnn=importlib.import_module(
                    "refpyskl.models.necks.causalnn"))


def load_ref_nested_sparse():
    """Import the nested-copy (`pyskl/pyskl/`, SURVEY §0.1) sparse family:
    AAGCN_sparse, DGSTGCN_sparse, Assemble_sparse, SMoEAssemble_sparse.

    These files do ABSOLUTE imports of the outer package
    (`from pyskl.models.gcns.utils import gcn_sparse, tcn_sparse`, SMoE.py:4)
    and relative imports inside the nested copy (`from .utils import ...`,
    which resolves to the NESTED gcns/utils whose gcn_sparse.py differs from
    the outer one).  We alias the refpyskl scaffolding under the real name
    `pyskl` and materialize `pyskl.pyskl` package structure over the nested
    sources.
    """
    load_ref_backbones()
    NEST = f"{REF}/pyskl/pyskl"

    # absolute `pyskl` -> the refpyskl scaffolding (same real source files)
    for ref_name in ("refpyskl", "refpyskl.utils", "refpyskl.models",
                     "refpyskl.models.builder", "refpyskl.models.gcns",
                     "refpyskl.models.gcns.utils"):
        pub = ref_name.replace("refpyskl", "pyskl", 1)
        if pub not in sys.modules:
            sys.modules[pub] = sys.modules[ref_name]

    # nested package over the real nested sources
    graph_mod = load_ref_graph()
    _ensure_pkg("pyskl.pyskl", NEST)
    nutils = _ensure_pkg("pyskl.pyskl.utils", f"{NEST}/utils")
    nutils.Graph = graph_mod.Graph          # graph.py identical to outer
    nutils.cache_checkpoint = lambda x: x
    _ensure_pkg("pyskl.pyskl.models", f"{NEST}/models")

    class _Registry:
        def register_module(self, *a, **k):
            def deco(cls):
                return cls
            return deco

    nbuilder = _ensure_stub_module("pyskl.pyskl.models.builder",
                                   BACKBONES=_Registry(), HEADS=_Registry(),
                                   RECOGNIZERS=_Registry(), LOSSES=_Registry())
    nbuilder.__package__ = "pyskl.pyskl.models"
    _ensure_pkg("pyskl.pyskl.models.gcns", f"{NEST}/models/gcns")
    # the NESTED gcns/utils package (its gcn_sparse.py threads thresholds)
    importlib.import_module("pyskl.pyskl.models.gcns.utils")

    mods = {}
    for name in ("stgcn_sparse", "ctrgcn_sparse", "aagcn_sparse",
                 "dggcn_sparse", "Assemble_sparse", "SMoE"):
        mods[name] = importlib.import_module(f"pyskl.pyskl.models.gcns.{name}")
    return mods
