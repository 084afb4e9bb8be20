"""Import reference (pyskl/torch) checkpoints into dsgcn_tpu variables.

Maps a torch ``state_dict`` (flat name -> ndarray) into our flax params /
batch_stats pytrees by NAME, so reference-trained weights (mmcv .pth
checkpoints, key layout ``backbone.gcn.{i}.{gcn,tcn,residual}...``,
``cls_head.fc_cls``) load directly into the TPU models.  Covers the GCN
recognizer families: STGCN/STGCN++, AAGCN(+aahgcn), CTRGCN(+ctrhgcn),
DGSTGCN (dggcn/dghgcn/dgphgcn1) with all tcn types.

No torch dependency: pass any mapping of numpy arrays (e.g.
``{k: v.numpy() for k, v in torch.load(p)['state_dict'].items()}``).
"""
from __future__ import annotations

from typing import Any, Dict, Mapping, Tuple

import numpy as np

Arrays = Mapping[str, np.ndarray]


class _Scope:
    """View of a flat name->array dict under a prefix."""

    def __init__(self, d: Arrays, prefix: str = ""):
        self.d = d
        self.prefix = prefix

    def sub(self, name: str) -> "_Scope":
        p = f"{self.prefix}{name}."
        return _Scope(self.d, p)

    def __getitem__(self, name: str) -> np.ndarray:
        return np.asarray(self.d[self.prefix + name])

    def __contains__(self, name: str) -> bool:
        return (self.prefix + name) in self.d

    def has_sub(self, name: str) -> bool:
        p = f"{self.prefix}{name}."
        return any(k.startswith(p) for k in self.d)


def _dense(s: _Scope, name="") -> Dict:
    pfx = f"{name}." if name else ""
    w = s[f"{pfx}weight"]
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    out = {"kernel": w.T}
    if f"{pfx}bias" in s:
        out["bias"] = s[f"{pfx}bias"]
    return out


def _tconv(s: _Scope, name="conv") -> Dict:
    w = s[f"{name}.weight"]
    out = {"kernel": np.transpose(w, (2, 3, 1, 0))}
    if f"{name}.bias" in s:
        out["bias"] = s[f"{name}.bias"]
    return {"conv": out}


def _bn(s: _Scope, name="") -> Tuple[Dict, Dict]:
    pfx = f"{name}." if name else ""
    p = {"bn": {"scale": s[f"{pfx}weight"], "bias": s[f"{pfx}bias"]}}
    st = {"bn": {"mean": s[f"{pfx}running_mean"],
                 "var": s[f"{pfx}running_var"]}}
    return p, st


def _down(s: _Scope) -> Tuple[Dict, Dict]:
    """Sequential(Conv2d, BN) residual projection -> down_conv/down_bn."""
    p, st = {}, {}
    if s.has_sub("down"):
        p["down_conv"] = _dense(s, "down.0")
        bp, bs = _bn(s, "down.1")
        p["down_bn"], st["down_bn"] = bp, bs
    return p, st


# ---------------------------------------------------------------------------
# GCN units
# ---------------------------------------------------------------------------

def _unit_gcn(s: _Scope) -> Tuple[Dict, Dict]:
    p = {"conv": _dense(s, "conv")}
    bp, bs = _bn(s, "bn")
    p["bn"], st = bp, {"bn": bs}
    if "A" in s:
        p["A"] = s["A"]
    if "PA" in s:
        p["PA"] = s["PA"]
    dp, ds = _down(s)
    p.update(dp)
    st.update(ds)
    return p, st


def _unit_aagcn(s: _Scope) -> Tuple[Dict, Dict]:
    p, st = {}, {}
    bp, bs = _bn(s, "bn")
    p["bn"], st["bn"] = bp, bs
    dp, ds = _down(s)
    p.update(dp)
    st.update(ds)
    i = 0
    while s.has_sub(f"conv_d.{i}"):
        p[f"conv_d{i}"] = _dense(s, f"conv_d.{i}")
        if s.has_sub(f"conv_a.{i}"):
            p[f"conv_a{i}"] = _dense(s, f"conv_a.{i}")
            p[f"conv_b{i}"] = _dense(s, f"conv_b.{i}")
        if s.has_sub(f"conv_edge.{i}"):
            p[f"conv_edge{i}"] = _dense(s, f"conv_edge.{i}")
        i += 1
    for k in ("A", "alpha"):
        if k in s:
            p[k] = s[k]
    if s.has_sub("conv_sa"):
        def c1d(name):
            w = s[f"{name}.weight"]
            return {"kernel": np.transpose(w, (2, 1, 0)),
                    "bias": s[f"{name}.bias"]}
        p["att"] = {"conv_sa": c1d("conv_sa"), "conv_ta": c1d("conv_ta"),
                    "fc1c": _dense(s, "fc1c"), "fc2c": _dense(s, "fc2c")}
    return p, st


def _ctrgc(s: _Scope) -> Dict:
    out = {f"conv{j}": _dense(s, f"conv{j}") for j in (1, 2, 3, 4)
           if s.has_sub(f"conv{j}")}
    if s.has_sub("edge_att_conv"):
        out["edge_att_conv"] = _dense(s, "edge_att_conv")
    if s.has_sub("nodeconv"):
        out["nodeconv"] = _dense(s, "nodeconv")
    if "beta" in s:
        out["beta"] = s["beta"]
    return out


def _unit_ctrgcn(s: _Scope) -> Tuple[Dict, Dict]:
    p, st = {}, {}
    bp, bs = _bn(s, "bn")
    p["bn"], st["bn"] = bp, bs
    dp, ds = _down(s)
    p.update(dp)
    st.update(ds)
    i = 0
    while s.has_sub(f"convs.{i}"):
        p[f"convs{i}"] = _ctrgc(s.sub(f"convs.{i}"))
        i += 1
    for k in ("A", "alpha"):
        p[k] = s[k]
    return p, st


def _dg_gcn(s: _Scope) -> Tuple[Dict, Dict]:
    """dggcn / dghgcn / dgphgcn1 (shared naming)."""
    p, st = {}, {}
    for k in ("A", "alpha", "beta"):
        p[k] = s[k]
    p["pre_conv"] = _dense(s, "pre.0")
    bp, bs = _bn(s, "pre.1")
    p["pre_bn"], st["pre_bn"] = bp, bs
    p["post_conv"] = _dense(s, "post")
    bp, bs = _bn(s, "bn")
    p["bn"], st["bn"] = bp, bs
    dp, ds = _down(s)
    p.update(dp)
    st.update(ds)
    for name in ("conv1", "conv2", "conv1_se", "edge_linears", "ada_linears",
                 "nodeconv"):
        if s.has_sub(name):
            p[name] = _dense(s, name)
    if s.has_sub("nodeconv.0"):   # dgphgcn1 target_specific Sequential
        p.pop("nodeconv", None)
        p["nodeconv_conv"] = _dense(s, "nodeconv.0")
        bp, bs = _bn(s, "nodeconv.1")
        p["nodeconv_bn"], st["nodeconv_bn"] = bp, bs
    if s.has_sub("edge_linears.0"):   # Sequential wrapper variant
        p["edge_linears"] = _dense(s, "edge_linears.0")
    return p, st


# ---------------------------------------------------------------------------
# TCN units
# ---------------------------------------------------------------------------

def _unit_tcn(s: _Scope) -> Tuple[Dict, Dict]:
    p = {"conv": _tconv(s, "conv")["conv"]}
    p = {"conv": {"conv": p["conv"]}}
    st = {}
    if s.has_sub("bn"):
        bp, bs = _bn(s, "bn")
        p["bn"], st["bn"] = bp, bs
    return p, st


def _unitmlp(s: _Scope) -> Tuple[Dict, Dict]:
    w = s["conv.weight"]                 # (out, 1, k) depthwise Conv1d
    k = w.shape[-1]
    p = {"conv_kernel": np.transpose(w, (2, 1, 0)).reshape(k, 1, 1, -1),
         "conv_bias": s["conv.bias"],
         "conv1": _dense(s, "conv1")}
    st = {}
    if s.has_sub("bn"):
        bp, bs = _bn(s, "bn")
        p["bn"], st["bn"] = bp, bs
    if s.has_sub("conv2"):
        p["conv2"] = _tconv(s, "conv2")
        p["alpha"] = s["alpha"]
    return p, st


def _ms_branches(s: _Scope, kind: str) -> Tuple[Dict, Dict]:
    p, st = {}, {}
    i = 0
    while s.has_sub(f"branches.{i}"):
        br = s.sub(f"branches.{i}")
        if br.has_sub("3"):              # (1x1, BN, ReLU, unit)
            p[f"branch{i}_pre"] = _dense(br, "0")
            bp, bs = _bn(br, "1")
            p[f"branch{i}_bn"], st[f"branch{i}_bn"] = bp, bs
            if br.has_sub("3.conv.weight") or br.has_sub("3.conv"):
                if kind == "mlp" and br.has_sub("3.conv1"):
                    mp, ms = _unitmlp(br.sub("3"))
                    p[f"branch{i}_mlp"] = mp
                    if ms:
                        st[f"branch{i}_mlp"] = ms
                else:
                    p[f"branch{i}_tcn"] = {"conv": _tconv(br.sub("3"))["conv"]}
                    p[f"branch{i}_tcn"] = {
                        "conv": {"conv": _tconv(br, "3.conv")["conv"]}}
            # max branch: Sequential(conv, bn, relu, maxpool) has no '3.conv'
        elif br.has_sub("0"):            # max branch (conv, bn, relu, pool)
            p[f"branch{i}_pre"] = _dense(br, "0")
            bp, bs = _bn(br, "1")
            p[f"branch{i}_bn"], st[f"branch{i}_bn"] = bp, bs
        else:                            # bare 1x1 Conv2d
            p[f"branch{i}_conv"] = {"conv": _tconv(s, f"branches.{i}")["conv"]}
        i += 1
    return p, st


def _ctr_mstcn(s: _Scope) -> Tuple[Dict, Dict]:
    """CTR-GCN's MSTCN (reference msg3d_utils.py:64-142): per-branch
    Sequentials with trailing BNs and NO post-concat transform — maps onto
    flax CTRMSTCN (branch{i}_pre/_bn/_tcn, max branch _bn2, last 1x1
    branch{i}_conv+_bn)."""
    p, st = {}, {}
    i = 0
    while s.has_sub(f"branches.{i}"):
        br = s.sub(f"branches.{i}")
        if br.has_sub("3.conv"):          # (1x1, BN, ReLU, unit_tcn{conv,bn})
            p[f"branch{i}_pre"] = _dense(br, "0")
            bp, bs = _bn(br, "1")
            p[f"branch{i}_bn"], st[f"branch{i}_bn"] = bp, bs
            tp = {"conv": {"conv": _tconv(br, "3.conv")["conv"]}}
            bp, bs = _bn(br, "3.bn")
            tp["bn"] = bp
            p[f"branch{i}_tcn"] = tp
            st[f"branch{i}_tcn"] = {"bn": bs}
        elif br.has_sub("4"):             # (1x1, BN, ReLU, maxpool, BN)
            p[f"branch{i}_pre"] = _dense(br, "0")
            bp, bs = _bn(br, "1")
            p[f"branch{i}_bn"], st[f"branch{i}_bn"] = bp, bs
            bp, bs = _bn(br, "4")
            p[f"branch{i}_bn2"], st[f"branch{i}_bn2"] = bp, bs
        else:                             # (strided 1x1 conv, BN)
            p[f"branch{i}_conv"] = {"conv": _tconv(br, "0")["conv"]}
            bp, bs = _bn(br, "1")
            p[f"branch{i}_bn"], st[f"branch{i}_bn"] = bp, bs
        i += 1
    return p, st


def _mstcn(s: _Scope, kind: str = "tcn") -> Tuple[Dict, Dict]:
    bp, bs = _ms_branches(s, kind)
    p = {"branches": bp}
    st = {"branches": bs} if bs else {}
    p["transform_bn"], tb = _bn(s, "transform.0")
    st["transform_bn"] = tb
    p["transform_conv"] = _dense(s, "transform.2")
    p["bn"], nb = _bn(s, "bn")
    st["bn"] = nb
    if "add_coeff" in s:
        p["add_coeff"] = s["add_coeff"]
    return p, st


# ---------------------------------------------------------------------------
# block / backbone / model
# ---------------------------------------------------------------------------

_GCN_CONVERTERS = {
    "unit_gcn": _unit_gcn,
    "unit_aagcn": _unit_aagcn,
    "unit_ctrgcn": _unit_ctrgcn,
    "dg": _dg_gcn,
}


def _detect_gcn(s: _Scope) -> str:
    if s.has_sub("pre.0"):
        return "dg"
    if s.has_sub("convs.0"):
        return "unit_ctrgcn"
    if s.has_sub("conv_d.0"):
        return "unit_aagcn"
    return "unit_gcn"


def _detect_tcn(s: _Scope) -> str:
    if s.has_sub("branches.0"):
        if any(k.endswith("conv1.weight") and ".branches." in k
               for k in s.d if k.startswith(s.prefix)):
            return "msmlp"
        return "mstcn"
    if s.has_sub("conv1") and not s.has_sub("bn.running_mean"):
        return "unitmlp"
    if s.has_sub("conv1"):
        return "unitmlp"
    return "unit_tcn"


def _block(s: _Scope, gcn_attr="gcn", tcn_attr="tcn") -> Tuple[Dict, Dict]:
    p, st = {}, {}
    g = s.sub(gcn_attr)
    gp, gs = _GCN_CONVERTERS[_detect_gcn(g)](g)
    p["gcn"], st["gcn"] = gp, gs
    t = s.sub(tcn_attr)
    kind = _detect_tcn(t)
    if kind == "mstcn" and not t.has_sub("transform.0"):
        tp, ts = _ctr_mstcn(t)            # CTR-GCN MSTCN: no transform stage
    elif kind in ("mstcn", "msmlp"):
        tp, ts = _mstcn(t, "mlp" if kind == "msmlp" else "tcn")
    elif kind == "unitmlp":
        tp, ts = _unitmlp(t)
    else:
        tp, ts = _unit_tcn(t)
    p["tcn"], st["tcn"] = tp, ts
    if s.has_sub("residual"):
        rp, rs = _unit_tcn(s.sub("residual"))
        p["residual"] = {"down": rp}
        st["residual"] = {"down": rs}
    return p, st


def import_state_dict(state_dict: Arrays,
                      blocks_attr: str = "gcn",
                      gcn_attr: str = "gcn",
                      tcn_attr: str = "tcn") -> Dict[str, Any]:
    """torch RecognizerGCN state_dict -> {'params': ..., 'batch_stats': ...}.

    ``blocks_attr``: the backbone's ModuleList name ('gcn' for STGCN/AAGCN/
    DGSTGCN, 'net' for CTRGCN); CTRGCN uses gcn_attr='gcn1', tcn_attr='tcn1'.
    """
    # copy: torch .numpy() exports are views over live parameter memory — an
    # in-place optimizer step on the torch side would silently mutate them
    sd = {k: np.array(v) for k, v in state_dict.items()}
    root = _Scope(sd)
    bb = root.sub("backbone")
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    if bb.has_sub("data_bn") and "data_bn.weight" in bb:
        params["data_bn"] = {"bn": {"scale": bb["data_bn.weight"],
                                    "bias": bb["data_bn.bias"]}}
        stats["data_bn"] = {"bn": {"mean": bb["data_bn.running_mean"],
                                   "var": bb["data_bn.running_var"]}}
    i = 0
    while bb.has_sub(f"{blocks_attr}.{i}"):
        blk = bb.sub(f"{blocks_attr}.{i}")
        bp, bs = _block(blk, gcn_attr, tcn_attr)
        params[f"block{i}"] = bp
        stats[f"block{i}"] = bs
        i += 1

    out = {"params": {"backbone": params}, "batch_stats": {"backbone": stats}}
    if "cls_head.fc_cls.weight" in sd:
        out["params"]["head"] = {"fc_cls": {
            "kernel": sd["cls_head.fc_cls.weight"].T,
            "bias": sd["cls_head.fc_cls.bias"]}}
    return out


def load_torch_checkpoint(path: str, **kw) -> Dict[str, Any]:
    """Load an mmcv/pyskl .pth checkpoint file and convert."""
    import torch
    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    return import_state_dict({k: v.numpy() for k, v in sd.items()}, **kw)
