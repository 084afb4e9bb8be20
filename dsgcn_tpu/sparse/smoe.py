"""Sparse mixture-of-experts over sparse GCN backbones (reference
`pyskl/pyskl/models/gcns/SMoE.py` — nested-copy research extra, SURVEY §0.1).

Noisy top-k gating (Shazeer et al. 2017, SMoE.py:246-283) over whole-backbone
experts; the LAST entry of ``model_list`` is the gating "base" expert whose
pooled feature feeds the gate (SMoE.py:285-295).

TPU-first reformulation: the reference's SparseDispatcher routes each sample
to its top-k experts with VARIABLE per-expert batches (SMoE.py:17-113) —
dynamic shapes XLA cannot compile.  We compute every expert on the full
batch and weight-sum by the (mostly zero) gate matrix: eval-mode outputs are
EXACTLY the dispatcher's (zero gates contribute zero), shapes are static,
and the E-way fan-out is embarrassingly parallel — see
parallel/expert_parallel.py for the 'expert' mesh axis.  Documented
divergence: in train mode the reference's expert BatchNorms see only their
routed samples; ours see the full batch (static shapes).  The reference's
own data_bn is created but never used in forward (SMoE.py:155 vs :290-320)
— not reproduced.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import FrozenDict

from ..graph import GraphConfig
from ..ops.common import Array
from .models import SparseCTRGCN, SparseSTGCNExact
from .nested import SparseAAGCN, SparseDGSTGCN

FAMILIES = ("ST-GCN", "AA-GCN", "CTR-GCN", "DG-GCN")


def cv_squared(x: Array) -> Array:
    """Squared coefficient of variation; 0 for a single element
    (SMoE.py:188-204; torch .var() is Bessel-corrected)."""
    if x.shape[0] == 1:
        return jnp.zeros((), x.dtype)
    eps = 1e-10
    return x.var(ddof=1) / (x.mean() ** 2 + eps)


def _normal_cdf(z: Array) -> Array:
    return 0.5 * (1.0 + jax.lax.erf(z / np.sqrt(2.0).astype(np.float32)))


class NoisyTopKGate(nn.Module):
    """Noisy top-k gating (SMoE.py:246-283): zero-init w_gate/w_noise,
    softplus noise std at train time, softmax over the top-k logits, and the
    differentiable load estimate via the in-top-k probability under the
    noise distribution (_prob_in_top_k, SMoE.py:206-237)."""
    num_experts: int
    k: int = 1
    noisy_gating: bool = True
    noise_epsilon: float = 1e-2

    @nn.compact
    def __call__(self, feat: Array, *, train: bool,
                 rng: Optional[Array] = None,
                 noise: Optional[Array] = None):
        E, k = self.num_experts, self.k
        assert k <= E
        w_gate = self.param("w_gate", nn.initializers.zeros_init(),
                            (feat.shape[-1], E))
        w_noise = self.param("w_noise", nn.initializers.zeros_init(),
                             (feat.shape[-1], E))
        clean = feat @ w_gate
        use_noise = self.noisy_gating and train
        if use_noise:
            raw = feat @ w_noise
            std = jax.nn.softplus(raw) + self.noise_epsilon
            if noise is None:
                assert rng is not None, "train-time gating needs an rng"
                noise = jax.random.normal(rng, clean.shape, clean.dtype)
            logits = clean + noise * std
        else:
            logits = clean
        m = min(k + 1, E)
        top_vals, top_idx = jax.lax.top_k(logits, m)
        topk_gates = jax.nn.softmax(top_vals[:, :k], axis=1)
        gates = jnp.zeros_like(logits).at[
            jnp.arange(logits.shape[0])[:, None], top_idx[:, :k]
        ].set(topk_gates)
        if use_noise and k < E:
            thr_in = top_vals[:, k][:, None]
            thr_out = top_vals[:, k - 1][:, None]
            prob = jnp.where(logits > thr_in,
                             _normal_cdf((clean - thr_in) / std),
                             _normal_cdf((clean - thr_out) / std))
            load = prob.sum(0)
        else:
            load = (gates > 0).sum(0).astype(feat.dtype)
        return gates, load


def _pool(feat: Array) -> Array:
    """(N, M, T, V, C) -> (N, C): avg over T,V then mean over persons
    (GCN_feature, SMoE.py:326-339)."""
    return feat.mean(axis=(2, 3)).mean(axis=1)


def make_expert(family: str, ratio: float, graph_cfg: GraphConfig,
                warm_up: int, sparse_decay: bool, kwargs, name: str):
    """One sparse backbone expert with NESTED-copy threshold semantics
    (SMoE.py:158-178 builds the nested STGCN/AAGCN/CTRGCN/DGSTGCN_sparse)."""
    kw = dict(kwargs)
    common = dict(graph_cfg=graph_cfg, linear_sparsity=ratio,
                  warm_up=warm_up, sparse_decay=sparse_decay, name=name)
    if family == "ST-GCN":
        return SparseSTGCNExact(global_threshold=True, **common, **kw)
    if family == "AA-GCN":
        return SparseAAGCN(**common, **kw)
    if family == "CTR-GCN":
        return SparseCTRGCN(pool_all_scores=True, **common, **kw)
    if family == "DG-GCN":
        return SparseDGSTGCN(**common, **kw)
    raise ValueError(f"unknown expert family {family!r} (not in {FAMILIES})")


class SMoEAssembleSparse(nn.Module):
    """SMoEAssemble_sparse backbone (SMoE.py:115-400).

    ``model_list[:-1]`` are the routed experts, ``model_list[-1]`` the gating
    base.  Returns (pooled feature (N, C), load-balancing aux loss
    ``loss_coef * (cv²(importance) + cv²(load))``, SMoE.py:295-302).
    ``expert_kwargs`` maps a family name to extra backbone kwargs (e.g.
    num_stages) — the reference's ST_kwargs/AA_kwargs/CTR_kwargs/DG_kwargs.
    """
    model_list: Tuple[str, ...]
    sparse_ratio: Tuple[float, ...]
    graph_cfg: GraphConfig = GraphConfig(layout="nturgb+d", mode="spatial")
    expert_kwargs: FrozenDict = FrozenDict()
    out_channel: int = 256
    k_num: int = 1
    noisy_gating: bool = True
    warm_up: int = 0
    sparse_decay: bool = False
    loss_coef: float = 1e-2

    @nn.compact
    def __call__(self, x: Array, current_epoch, max_epoch, *, train: bool,
                 rng: Optional[Array] = None,
                 gate_noise: Optional[Array] = None):
        assert len(self.model_list) == len(self.sparse_ratio)
        E = len(self.model_list) - 1
        assert self.k_num <= E
        experts = [
            make_expert(f, r, self.graph_cfg, self.warm_up,
                        self.sparse_decay,
                        self.expert_kwargs.get(f, FrozenDict()),
                        name=f"expert{i}")
            for i, (f, r) in enumerate(zip(self.model_list,
                                           self.sparse_ratio))
        ]
        base = experts[-1]
        sp = base.epoch_sparsity(current_epoch, max_epoch)
        feat = _pool(base(x, sp, train=train))
        gates, load = NoisyTopKGate(E, self.k_num, self.noisy_gating,
                                    name="gate")(feat, train=train, rng=rng,
                                                 noise=gate_noise)
        importance = gates.sum(0)
        aux = self.loss_coef * (cv_squared(importance) + cv_squared(load))
        combined = 0.0
        for i in range(E):
            sp_i = experts[i].epoch_sparsity(current_epoch, max_epoch)
            out_i = _pool(experts[i](x, sp_i, train=train))
            combined = combined + gates[:, i:i + 1] * out_i
        self.sow("intermediates", "gates", gates)
        return combined, aux


def _stage_mask(block_params, ratio):
    """One stage's pruned-weight vector (get_mask, SMoE.py:363-380): the
    INVERTED mask — weights whose score is <= the ratio-percentile
    threshold; sparse convs only (kernels WITH a sibling score — the
    reference's is_mask/is_score pairs; plain attention convs have
    neither)."""
    from collections.abc import Mapping

    from .supermask import torch_percentile

    scores, weights = [], []

    def walk(node):
        if not isinstance(node, Mapping):
            return
        if "score" in node and "kernel" in node:
            scores.append(jnp.ravel(node["score"]))
            weights.append(jnp.ravel(node["kernel"]))
        for v in node.values():
            walk(v)

    walk(block_params)
    s = jnp.concatenate(scores)
    w = jnp.concatenate(weights)
    thr = torch_percentile(s, ratio * 100.0)
    return w * (s <= thr)


def _stage_mask_penalty(blocks_with_ratios, lam: float, penalty: str):
    terms = [_stage_mask(bp, r) for bp, r in blocks_with_ratios]
    if penalty == "GL":
        return lam * jnp.linalg.norm(jnp.concatenate(terms))
    if penalty == "GSGL":
        return lam * sum(jnp.linalg.norm(t) for t in terms)
    raise ValueError(f"unsupported penalty: {penalty}")


def smoe_regularize(params, model_list: Tuple[str, ...],
                    sparse_ratio: Tuple[float, ...], lam: float,
                    penalty: str = "GSGL"):
    """SMoE.regularize (SMoE.py:341-400): group-lasso over each expert
    stage's PRUNED weights.

    Faithful quirk: the reference's try/except/ELSE appends `.gcn`-attribute
    experts' stage masks TWICE per stage (:385-395 — try succeeds AND the
    else clause runs again), while `.net`-attribute (CTR-GCN) experts append
    once; under GSGL that doubles the ST/AA/DG penalties.
    """
    blocks = []
    for j, family in enumerate(model_list):
        ep = params[f"expert{j}"]
        reps = 1 if family == "CTR-GCN" else 2   # the double-append quirk
        for bk in sorted((k for k in ep if k.startswith("block")),
                         key=lambda k: int(k[5:])):
            blocks.extend([(ep[bk], sparse_ratio[j])] * reps)
    return _stage_mask_penalty(blocks, lam, penalty)
