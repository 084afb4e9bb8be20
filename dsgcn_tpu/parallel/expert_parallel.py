"""Expert parallelism (EP) for the sparse mixture-of-experts backbone.

The reference SMoE runs every expert serially on one GPU
(pyskl/pyskl/models/gcns/SMoE.py:303-320).  On a TPU mesh the experts are
the natural parallel axis: each device holds ONE expert's parameters
(params sharded over the ``expert`` axis — E x model memory becomes 1 x per
chip), the batch and the gating weights are replicated, and the combine is
a single ``psum`` of gate-weighted pooled features over ICI.  The gating
base expert is evaluated replicated (it is one backbone forward — cheap
relative to the E-way fan-out it saves).

Requires homogeneous routed experts (same family + kwargs + ratio), which
is how stacking their parameter pytrees along a device-sharded leading axis
is possible; the heterogeneous case stays on the dense single-device path
(sparse/smoe.py).
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..sparse.smoe import NoisyTopKGate, SMoEAssembleSparse, _pool, make_expert

EXPERT_AXIS = "expert"


def make_expert_mesh(n_experts: int, devices: Sequence = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    assert n_experts <= len(devices), (n_experts, len(devices))
    return Mesh(np.asarray(devices[:n_experts]), (EXPERT_AXIS,))


def stack_pytrees(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def make_ep_smoe_eval(mesh: Mesh, model: SMoEAssembleSparse):
    """Returns (variables, x, current_epoch, max_epoch) -> (feature, aux)
    running the routed experts one-per-device over ``mesh``.

    ``variables`` are the plain SMoEAssembleSparse variables; this helper
    restacks expert{0..E-1} along the expert axis each call (cheap: it jits
    to device-local slices under shard_map).
    """
    fams = set(model.model_list[:-1])
    ratios = set(model.sparse_ratio[:-1])
    assert len(fams) == 1 and len(ratios) == 1, \
        "expert parallelism needs homogeneous routed experts"
    E = len(model.model_list) - 1
    assert mesh.shape[EXPERT_AXIS] == E, (dict(mesh.shape), E)
    fam, ratio = next(iter(fams)), next(iter(ratios))
    kw = model.expert_kwargs.get(fam, {})
    expert = make_expert(fam, ratio, model.graph_cfg, model.warm_up,
                         model.sparse_decay, kw, name="expert")
    base_fam = model.model_list[-1]
    base = make_expert(base_fam, model.sparse_ratio[-1], model.graph_cfg,
                       model.warm_up, model.sparse_decay,
                       model.expert_kwargs.get(base_fam, {}), name="base")
    gate = NoisyTopKGate(E, model.k_num, model.noisy_gating, name="gate")
    from functools import lru_cache

    from ..sparse.smoe import cv_squared

    @lru_cache(maxsize=None)
    def _jitted(sp_expert, sp_base):
        # sparsity is a trace-time constant (the percentile threshold's
        # kth index is shape-level), so jit per schedule value — epochs
        # repeat the same value, the cache makes this free
        def local(ep, es, bp, bs, gp, x):
            e = jax.lax.axis_index(EXPERT_AXIS)
            feat = _pool(base.apply({"params": bp, "batch_stats": bs}, x,
                                    sp_base, train=False))
            gates, load = gate.apply({"params": gp}, feat, train=False)
            my_p = jax.tree.map(lambda a: a[0], ep)  # local shard: (1, ...)
            my_s = jax.tree.map(lambda a: a[0], es)
            out = _pool(expert.apply({"params": my_p, "batch_stats": my_s},
                                     x, sp_expert, train=False))
            contrib = gates[:, e][:, None] * out
            combined = jax.lax.psum(contrib, EXPERT_AXIS)
            aux = model.loss_coef * (cv_squared(gates.sum(0))
                                     + cv_squared(load))
            return combined, aux

        sharded = jax.shard_map(
            local, mesh=mesh,
            in_specs=(P(EXPERT_AXIS), P(EXPERT_AXIS), P(), P(), P(), P()),
            out_specs=(P(), P()),
            check_vma=False)
        return jax.jit(sharded)

    def run(variables, x, current_epoch, max_epoch):
        params, stats = variables["params"], variables.get("batch_stats", {})
        ep = stack_pytrees([params[f"expert{i}"] for i in range(E)])
        es = stack_pytrees([stats[f"expert{i}"] for i in range(E)])
        sp_e = float(expert.epoch_sparsity(current_epoch, max_epoch))
        sp_b = float(base.epoch_sparsity(current_epoch, max_epoch))
        return _jitted(sp_e, sp_b)(ep, es, params[f"expert{E}"],
                                   stats[f"expert{E}"], params["gate"], x)

    return run
