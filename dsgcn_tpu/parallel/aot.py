"""AOT TPU compilation of the joint-partition train step (no chips needed).

"Compiles on the CPU mesh" does not imply "compiles for TPU": Mosaic/XLA can
reject TPU lowerings that interpret fine (the ms_tcn stride-2 kernel did
exactly that).  This module lowers + compiles the FULL DS-GCN jp train step —
the 2D (data x graph) mesh program of parallel/train.py, with the in-model
ring collectives of the dgphgcn1 aggregation (reference gcn.py:2341-2361
sharded over joints) — against a detached v5e topology description
(jax.experimental.topologies), so the official bench can certify every round
that the multi-chip path lowers for the real TPU target and record its
collective footprint (ppermute count / bytes) from the compiled HLO.
"""
from __future__ import annotations

import re
from typing import Dict

import numpy as np

_SHAPE_BYTES = {"f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "pred": 1,
                "s8": 1, "u8": 1, "f64": 8, "s64": 8, "u64": 8}


def _hlo_collective_stats(hlo: str) -> Dict[str, float]:
    """Count collective ops and sum their result bytes from HLO text."""
    stats: Dict[str, float] = {}
    for op in ("collective-permute", "all-reduce", "all-gather",
               "reduce-scatter", "all-to-all"):
        # sync form:   %cp.1 = f32[2,16,5,24]{...} collective-permute(
        # async form:  %cp.2 = (f32[...], f32[...]) collective-permute-start(
        # (the matching *-done is the same transfer — not counted again)
        pat = re.compile(
            r"= *\(?([a-z0-9]+)\[([0-9,]*)\][^=]*? " + re.escape(op)
            + r"(?:-start)?\(")
        n, total = 0, 0
        for m in pat.finditer(hlo):
            dt, dims = m.group(1), m.group(2)
            n += 1
            elems = int(np.prod([int(d) for d in dims.split(",") if d] or [1]))
            total += elems * _SHAPE_BYTES.get(dt, 4)
        if n:
            stats[f"{op}_count"] = n
            stats[f"{op}_bytes"] = total
    return stats


def aot_compile_jp_train(n_graph: int = 5, topology: str = "v5e:2x4",
                         t: int = 100, batch_per_device: int = 2,
                         num_classes: int = 60) -> Dict[str, float]:
    """Lower + compile the jp DS-GCN train step for a detached TPU topology.

    Returns collective stats (+ ``ok``/``topology``) from the compiled HLO.
    Raises whatever the TPU compiler raises on a lowering failure — callers
    that want a soft-fail wrap this in try/except and report ``ok=False``.
    """
    import jax
    import jax.numpy as jnp
    from jax.experimental import topologies
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..core.train import TrainState, make_optimizer
    from ..models.builder import build_model
    from .mesh import DATA_AXIS, GRAPH_AXIS, make_mesh
    from .train import make_jp_train_step

    td = topologies.get_topology_desc(topology_name=topology, platform="tpu")
    n_data = max(len(td.devices) // n_graph, 1)
    mesh = make_mesh(n_data=n_data, n_graph=n_graph,
                     devices=td.devices[: n_data * n_graph])

    bb = dict(type="DGSTGCN", gcn_type="dgphgcn1", gcn_ratio=0.125,
              gcn_node_attention=True, gcn_edge_attention=True,
              gcn_decompose=True, gcn_subset_wise=True,
              gcn_ctr="T", gcn_ada="T", tcn_type="dgmstcn",
              gcn_use_pallas=False,
              graph_cfg=dict(layout="nturgb+d", mode="random", num_filter=3,
                             init_off=0.04, init_std=0.02, seed=0))
    head = dict(type="GCNHead", num_classes=num_classes, in_channels=256)
    # param shapes from the plain model (graph_axis tracing needs the mesh
    # context; shapes are identical — same trick as dryrun_multichip)
    plain = build_model(dict(type="RecognizerGCN", backbone=dict(bb),
                             cls_head=head))
    model = build_model(dict(type="RecognizerGCN",
                             backbone=dict(bb, graph_axis=GRAPH_AXIS),
                             cls_head=head))

    nb = batch_per_device * n_data
    kp = jax.ShapeDtypeStruct((nb, 2, t, 25, 3), jnp.float32)
    # abstract state: shapes via eval_shape (no device computation at all)
    variables = jax.eval_shape(
        lambda k, x: plain.init(k, x, train=False),
        jax.ShapeDtypeStruct((2,), jax.random.PRNGKey(0).dtype),
        jax.ShapeDtypeStruct((2, 2, t, 25, 3), jnp.float32))
    tx, _ = make_optimizer(lr=0.1, total_steps=10)
    state = jax.eval_shape(
        lambda p, s: TrainState.create(model.apply, p, s, tx),
        variables["params"], variables["batch_stats"])

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    shard = lambda sh, sds: jax.tree.map(          # noqa: E731
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh), sds)
    state_in = shard(repl, state)
    batch_in = {"keypoint": jax.ShapeDtypeStruct(kp.shape, kp.dtype,
                                                 sharding=data),
                "label": jax.ShapeDtypeStruct((nb,), jnp.int32,
                                              sharding=data)}
    rng_in = jax.ShapeDtypeStruct((2,), jnp.uint32, sharding=repl)

    step = make_jp_train_step(mesh)
    compiled = step.lower(state_in, batch_in, rng_in).compile()
    hlo = compiled.as_text()
    out = {"ok": True, "topology": topology, "n_graph": n_graph,
           "n_data": n_data, "hlo_bytes": len(hlo)}
    out.update(_hlo_collective_stats(hlo))
    try:
        out["flops"] = float(compiled.cost_analysis().get("flops", 0.0))
    except Exception:
        pass
    return out
