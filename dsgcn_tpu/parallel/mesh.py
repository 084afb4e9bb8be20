"""Device mesh and sharding helpers.

The reference scales only by data parallelism over NCCL DDP (SURVEY §2.9,
apis/train.py:98-102).  The TPU-native equivalent: one ``jax.sharding.Mesh``
over all chips with a ``data`` axis (and an optional ``graph`` axis reserved
for joint-partition parallelism), batch sharded over ``data``, parameters
replicated, gradients reduced with ``psum`` over ICI.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
GRAPH_AXIS = "graph"


def make_mesh(n_data: Optional[int] = None, n_graph: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh of shape (data, graph); defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_graph
    assert n_data * n_graph <= len(devices), \
        f"need {n_data * n_graph} devices, have {len(devices)}"
    dev = np.asarray(devices[: n_data * n_graph]).reshape(n_data, n_graph)
    return Mesh(dev, (DATA_AXIS, GRAPH_AXIS))


def make_multihost_mesh(n_graph: int = 1) -> Mesh:
    """Two-level mesh for multi-host slices: the data axis spans hosts so its
    collectives (gradient psum) ride DCN only at the outer level, while the
    graph axis stays inside a host's ICI domain (SURVEY §5.8 plan).

    Call after jax.distributed.initialize(); falls back to :func:`make_mesh`
    on a single process.
    """
    if jax.process_count() == 1:
        return make_mesh(n_graph=n_graph)
    devs = jax.devices()
    n_slices = len({getattr(d, "slice_index", 0) for d in devs})
    if n_slices == jax.process_count():
        import jax.experimental.mesh_utils as mesh_utils
        devices = mesh_utils.create_hybrid_device_mesh(
            mesh_shape=(len(devs) // jax.process_count() // n_graph, n_graph),
            dcn_mesh_shape=(jax.process_count(), 1),
        )
    else:
        # no per-process slice topology (CPU hosts, forced-host meshes, or
        # several processes per slice): hand-build the same layout — hosts
        # contiguous along the outer (DCN) level of the data axis, so each
        # host's shard stays on its devices
        devs = sorted(devs, key=lambda d: (d.process_index, d.id))
        devices = np.asarray(devs).reshape(-1, n_graph)
    return Mesh(devices, (DATA_AXIS, GRAPH_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) dim split over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Device-put a host batch with its leading dim over the data axis.

    Multi-process: each host's loader yields its own (disjoint) shard of the
    global batch — assemble the global array from the per-process pieces, so
    the gradient psum inside the step reduces over hosts exactly like NCCL
    all-reduce does for the reference's per-rank DDP batches."""
    s = batch_sharding(mesh)
    if jax.process_count() == 1:
        return jax.tree.map(lambda x: jax.device_put(x, s), batch)
    nproc = jax.process_count()

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(
            s, x, (x.shape[0] * nproc,) + x.shape[1:])

    return jax.tree.map(put, batch)


def replicate(tree, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, r), tree)
