"""Per-op device-time aggregation from jax.profiler traces.

The reference has no profiling subsystem at all (SURVEY §5.1 — only an FPS
notebook); this supplies the missing roofline-debugging loop: capture a trace
with ``jax.profiler.trace``, then ``op_table(logdir)`` returns where device
time actually went, aggregated over the XLA op names on the TPU op-trace
lines.  Decoding uses a vendored minimal XPlane proto (``xplane.proto``) —
the tensorboard profile plugin in this image cannot parse current traces.

Usage::

    with jax.profiler.trace("/tmp/tr"):
        fn(*args); jax.block_until_ready(out)
    for row in op_table("/tmp/tr")[:30]:
        print(row)
"""
from __future__ import annotations

import collections
import glob
import os
from typing import Dict, List, Tuple

from . import xplane_pb2


def _load_xspaces(logdir: str):
    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                      recursive=True)
    spaces = []
    for p in paths:
        xs = xplane_pb2.XSpace()
        with open(p, "rb") as f:
            xs.ParseFromString(f.read())
        spaces.append(xs)
    return spaces


#: Device-plane line names that duplicate op time (whole-step spans) rather
#: than carrying leaf XLA ops.  Matched EXACTLY (case-insensitive) — a
#: substring heuristic would silently drop op lines whose names merely
#: contain 'step' (ADVICE r3).
STEP_LINE_NAMES = frozenset({"steps", "step", "xla modules", "framework ops"})


def op_table(logdir: str, plane_substr: str = "TPU",
             skip_lines: frozenset = STEP_LINE_NAMES,
             ) -> List[Tuple[str, float, int]]:
    """[(op_name, total_ms, count)] sorted by time desc, from device planes.

    Aggregates leaf XEvents on every line of planes whose name contains
    ``plane_substr`` (e.g. '/device:TPU:0').  jax/XLA op-trace events carry
    the fused-computation name; identical names are summed.  Lines whose
    (lowercased) name is in ``skip_lines`` are whole-step/module spans that
    would double-count the ops under them.

    If no plane matches ``plane_substr`` (e.g. the remote-tunnel platform
    names its device plane '/device:axon:0'), falls back to every
    '/device:' plane except the host CPU one — an empty table from a
    populated trace is always a plane-name mismatch, not an empty device.
    """
    totals: Dict[str, float] = collections.defaultdict(float)
    counts: Dict[str, int] = collections.defaultdict(int)
    spaces = list(_load_xspaces(logdir))
    names = [p.name for xs in spaces for p in xs.planes]
    if not any(plane_substr in n for n in names):
        matches = lambda n: ("/device:" in n and "CPU" not in n)  # noqa: E731
    else:
        matches = lambda n: plane_substr in n                     # noqa: E731
    for xs in spaces:
        for plane in xs.planes:
            if not matches(plane.name):
                continue
            meta = plane.event_metadata
            for line in plane.lines:
                # op-trace lines carry XLA ops; step lines duplicate time
                lname = (line.display_name or line.name).lower()
                if lname in skip_lines:
                    continue
                for ev in line.events:
                    md = meta.get(ev.metadata_id)
                    name = (md.display_name or md.name) if md else "?"
                    totals[name] += ev.duration_ps / 1e9   # ps -> ms
                    counts[name] += 1
    rows = [(n, t, counts[n]) for n, t in totals.items()]
    rows.sort(key=lambda r: -r[1])
    return rows


def line_names(logdir: str) -> List[Tuple[str, str, int]]:
    """Debug helper: (plane, line, n_events) inventory of a trace."""
    out = []
    for xs in _load_xspaces(logdir):
        for plane in xs.planes:
            for line in plane.lines:
                out.append((plane.name, line.display_name or line.name,
                            len(line.events)))
    return out
