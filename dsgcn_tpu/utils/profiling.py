"""Profiling utilities: jax.profiler traces + simple roofline counters.

The reference has no profiling subsystem (SURVEY §5.1 — only an FPS notebook);
this is greenfield: trace capture around jitted steps, and a FLOP/byte
estimator for the GCN-block contractions to report achieved vs peak rates.
"""
from __future__ import annotations

import contextlib
import json
import os
import time
from typing import Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler trace (view with TensorBoard or xprof)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def gcn_block_flops(batch: int, T: int, V: int, C_in: int, C_out: int,
                    K: int, ratio: float = 0.125,
                    ms_branches: int = 6) -> Dict[str, float]:
    """Analytic FLOP counts for one DG-block (pre/post 1x1, dynamic graphs,
    aggregation, multi-scale TCN) — the roofline denominator."""
    Cm = int(ratio * C_out)
    pos = batch * T * V
    pre = 2 * pos * C_in * K * Cm
    post = 2 * pos * K * Cm * C_out
    qk = 2 * 2 * batch * V * C_in * K * Cm          # conv1+conv2 on T-pooled x
    graphs = 2 * batch * K * Cm * V * V             # diff graph build
    ada = 2 * batch * K * Cm * V * V                # outer product
    agg = 2 * batch * T * K * Cm * V * V            # per-channel aggregation
    mid = C_out // ms_branches
    tcn = 2 * pos * C_out * mid * ms_branches + \
        2 * pos * mid * 3 * 4 + 2 * pos * C_out * C_out
    return dict(pre=pre, post=post, qk=qk, graphs=graphs, ada=ada, agg=agg,
                tcn=tcn, total=pre + post + qk + graphs + ada + agg + tcn)


def model_flops(batch: int, T: int = 100, V: int = 25,
                channels=(64,) * 4 + (128,) * 3 + (256,) * 3,
                strides=(1, 1, 1, 1, 2, 1, 1, 2, 1, 1)) -> float:
    """Approximate forward FLOPs of a 10-stage DG-STGCN at the given batch."""
    total = 0.0
    t = T
    c_in = 3
    for c_out, s in zip(channels, strides):
        total += gcn_block_flops(batch, t, V, c_in, c_out, K=3)["total"]
        t = t // s
        c_in = c_out
    return total


class StepTimer:
    """Rolling wall-clock step timer emitting steps/s and achieved TFLOP/s."""

    def __init__(self, flops_per_step: Optional[float] = None, window: int = 50):
        self.flops = flops_per_step
        self.window = window
        self._times = []

    def tick(self):
        self._times.append(time.perf_counter())
        if len(self._times) > self.window + 1:
            self._times.pop(0)

    def stats(self) -> Dict[str, float]:
        if len(self._times) < 2:
            return {}
        dt = (self._times[-1] - self._times[0]) / (len(self._times) - 1)
        out = dict(step_seconds=dt, steps_per_sec=1.0 / dt)
        if self.flops:
            out["achieved_tflops"] = self.flops / dt / 1e12
        return out
