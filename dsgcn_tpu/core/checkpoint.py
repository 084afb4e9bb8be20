"""Checkpoint save/resume via orbax (TPU-native replacement for mmcv
save_checkpoint / auto-resume, reference tools/train.py:82-86,
epoch_based_sparse_runner.py:145-190).

Layout: <work_dir>/ckpt/<step>/ managed by orbax CheckpointManager; `latest`
resolution is the manager's own (replaces the latest.pth symlink).  Metadata
(epoch, config fingerprint) rides in a custom item.
"""
from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, work_dir: str, max_to_keep: int = 5,
                 save_interval_steps: int = 1):
        path = ocp.test_utils.erase_and_create_empty  # noqa: F841 (doc aid)
        self.dir = os.path.abspath(os.path.join(work_dir, "ckpt"))
        os.makedirs(self.dir, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                save_interval_steps=save_interval_steps,
                create=True,
            ),
        )

    def save(self, step: int, state, meta: Optional[Dict[str, Any]] = None,
             force: bool = False):
        args = {"state": ocp.args.StandardSave(_to_savable(state))}
        if meta:
            args["meta"] = ocp.args.JsonSave(meta)
        self._mgr.save(step, args=ocp.args.Composite(**args), force=force)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, state_template, step: Optional[int] = None):
        step = step if step is not None else self.latest_step()
        if step is None:
            return None, None
        restored = self._mgr.restore(
            step, args=ocp.args.Composite(
                state=ocp.args.StandardRestore(_to_savable(state_template))))
        meta = None
        try:
            meta = self._mgr.restore(
                step, args=ocp.args.Composite(meta=ocp.args.JsonRestore()))["meta"]
        except Exception:
            pass
        return _from_savable(state_template, restored["state"]), meta

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()


def _to_savable(state):
    """TrainState -> plain dict of arrays (tx/apply_fn are not serializable)."""
    return dict(step=state.step, params=state.params,
                batch_stats=state.batch_stats, opt_state=state.opt_state)


def _from_savable(template, d):
    return template.replace(step=d["step"], params=d["params"],
                            batch_stats=d["batch_stats"],
                            opt_state=d["opt_state"])
