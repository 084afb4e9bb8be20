"""High-level training loop: epochs, eval hook, checkpointing, logging.

The TPU-native runner replacing the reference's EpochBasedSparseRunner +
hook stack (core/local_runner/epoch_based_sparse_runner.py:22-190,
apis/train.py:52-223): a plain epoch loop around the jitted SPMD step, with
per-interval structured logging, validation (multi-clip averaged), best-ckpt
tracking, and auto-resume.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..data.dataset import Loader, prefetch
from ..models.recognizer import average_clip
from ..parallel.mesh import (batch_sharding, make_multihost_mesh, replicate,
                             shard_batch)
from ..parallel.train import make_dp_eval_step, make_dp_train_step
from .checkpoint import CheckpointManager
from .metrics import evaluate
from .train import TrainState, init_model, make_optimizer, train_step


class JsonlLogger:
    """Structured training log: one JSON object per record (replaces mmcv
    TextLogger/.log.json, tools/train.py:93-95)."""

    def __init__(self, work_dir: str, filename: Optional[str] = None,
                 echo: bool = True, enabled: bool = True):
        os.makedirs(work_dir, exist_ok=True)
        name = filename or f"{time.strftime('%Y%m%d_%H%M%S')}.log.jsonl"
        self.path = os.path.join(work_dir, name)
        self.echo = echo
        self.enabled = enabled   # False on non-primary hosts (shared work_dir)

    def log(self, record: Dict[str, Any]):
        if not self.enabled:
            return
        record = {k: (float(v) if isinstance(v, (jnp.ndarray, np.floating,
                                                 np.ndarray)) else v)
                  for k, v in record.items()}
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if self.echo:
            print(" ".join(f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                           for k, v in record.items()), flush=True)


class Trainer:
    def __init__(self, model, work_dir: str, train_loader: Loader,
                 val_loader: Optional[Loader] = None, total_epochs: int = 80,
                 lr: float = 0.1, momentum: float = 0.9, weight_decay: float = 5e-4,
                 grad_clip: Optional[float] = None, seed: int = 0,
                 mesh=None, log_interval: int = 20, ckpt_interval_epochs: int = 5,
                 eval_interval: int = 1,
                 eval_metrics: Sequence[str] = ("top_k_accuracy",),
                 average_clips: str = "prob", input_shape=None,
                 paramwise_cfg=None, prefetch_depth: int = 2,
                 n_graph: int = 1, compute_dtype: Optional[str] = None):
        self.model = model
        self.work_dir = work_dir
        self.train_loader = train_loader
        self.val_loader = val_loader
        self.total_epochs = total_epochs
        self.log_interval = log_interval
        self.ckpt_interval_epochs = ckpt_interval_epochs
        self.eval_interval = eval_interval
        self.eval_metrics = list(eval_metrics)
        self.average_clips = average_clips
        self.prefetch_depth = prefetch_depth
        # n_graph > 1: 2D (data x graph) mesh — joints sharded over the inner
        # (ICI) axis via the model's graph_axis ring collectives, batch over
        # the outer data axis.  The model must be built with
        # backbone.graph_axis = GRAPH_AXIS (tools/train.py sets it from the
        # config's ``n_graph`` knob).
        self.n_graph = n_graph
        self.mesh = mesh if mesh is not None else \
            make_multihost_mesh(n_graph=n_graph)
        self.is_main = jax.process_index() == 0
        self.logger = JsonlLogger(work_dir, enabled=self.is_main)

        steps_per_epoch = train_loader.steps_per_epoch()
        total_steps = steps_per_epoch * total_epochs

        if input_shape is None:
            probe = next(iter(train_loader.epoch(0)))
            kp = probe["keypoint" if "keypoint" in probe else "imgs"]
            squeezed = "keypoint" in probe and kp.ndim == 6
            input_shape = (1,) + kp.shape[2:] if squeezed else (1,) + kp.shape[1:]
        sample = jnp.zeros(input_shape, jnp.float32)
        if n_graph > 1:
            # the graph-axis model touches its mesh axis even at init — run
            # init inside shard_map (params depend only on rng/static shapes,
            # so every shard materializes identical replicated values)
            from jax.sharding import PartitionSpec as P

            init_fn = jax.jit(jax.shard_map(
                lambda r, s: model.init(r, s, train=False), mesh=self.mesh,
                in_specs=(P(), P()), out_specs=P(), check_vma=False))
            variables = init_fn(jax.random.PRNGKey(seed), sample)
            from flax.core import FrozenDict
            params = variables["params"]
            stats = variables.get("batch_stats", FrozenDict())
        else:
            params, stats = init_model(model, jax.random.PRNGKey(seed), sample)
        tx, self.lr_sched = make_optimizer(
            lr=lr, momentum=momentum, weight_decay=weight_decay,
            total_steps=total_steps, grad_clip=grad_clip,
            paramwise_cfg=paramwise_cfg, params=params)
        state = TrainState.create(model.apply, params, stats, tx)
        self.state = replicate(state, self.mesh)
        self.rng = jax.random.PRNGKey(seed)

        # compute_dtype='bfloat16': mixed-precision training — f32 master
        # weights, bf16 compute (core/train.py loss_and_metrics); quality
        # gated by tests/test_bf16_training.py + the bf16 learning curve
        if n_graph > 1:
            from ..parallel.train import make_jp_eval_step, make_jp_train_step
            self.train_step = make_jp_train_step(self.mesh, compute_dtype)
            self.eval_fwd = make_jp_eval_step(self.mesh, model.apply)
        else:
            self.train_step = make_dp_train_step(self.mesh, compute_dtype)
            self.eval_fwd = make_dp_eval_step(self.mesh, model.apply)
        self.ckpt = CheckpointManager(work_dir)
        self.best = (-1.0, None)
        self.start_epoch = 0

    def resume_if_possible(self):
        restored, meta = self.ckpt.restore(self.state)
        if restored is not None:
            self.state = replicate(restored, self.mesh)
            self.start_epoch = int(meta.get("epoch", 0)) if meta else 0
            self.logger.log(dict(event="resume", epoch=self.start_epoch))

    @staticmethod
    def _squeeze_clip(batch):
        key = "keypoint" if "keypoint" in batch else "imgs"
        kp = batch[key]
        if key == "keypoint" and kp.ndim == 6:
            kp = kp[:, 0]   # (N, nc=1, M, T, V, C) -> (N, M, T, V, C)
        return {key: kp, "label": batch["label"]}

    def _device_batches(self, epoch: int):
        """Host pipeline -> device batches, prefetched ``prefetch_depth``
        ahead so pipeline map + device_put of step N+1 overlap the device's
        execution of step N (dispatch is async)."""

        def to_device(batch):
            batch = self._squeeze_clip(batch)
            n = batch["keypoint"].shape[0]
            return n, shard_batch(batch, self.mesh)

        return prefetch(self.train_loader.epoch(epoch), to_device,
                        depth=self.prefetch_depth)

    def fit(self):
        for epoch in range(self.start_epoch, self.total_epochs):
            t_ep = time.time()
            n_seen = 0
            for it, (n, batch) in enumerate(self._device_batches(epoch)):
                self.rng, step_rng = jax.random.split(self.rng)
                self.state, metrics = self.train_step(self.state, batch, step_rng)
                n_seen += n
                if it % self.log_interval == 0:
                    step = int(jax.device_get(self.state.step))
                    self.logger.log(dict(
                        mode="train", epoch=epoch, iter=it, step=step,
                        lr=float(self.lr_sched(step)),
                        **{k: float(v) for k, v in
                           jax.device_get(metrics).items()}))
            dt = time.time() - t_ep
            self.logger.log(dict(event="epoch_done", epoch=epoch, seconds=dt,
                                 clips_per_sec=n_seen / max(dt, 1e-9)))
            is_best = False
            if self.val_loader is not None and \
                    (epoch + 1) % self.eval_interval == 0:
                results = self.validate()
                self.logger.log(dict(mode="val", epoch=epoch, **results))
                # best-ckpt metric by NAME: the reference's save_best='auto'
                # resolves to top-1 (core/evaluation.py:11-18); fall back to
                # the first reported metric only when no top1 key exists
                key = next((k for k in results if "top1" in k),
                           next(iter(results)))
                if results[key] > self.best[0]:
                    self.best = (results[key], epoch)
                    is_best = True
            if (epoch + 1) % self.ckpt_interval_epochs == 0 or \
                    epoch + 1 == self.total_epochs or is_best:
                self.ckpt.save(int(jax.device_get(self.state.step)),
                               jax.device_get(self.state),
                               meta=dict(epoch=epoch + 1, best=is_best,
                                         score=self.best[0]),
                               force=True)
        self.ckpt.wait()
        return self.state

    def validate(self) -> Dict[str, float]:
        scores, labels = [], []
        n_data = self.mesh.shape["data"]
        for batch in prefetch(self.val_loader.epoch(0),
                              depth=self.prefetch_depth):
            kp = batch["keypoint"]          # (N, nc, M, T, V, C)
            n, nc = kp.shape[:2]
            folded = kp.reshape((n * nc,) + kp.shape[2:])
            pad = (-len(folded)) % n_data
            if pad:
                # wrap-around as many times as needed (the final batch can
                # hold fewer folded clips than the mesh data axis)
                folded = folded[np.arange(len(folded) + pad) % len(folded)]
            if jax.process_count() > 1:
                # every host computes the same full `folded` (val loader is
                # unsharded), each host's devices evaluate only their mesh
                # rows, and the global logits are gathered back to every host
                from jax.experimental import multihost_utils
                garr = jax.make_array_from_callback(
                    folded.shape, batch_sharding(self.mesh),
                    lambda idx: folded[idx])
                logits = self.eval_fwd(self.state.params,
                                       self.state.batch_stats, garr)
                logits = np.asarray(
                    multihost_utils.process_allgather(logits, tiled=True))
            else:
                logits = np.asarray(self.eval_fwd(
                    self.state.params, self.state.batch_stats,
                    jnp.asarray(folded)))
            logits = logits[: n * nc].reshape(n, nc, -1)
            avg = np.asarray(average_clip(jnp.asarray(logits),
                                          self.average_clips))
            scores.append(avg)
            labels.extend(batch["label"].tolist())
        scores = np.concatenate(scores, axis=0)
        return {k: float(v) for k, v in
                evaluate(scores, labels, self.eval_metrics).items()}
