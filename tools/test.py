#!/usr/bin/env python
"""Evaluation CLI (TPU-native equivalent of reference tools/test.py).

Usage: python tools/test.py CONFIG CHECKPOINT_DIR [--out results.pkl]
       [--metrics top_k_accuracy mean_class_accuracy]

Loads the latest (or given) orbax checkpoint, runs multi-clip test-mode
inference over the test split, dumps scores, and prints metrics.
"""
import argparse
import os
import pickle
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser(description="Evaluate a skeleton-GCN recognizer")
    p.add_argument("config")
    p.add_argument("work_dir", help="work dir containing ckpt/ (orbax)")
    p.add_argument("--step", type=int, help="checkpoint step (default latest)")
    p.add_argument("--out", help="dump raw scores pickle")
    p.add_argument("--metrics", nargs="+",
                   default=["top_k_accuracy", "mean_class_accuracy"])
    p.add_argument("--average-clips", default="prob",
                   choices=["prob", "score", "none"])
    return p.parse_args()


def main():
    args = parse_args()
    # honor JAX_PLATFORMS even though the environment's sitecustomize
    # imports jax before env vars can take effect (axon tunnel quirk)
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax
    import jax.numpy as jnp
    from dsgcn_tpu.configs.config import Config
    from dsgcn_tpu.core.checkpoint import CheckpointManager
    from dsgcn_tpu.core.metrics import evaluate
    from dsgcn_tpu.core.train import TrainState, init_model, make_optimizer
    from dsgcn_tpu.data.dataset import Loader, build_dataset, prefetch
    from dsgcn_tpu.models.builder import build_model
    from dsgcn_tpu.models.recognizer import average_clip
    from dsgcn_tpu.parallel.mesh import make_mesh, replicate
    from dsgcn_tpu.parallel.train import make_dp_eval_step

    cfg = Config.fromfile(args.config)
    model = build_model(cfg["model"])
    ds = build_dataset(cfg["data"]["test"], test_mode=True)
    bs = cfg["data"].get("test_dataloader", {}).get(
        "videos_per_gpu", 16) * jax.local_device_count()
    loader = Loader(ds, batch_size=bs, shuffle=False)

    # restore: the template's param/batch_stats shapes are inferred from one
    # probe batch of the actual test pipeline, so non-NTU-shaped configs
    # (hand layout V=21, heatmap volumes, ...) restore correctly.
    probe = next(iter(loader.epoch(0)))
    key = "keypoint" if "keypoint" in probe else "imgs"
    x = probe[key]
    # test batches are (N, nc, ...) clip-stacked; the model consumes (1, ...)
    sample = jnp.zeros((1,) + x.shape[2:], jnp.float32) \
        if x.ndim >= 4 else jnp.zeros((1,) + x.shape[1:], jnp.float32)
    params, stats = init_model(model, jax.random.PRNGKey(0), sample)
    tx, _ = make_optimizer(lr=0.1, total_steps=1)
    template = TrainState.create(model.apply, params, stats, tx)
    ckpt = CheckpointManager(args.work_dir)
    state, meta = ckpt.restore(template, step=args.step)
    assert state is not None, f"no checkpoint under {args.work_dir}/ckpt"
    print(f"loaded step={int(state.step)} meta={meta}")

    mesh = make_mesh()
    state = replicate(state, mesh)   # restored arrays live on one device
    fwd = make_dp_eval_step(mesh, model.apply)
    n_data = mesh.shape["data"]

    scores, labels = [], []
    for batch in prefetch(loader.epoch(0), depth=2):
        kp = batch[key]
        n, nc = kp.shape[:2]
        folded = kp.reshape((n * nc,) + kp.shape[2:])
        pad = (-len(folded)) % n_data
        if pad:
            # wrap-around as many times as needed (the final batch can be
            # smaller than the mesh data axis)
            folded = folded[np.arange(len(folded) + pad) % len(folded)]
        logits = np.asarray(fwd(state.params, state.batch_stats,
                                jnp.asarray(folded)))[: n * nc]
        logits = logits.reshape(n, nc, -1)
        mode = None if args.average_clips == "none" else args.average_clips
        scores.append(np.asarray(average_clip(jnp.asarray(logits), mode)))
        labels.extend(batch["label"].tolist())
    scores = np.concatenate(scores, axis=0)

    if args.out:
        with open(args.out, "wb") as f:
            pickle.dump(dict(scores=scores, labels=labels), f)
        print(f"dumped -> {args.out}")

    res = evaluate(scores, labels, args.metrics)
    for k, v in res.items():
        print(f"{k}: {v:.4f}")


if __name__ == "__main__":
    main()
