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
    p.add_argument("--feat-ext", action="store_true",
                   help="dump pooled backbone features instead of scores "
                        "(reference test_cfg feat_ext, recognizergcn.py:65)")
    p.add_argument("--score-ext", action="store_true",
                   help="per-location class scores before pooling "
                        "(recognizergcn.py:86-93)")
    p.add_argument("--pool-opt", default="nmtv",
                   help="subset of 'nmtv' dims to mean over, or 'none' "
                        "(the reference's pool_opt='all' alias is a no-op "
                        "bug upstream — recognizergcn.py:74 compares with "
                        "== — so 'all' maps to 'nmtv' here)")
    p.add_argument("--bf16", action="store_true",
                   help="serve in bfloat16 (the production inference path: "
                        "bf16 weights in HBM, MXU-rate matmuls; top-1 parity "
                        "with f32 asserted in tests/test_bf16_inference.py)")
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

    if args.feat_ext or args.score_ext:
        # feature harvest (reference single_gpu_test_feature,
        # core/engine/test.py:20-89 + recognizergcn.py:62-93): pooled
        # backbone features (or per-location class scores) per clip,
        # dumped f16 like the reference (:93) and usable with the
        # feature-space metrics ('TSNEmap', 'graph').
        from dsgcn_tpu.models.recognizer import extract_pooled_feat
        pool_opt = "nmtv" if args.pool_opt == "all" else args.pool_opt
        variables = {"params": state.params, "batch_stats": state.batch_stats}
        feats, labels = [], []
        # the reference runs one video at a time (bs==1 assert,
        # recognizergcn.py:69) so its 'n' pool dim means "over the video's
        # nc clips"; here the folded (n*nc) rows are pooled per clip and
        # the clip axis is averaged when 'n' is requested
        per_clip = "".join(d for d in pool_opt if d != "n") \
            if pool_opt != "none" else "none"
        for batch in prefetch(loader.epoch(0), depth=2):
            kp = batch[key]
            n, nc = kp.shape[:2]
            folded = kp.reshape((n * nc,) + kp.shape[2:])
            f = extract_pooled_feat(model, variables, jnp.asarray(folded),
                                    pool_opt=per_clip or "none",
                                    score_ext=args.score_ext)
            f = np.asarray(f, np.float32).reshape((n, nc) + f.shape[1:])
            if pool_opt != "none" and "n" in pool_opt:
                f = f.mean(axis=1)
            feats.append(f.astype(np.float16))   # f16 dump, recognizergcn:93
            labels.extend(batch["label"].tolist())
        feats = np.concatenate(feats, axis=0)
        if args.out:
            with open(args.out, "wb") as fh:
                pickle.dump(dict(features=feats, labels=labels), fh)
            print(f"dumped features {feats.shape} -> {args.out}")
        lab = np.asarray(labels)
        if "TSNEmap" in args.metrics:
            emb = evaluate(feats.reshape(len(feats), -1).astype(np.float32),
                           lab, ("TSNEmap",))["TSNEmap"]
            print(f"TSNEmap: embedding {emb.shape}")
        if "graph" in args.metrics:
            per_cls = evaluate(feats.astype(np.float32), lab,
                               ("graph",))["graph"]
            print(f"graph: {len(per_cls)} per-class means "
                  f"of shape {per_cls[0].shape}")
        return

    if args.bf16:
        from dsgcn_tpu.apis import to_bf16_inference
        model, bvars = to_bf16_inference(
            model, {"params": state.params,
                    "batch_stats": state.batch_stats})
        state = state.replace(params=bvars["params"])

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
        if np.ndim(v) == 0:
            print(f"{k}: {float(v):.4f}")
        else:   # array-valued metrics (confusion_matrix, graph, TSNEmap)
            print(f"{k}: array{np.shape(v)}")


if __name__ == "__main__":
    main()
