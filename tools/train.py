#!/usr/bin/env python
"""Training CLI (TPU-native equivalent of reference tools/train.py).

Usage: python tools/train.py CONFIG [--work-dir D] [--validate] [--seed N]
       [--no-auto-resume] [--total-epochs N]

One process drives the whole chip mesh (SPMD) — no torch.distributed.launch;
multi-host runs call jax.distributed.initialize() when JAX_COORDINATOR is set.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args():
    p = argparse.ArgumentParser(description="Train a skeleton-GCN recognizer")
    p.add_argument("config")
    p.add_argument("--work-dir")
    p.add_argument("--validate", action="store_true")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--total-epochs", type=int)
    p.add_argument("--no-auto-resume", action="store_true")
    p.add_argument("--test-last", action="store_true")
    p.add_argument("--export-dir", default=None,
                   help="after training, AOT-export the final weights as a "
                        "standalone serving artifact (dsgcn_tpu/serving.py)")
    return p.parse_args()


def build_loaders(cfg, seed, n_graph=1):
    import jax
    from dsgcn_tpu.data.dataset import Loader, build_dataset

    data = cfg["data"]
    n_hosts, host = jax.process_count(), jax.process_index()
    # videos_per_gpu is the reference's PER-DEVICE batch (16/GPU x 8 GPUs =>
    # 128 global, lr tuned to that).  One process here drives all local chips,
    # so the host-level loader batch must be per-device x local chips to keep
    # the recipe's global batch and per-device BN statistics.  Under a 2D
    # (data x graph) mesh only the data axis carries distinct samples.
    n_local = max(jax.local_device_count() // n_graph, 1)
    bpg = data.get("videos_per_gpu", 16)
    batch = bpg * n_local
    print(f"batch: {bpg}/device x {n_local} local devices = {batch}/host "
          f"({batch * n_hosts} global)", flush=True)
    train = Loader(build_dataset(data["train"]), batch_size=batch,
                   drop_last=True, seed=seed, shard=host, num_shards=n_hosts,
                   num_workers=data.get("workers_per_gpu", 8))
    val = None
    if "val" in data:
        val = Loader(build_dataset(data["val"], test_mode=True),
                     batch_size=data.get("test_dataloader", {}).get(
                         "videos_per_gpu", bpg) * n_local,
                     shuffle=False, num_workers=data.get("workers_per_gpu", 8))
    return train, val


def main():
    args = parse_args()
    # honor JAX_PLATFORMS even though the environment's sitecustomize
    # imports jax before env vars can take effect (axon tunnel quirk)
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if os.environ.get("JAX_COORDINATOR"):
        import jax
        kw = {}
        coord = os.environ["JAX_COORDINATOR"]
        if ":" in coord:
            # explicit "host:port" + JAX_NUM_PROCESSES/JAX_PROCESS_ID (plain
            # multi-process launches, e.g. CPU hosts); "auto"/"1" leaves
            # detection to jax's cluster environments (TPU pods, SLURM)
            kw = dict(coordinator_address=coord,
                      num_processes=int(os.environ["JAX_NUM_PROCESSES"]),
                      process_id=int(os.environ["JAX_PROCESS_ID"]))
        jax.distributed.initialize(**kw)

    from dsgcn_tpu.configs.config import Config
    from dsgcn_tpu.core.trainer import Trainer
    from dsgcn_tpu.models.builder import build_model

    cfg = Config.fromfile(args.config)
    work_dir = args.work_dir or cfg.get("work_dir", "./work_dirs/default")
    os.makedirs(work_dir, exist_ok=True)
    cfg.dump(os.path.join(work_dir, "config.json"))

    # joint-partition parallelism: cfg.n_graph > 1 builds a 2D (data x graph)
    # mesh and shards the skeleton's joints over the inner axis (must divide
    # V: 5 or 25 for NTU).  Supported backbones: DGSTGCN with gcn_type
    # dggcn/dgphgcn1 + tcn_type dgmstcn/unit_tcn.
    n_graph = int(cfg.get("n_graph", 1))
    if n_graph > 1:
        from dsgcn_tpu.parallel.mesh import GRAPH_AXIS
        cfg["model"]["backbone"]["graph_axis"] = GRAPH_AXIS

    model = build_model(cfg["model"])
    train_loader, val_loader = build_loaders(cfg, args.seed, n_graph=n_graph)
    opt = cfg.get("optimizer", {})
    total_epochs = args.total_epochs or cfg.get("total_epochs", 80)

    trainer = Trainer(
        model, work_dir, train_loader,
        val_loader if (args.validate or "val" in cfg.get("data", {})) else None,
        total_epochs=total_epochs,
        lr=opt.get("lr", 0.1), momentum=opt.get("momentum", 0.9),
        weight_decay=opt.get("weight_decay", 5e-4),
        paramwise_cfg=opt.get("paramwise_cfg"),
        grad_clip=(cfg.get("optimizer_config", {}) or {}).get(
            "grad_clip", None),
        seed=args.seed,
        ckpt_interval_epochs=cfg.get("checkpoint_config", {}).get("interval", 5),
        eval_interval=cfg.get("evaluation", {}).get("interval", 1),
        eval_metrics=cfg.get("evaluation", {}).get(
            "metrics", ["top_k_accuracy"]),
        prefetch_depth=cfg.get("data", {}).get("prefetch_depth", 2),
        n_graph=n_graph,
        # config knob: top-level `compute_dtype = 'bfloat16'` for
        # mixed-precision training (f32 master weights)
        compute_dtype=cfg.get("compute_dtype"),
    )
    if not args.no_auto_resume:
        trainer.resume_if_possible()
    trainer.fit()
    if args.test_last and val_loader is not None:
        print("final:", trainer.validate())
    import jax
    if args.export_dir and jax.process_index() == 0:
        from dsgcn_tpu.serving import export_recognizer
        state = jax.device_get(trainer.state)
        kp = next(iter(train_loader.epoch(0)))["keypoint"]
        # per-sample shape without batch (and without the clip dim the
        # trainer squeezes for 6-D batches)
        sample_shape = tuple(kp.shape[2:] if kp.ndim == 6 else kp.shape[1:])
        manifest = export_recognizer(
            model, {"params": state.params, "batch_stats": state.batch_stats},
            args.export_dir, sample_shape=sample_shape,
            average_clips=cfg["model"].get("test_cfg", {}).get(
                "average_clips", "prob"))
        print(f"exported serving artifact -> {args.export_dir} "
              f"(poly={manifest['polymorphic_batch']}, "
              f"{manifest['num_params']} params)")
    return trainer


if __name__ == "__main__":
    main()
