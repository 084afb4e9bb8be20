"""Export a trained recognizer to a standalone StableHLO serving artifact.

    python tools/export.py CONFIG --work-dir WORK_DIR --out OUT_DIR \
        [--batch 1 16] [--no-poly] [--platforms tpu cpu] [--clip-len T]

The artifact (see dsgcn_tpu/serving.py) embeds the weights and runs without
model code: ``load_exported(OUT_DIR).predict(clips)``.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="export recognizer for serving")
    p.add_argument("config")
    p.add_argument("--work-dir", default=None,
                   help="checkpoint dir (omit to export fresh init weights)")
    p.add_argument("--step", type=int, default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--batch", type=int, nargs="+", default=[1, 16])
    p.add_argument("--no-poly", action="store_true",
                   help="force per-batch-size modules")
    p.add_argument("--platforms", nargs="+", default=None)
    p.add_argument("--bf16", action="store_true",
                   help="export the bf16 serving path (weights embedded as "
                        "bf16, f32 logits; see apis.to_bf16_inference)")
    p.add_argument("--clip-len", type=int, default=None,
                   help="override T in the exported input shape (default: "
                        "from the test pipeline's UniformSampleFrames)")
    return p.parse_args()


def main():
    args = parse_args()
    # honor JAX_PLATFORMS even though the environment's sitecustomize
    # imports jax before env vars can take effect (axon tunnel quirk)
    if os.environ.get("JAX_PLATFORMS"):
        import jax
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from dsgcn_tpu.apis import init_recognizer
    from dsgcn_tpu.configs.config import Config
    from dsgcn_tpu.serving import export_recognizer

    cfg = Config.fromfile(args.config)
    model, state, cfg = init_recognizer(cfg, work_dir=args.work_dir,
                                        step=args.step)

    bb = cfg["model"].get("backbone", {})
    v = 25
    if "graph_cfg" in bb:
        from dsgcn_tpu.graph import Graph
        v = Graph(**{k: tuple(x) if isinstance(x, list) else x
                     for k, x in dict(bb["graph_cfg"]).items()}).num_node
    c = bb.get("in_channels", 3)
    t = args.clip_len
    if t is None:
        t = 100
        for tr in cfg.get("data", {}).get("test", {}).get("pipeline", []):
            if "clip_len" in tr:
                t = int(tr["clip_len"])
    m = 2
    for tr in cfg.get("data", {}).get("test", {}).get("pipeline", []):
        if tr.get("type") == "FormatGCNInput":
            m = int(tr.get("num_person", 2))

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    manifest = export_recognizer(
        model, variables, args.out, sample_shape=(m, t, v, c),
        batch_sizes=args.batch, polymorphic=not args.no_poly,
        platforms=args.platforms,
        serve_dtype="bfloat16" if args.bf16 else "float32",
        average_clips=cfg["model"].get("test_cfg", {}).get(
            "average_clips", "prob"))
    print(f"exported -> {args.out}")
    for k in ("polymorphic_batch", "platforms", "sample_shape",
              "num_classes", "num_params", "modules"):
        print(f"  {k}: {manifest[k]}")


if __name__ == "__main__":
    main()
