"""Measure the torch reference stack's TRAINING throughput in-env (CPU), and
ours (jax, CPU) under identical batch/shape/optimizer — the only same-hardware
training comparison available here (the reference publishes inference FPS
only; no GPU in this environment).  Feeds the BASELINE.md training-throughput
section (VERDICT r3 weak #5).

Protocol: full train step (fwd + CE loss + bwd + SGD nesterov update) on
synthetic (B, 2, 100, 25, 3) clips, B=16 to keep CPU steps tractable;
clips/s = B / best step time.  torch runs the reference backbone + linear
head; jax runs our RecognizerGCN via core.train.train_step.  Single-threaded
caveats (BLAS threads) are whatever each framework defaults to on this box —
recorded alongside in the JSON.
"""
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import numpy as np


def bench_steps(step, n_warm=1, n_iter=3):
    for _ in range(n_warm):
        step()
    best = float("inf")
    for _ in range(n_iter):
        t0 = time.perf_counter()
        step()
        best = min(best, time.perf_counter() - t0)
    return best


def torch_side(B):
    import torch
    import ref_loader
    refbb = ref_loader.load_ref_backbones()
    out = {}
    cases = {
        "dgstgcn": dict(gcn_type="dggcn", gcn_ratio=0.25, gcn_ctr="T",
                        gcn_ada="T"),
        "dsgcn": dict(gcn_type="dgphgcn1", gcn_ratio=0.125,
                      gcn_node_attention=True, gcn_edge_attention=True,
                      gcn_decompose=True, gcn_subset_wise=True,
                      gcn_ctr="T", gcn_ada="T"),
    }
    x = torch.randn(B, 2, 100, 25, 3)
    y = torch.randint(0, 60, (B,))
    for name, kw in cases.items():
        torch.manual_seed(0)
        bb = refbb["dgstgcn"].DGSTGCN(
            graph_cfg=dict(layout="nturgb+d", mode="random", num_filter=3,
                           init_off=0.04, init_std=0.02),
            tcn_type="dgmstcn", **kw)
        head = torch.nn.Linear(256, 60)
        params = list(bb.parameters()) + list(head.parameters())
        opt = torch.optim.SGD(params, lr=0.1, momentum=0.9, nesterov=True,
                              weight_decay=5e-4)
        bb.train()

        def step():
            opt.zero_grad()
            feat = bb(x)                       # (B, M, C, T, V)
            feat = feat.mean(dim=(1, 3, 4))
            loss = torch.nn.functional.cross_entropy(head(feat), y)
            loss.backward()
            opt.step()

        dt = bench_steps(step)
        out[f"torch_cpu_{name}_train_clips_per_sec_b{B}"] = B / dt
        print(f"torch {name}: {B / dt:.2f} clips/s (step {dt:.2f}s)",
              file=sys.stderr, flush=True)

        # inference fps on the same box: anchors the CPU->2080Ti scale factor
        # (ref publishes 2080Ti INFERENCE fps only), so BASELINE.md can derive
        # est. 2080Ti train throughput = cpu_train * (2080Ti_infer/cpu_infer)
        bb.eval()

        def istep():
            with torch.no_grad():
                head(bb(x).mean(dim=(1, 3, 4)))

        dti = bench_steps(istep, n_warm=1, n_iter=3)
        out[f"torch_cpu_{name}_infer_fps_b{B}"] = B / dti
        print(f"torch {name} infer: {B / dti:.2f} fps", file=sys.stderr,
              flush=True)
    return out


def jax_side(B):
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from dsgcn_tpu.core.train import TrainState, make_optimizer, train_step
    from dsgcn_tpu.models.builder import build_named_model
    out = {}
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, 2, 100, 25, 3)).astype(np.float32))
    yb = jnp.asarray(rng.integers(0, 60, size=B))
    for name in ("dgstgcn", "dsgcn"):
        model = build_named_model(name, num_classes=60, use_pallas=False)
        variables = jax.jit(lambda k, xx: model.init(k, xx, train=False))(
            jax.random.PRNGKey(0), x[:2])
        tx, _ = make_optimizer(lr=0.1, total_steps=100)
        state = TrainState.create(model.apply, variables["params"],
                                  variables.get("batch_stats", {}), tx)
        jstep = jax.jit(train_step)
        holder = {"s": state}

        def step():
            holder["s"], m = jstep(holder["s"],
                                   dict(keypoint=x, label=yb),
                                   jax.random.PRNGKey(1))
            float(m["loss"])

        dt = bench_steps(step)
        out[f"jax_cpu_{name}_train_clips_per_sec_b{B}"] = B / dt
        print(f"jax   {name}: {B / dt:.2f} clips/s (step {dt:.2f}s)",
              file=sys.stderr, flush=True)
    return out


def main():
    B = 16
    res = {}
    res.update(torch_side(B))
    res.update(jax_side(B))
    for name in ("dgstgcn", "dsgcn"):
        t = res.get(f"torch_cpu_{name}_train_clips_per_sec_b{B}")
        j = res.get(f"jax_cpu_{name}_train_clips_per_sec_b{B}")
        if t and j:
            res[f"{name}_train_cpu_jax_over_torch"] = j / t
    print(json.dumps({k: round(v, 3) for k, v in res.items()}))


if __name__ == "__main__":
    main()
