"""Benchmark: DGSTGCN-family inference + training throughput on one TPU chip.

Timing protocol: every benched program returns a device-side SCALAR whose
host fetch forces execution — on the remote-tunnel TPU platform,
``jax.block_until_ready`` on a large output buffer returns before the
computation finishes (verified: it "timed" an 8192^3 matmul at 25 PFLOP/s on
a 197-TFLOP/s chip), so naive harnesses measure dispatch rate, not compute.
Round-1 numbers (BENCH_r01) suffered exactly that; these are honest.

Robust protocol (round-3): every recorded number is min of >=5 repetitions;
the median and (max-min)/median spread ride alongside in the JSON so a noisy
tunnel run is visible in the capture itself instead of silently inflating a
best-of headline.  The model-zoo section times every baseline family
(stgcn/stgcn++/aagcn/ctrgcn/msg3d/sgn/posec3d) against the reference's
published 2080Ti FPS table (BASELINE.md), and the ms_tcn section records the
fused-Pallas-vs-XLA multi-branch TCN comparison that decides the
tcn_use_pallas default.

Headline mirrors the reference's published FPS setup
(examples/inference_speed.ipynb: batch 16, M=2, T=100, V=25, fp32) vs its
RTX 2080Ti number (409 FPS, BASELINE.md).  The headline b16 loop runs ON
DEVICE (lax.scan of dependent iterations — one dispatch, like the
reference's local-GPU loop which pays no per-call network hop); the
``*_hostloop`` fields keep the host-driven numbers, and
``*_deviceloop_check`` cross-validates the scan timing against the host
loop at saturated batch (must be ~1).  Extra fields: saturated-batch
fp32/bf16 throughput (params pre-cast to bf16 — the production inference
path), XLA-vs-Pallas dynamic-graph comparison, training clips/s at b64 and
saturated batch, achieved TFLOP/s + MFU from XLA's cost analysis, edges/s.

Flake policy (round-4, after BENCH_r03 was lost to a transient tunnel
outage at backend init): backend acquisition retries with backoff (~5 min
total), and if the tunnel dies mid-run the captured-so-far results are still
printed as the JSON line with an ``"error"`` field and exit code 0 — a flake
can degrade the capture but never zero out a round's perf record.

Prints ONE JSON line.
"""
import json
import sys
import time

import numpy as np

_T0 = time.perf_counter()


def _mark(msg):
    """Progress to stderr (driver reads the stdout JSON line only)."""
    print(f"[bench +{time.perf_counter() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)

PEAK_TFLOPS = {  # dense MXU peak (bf16), per chip
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,
}


def _bench_scalar_stats(fn, args, iters=6, reps=5, min_rep_s=0.0):
    """Per-iteration seconds over >= ``reps`` repetitions: (best, median,
    spread).  ``fn`` must return a scalar; the float() fetch at the end of
    each rep forces the whole queued chain.  ``spread`` = (max-min)/median —
    recorded in the JSON so a noisy tunnel run is visible in the capture
    instead of silently inflating a best-of headline (round-2 lesson).

    ``min_rep_s``: floor on each repetition's wall time — after warmup the
    per-iter cost is estimated from one timed call and ``iters`` is raised so
    a rep spans at least this long.  The fast zoo families (stgcn ~6 ms/iter)
    otherwise produce 60 ms reps where host-timer + tunnel jitter shows up as
    5-13% spread (round-3 weak #6); 0.3 s reps push that under 2%."""
    s = float(fn(*args))   # compile + warm
    if min_rep_s > 0:
        t0 = time.perf_counter()
        s = float(fn(*args))
        dt_est = max(time.perf_counter() - t0, 1e-6)
        iters = max(iters, int(np.ceil(min_rep_s / dt_est)))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        s = float(out)  # noqa: F841
        times.append((time.perf_counter() - t0) / iters)
    times.sort()
    med = times[len(times) // 2]
    return times[0], med, (times[-1] - times[0]) / med


def _bench_scalar(fn, args, iters=6, reps=5):
    return _bench_scalar_stats(fn, args, iters=iters, reps=reps)[0]


def _bench_device_loop(apply_fn, variables, x, iters=32, reps=3):
    """Per-iteration seconds with the loop ON DEVICE: one dispatch covers
    ``iters`` sequentially-dependent executions (lax.scan), so per-dispatch
    host/tunnel overhead — which the reference's local-GPU timing loop does
    not pay — is excluded.  Each iteration perturbs the input with the
    previous iteration's scalar so XLA cannot hoist or CSE the body.
    Methodology is cross-validated in main(): at saturated batch (compute »
    dispatch) this must agree with the host-loop number."""
    import jax
    import jax.numpy as jnp

    def run(v_, x_):
        def body(c, _):
            out = apply_fn(v_, x_ + c * jnp.float32(1e-30)).sum()
            return out, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    f = jax.jit(run)
    float(f(variables, x))   # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        s = float(f(variables, x))  # noqa: F841
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def _acquire_device():
    """First device, with retry-backoff: the remote-tunnel TPU backend can be
    transiently UNAVAILABLE (this zeroed out BENCH_r03).  6 attempts spread
    over ~5 minutes before giving up."""
    import jax
    delays = (0, 10, 20, 45, 90, 150)
    last = None
    for i, d in enumerate(delays):
        if d:
            _mark(f"backend unavailable; retrying in {d}s "
                  f"(attempt {i + 1}/{len(delays)})")
            time.sleep(d)
        try:
            return jax.devices()[0]
        except Exception as e:  # noqa: BLE001 — backend init raises RuntimeError
            last = e
    raise last


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    results = {}
    dev = None
    error = None
    try:
        dev = _acquire_device()
        _run(dev, results)
    except Exception as e:  # noqa: BLE001 — partial capture beats a lost round
        error = f"{type(e).__name__}: {e}"
        _mark(f"bench aborted mid-run: {error}")

    value = results.get("dgstgcn_infer_fps_b16",
                        results.get("dgstgcn_infer_fps_b16_hostloop"))
    if value is None and error is None:
        _mark("FATAL: headline metric missing with no recorded error")
        sys.exit(1)
    baseline_2080ti = 409.0  # BASELINE.md: DGSTGCN FPS on RTX 2080Ti
    out = {
        "metric": "dgstgcn_infer_fps_b16_T100_fp32",
        "value": round(value, 2) if value is not None else None,
        "unit": "samples/s",
        "vs_baseline": (round(value / baseline_2080ti, 3)
                        if value is not None else None),
        "device": getattr(dev, "device_kind", str(dev)),
        **{k: (round(float(v), 2 if abs(float(v)) >= 0.05 else 6)
               if isinstance(v, (int, float)) else v)
           for k, v in results.items()},
    }
    if error is not None:
        out["error"] = error
    print(json.dumps(out))


def _run(dev, results):
    import jax
    import jax.numpy as jnp
    from dsgcn_tpu.core.train import TrainState, make_optimizer, train_step
    from dsgcn_tpu.models.builder import build_named_model

    peak = PEAK_TFLOPS.get(getattr(dev, "device_kind", ""), 197.0) * 1e12

    m, t, v, c = 2, 100, 25, 3
    rng = np.random.default_rng(0)
    x16 = jnp.asarray(rng.standard_normal((16, m, t, v, c)).astype(np.float32))
    x1k = jnp.asarray(rng.standard_normal((1024, m, t, v, c)).astype(np.float32))

    sat_batch = {"dgstgcn": 512, "dsgcn": 1024}
    models = {}
    def bench_one(name):
        # Pallas fused dynamic-graph kernel is the default on TPU
        model = build_named_model(name, num_classes=60)
        # jit the init: eager init dispatches each op over the remote tunnel
        # (~3 min of round-trips); jitted it is one cached compile
        _mark(f"{name}: init")
        variables = jax.jit(
            lambda k, x_: model.init(k, x_, train=False))(
            jax.random.PRNGKey(0), x16[:2])
        models[name] = (model, variables)
        eapply = lambda v_, x_: model.apply(v_, x_, train=False)  # noqa: E731
        fwd = jax.jit(lambda v_, x_: eapply(v_, x_).sum())
        _mark(f"{name}: infer b16 (host loop)")
        best, med, spread = _bench_scalar_stats(fwd, (variables, x16),
                                                iters=12, reps=5,
                                                min_rep_s=0.4)
        results[f"{name}_infer_fps_b16_hostloop"] = 16 / best
        results[f"{name}_infer_fps_b16_hostloop_med"] = 16 / med
        results[f"{name}_infer_b16_spread_pct"] = 100 * spread
        _mark(f"{name}: infer b16 (device loop)")
        try:
            results[f"{name}_infer_fps_b16"] = 16 / _bench_device_loop(
                eapply, variables, x16, iters=64)
        except Exception as e:   # never lose the whole bench to the scan path
            _mark(f"{name}: device loop failed ({e!r}); using host loop")
            results[f"{name}_infer_fps_b16"] = \
                results[f"{name}_infer_fps_b16_hostloop"]
        # batch sweep: throughput peaks at a mid batch (~b64) and stays ~flat
        # to b512 (stage-by-stage probe: backbone per-sample cost +3% b64 ->
        # b512); the fp32 b1024 point runs the whole model near the 15.75 GB
        # HBM ceiling (ops/tcn.py's eval transform is the single-concat
        # layout — aligned elementwise producers, no layout copy — whose
        # peak liveness fits that regime).  "saturated" = the best point of
        # the sweep, all points recorded.  Saturated-candidate rows run at
        # reps=9 (round-3 spreads of 5% on reps=5 made the best-of headline
        # selection shaky — VERDICT r3 weak #6).
        _mark(f"{name}: infer b64")
        try:
            dt64, med64, spread64 = _bench_scalar_stats(
                fwd, (variables, x1k[:64]), iters=8, reps=9)
            results[f"{name}_infer_fps_b64"] = 64 / dt64
            results[f"{name}_infer_b64_spread_pct"] = 100 * spread64
        except Exception as e:
            _mark(f"{name}: b64 failed ({e!r})")
        sb = sat_batch[name]
        _mark(f"{name}: infer b{sb}")
        try:
            dt, med, spread = _bench_scalar_stats(fwd, (variables, x1k[:sb]),
                                                  iters=4, reps=9)
            results[f"{name}_infer_fps_b{sb}"] = sb / dt
            results[f"{name}_infer_fps_b{sb}_med"] = sb / med
            results[f"{name}_infer_b{sb}_spread_pct"] = 100 * spread
            results[f"{name}_infer_fps_saturated"] = max(
                results.get(f"{name}_infer_fps_b64", 0.0), sb / dt)
            # methodology cross-check: at saturated batch the device-loop and
            # host-loop numbers must agree (compute >> per-dispatch overhead)
            _mark(f"{name}: infer b{sb} (device loop)")
            try:
                dt_dev = _bench_device_loop(eapply, variables, x1k[:sb],
                                            iters=8)
                results[f"{name}_deviceloop_check_b{sb}"] = dt / dt_dev
            except Exception as e:
                _mark(f"{name}: device loop failed ({e!r})")

            # achieved rate + MFU from XLA's FLOP count of the compiled fwd
            comp = jax.jit(lambda v_, x_: model.apply(v_, x_, train=False)) \
                .lower(variables, x1k[:sb]).compile()
            flops = float(comp.cost_analysis().get("flops", 0.0))
            results[f"{name}_infer_tflops"] = flops / dt / 1e12
            results[f"{name}_infer_mfu_pct"] = 100.0 * flops / dt / peak
        except Exception as e:   # keep the b16 headline if saturation flakes
            _mark(f"{name}: saturated infer failed ({e!r})")

        # training throughput (clips/s/chip): b64 (round-1 comparable) and
        # saturated batch.  The Pallas backward keeps the (N,K,Cm,V,V) graph
        # tensors out of HBM; at saturated batch the remaining pressure is
        # plain fwd->bwd activation storage (~25 GB at b256xT100), so the
        # saturated row additionally remats each backbone block (inputs-only
        # residency, ~3 GB) — the production large-batch training config.
        from dsgcn_tpu.models.builder import build_model, model_cfg
        train_rows = [(64, model, variables)]
        try:
            cfg_r = model_cfg(name, num_classes=60)
            cfg_r["backbone"]["remat"] = True
            model_r = build_model(cfg_r)
            _mark(f"{name}: remat init")
            vars_r = jax.jit(
                lambda k, x_: model_r.init(k, x_, train=False))(
                jax.random.PRNGKey(0), x16[:2])
            train_rows.append((256, model_r, vars_r))
        except Exception as e:
            model_r = None
            _mark(f"{name}: remat init failed ({e!r})")
        for bs, mdl, vr in train_rows:
            _mark(f"{name}: train b{bs}")
            try:
                xb = x1k[:bs]
                params, stats = vr["params"], vr.get("batch_stats", {})
                tx, _ = make_optimizer(lr=0.1, total_steps=100)
                state = TrainState.create(mdl.apply, params, stats, tx)
                tb = dict(keypoint=xb,
                          label=jnp.asarray(rng.integers(0, 60, size=bs)))
                step = jax.jit(train_step)
                state, metrics = step(state, tb, jax.random.PRNGKey(0))
                float(metrics["loss"])
                iters = 8
                t0 = time.perf_counter()
                for _ in range(iters):
                    state, metrics = step(state, tb, jax.random.PRNGKey(0))
                float(metrics["loss"])   # forces the whole dependent chain
                tag = f"b{bs}" + ("_remat" if mdl is model_r else "")
                results[f"{name}_train_clips_per_sec_{tag}"] = bs * iters / (
                    time.perf_counter() - t0)
            except Exception as e:   # keep the headline if training flakes
                _mark(f"{name}: train b{bs} failed ({e!r})")

    for name in ("dgstgcn", "dsgcn"):
        try:
            bench_one(name)
        except Exception as e:   # one model's flake must not lose the other's
            _mark(f"{name}: model bench failed ({e!r})")

    # ---- model-zoo FPS vs the reference's published 2080Ti table ----------
    # (BASELINE.md / examples/inference_speed.ipynb: batch 16, M=2, T=100,
    # V=25, fp32; sgn runs its reference T=30 protocol).  Each family guarded
    # individually; min+median of 5 reps like the headline.
    zoo_ref = {"stgcn": 518, "stgcn++": 476, "aagcn": 274, "ctrgcn": 353,
               "msg3d": 111, "sgn": None, "posec3d": 41}
    for name, ref in zoo_ref.items():
        key = name.replace("++", "pp")
        try:
            _mark(f"zoo {name}: init")
            if name == "posec3d":
                from dsgcn_tpu.configs.config import Config
                from dsgcn_tpu.models.builder import build_model as _bm
                cfgd = Config.fromfile("configs/posec3d/slowonly_ntu60_xsub.py")
                zmodel = _bm(cfgd["model"])
                zx = jnp.asarray(rng.standard_normal(
                    (16, 48, 56, 56, 17)).astype(np.float32))
            else:
                zmodel = build_named_model(name, num_classes=60)
                zx = x16[:, :, :30] if name == "sgn" else x16
            zvars = jax.jit(
                lambda k, x_: zmodel.init(k, x_, train=False))(
                jax.random.PRNGKey(0), zx[:2])
            zfwd = jax.jit(
                lambda v_, x_: zmodel.apply(v_, x_, train=False).sum())
            _mark(f"zoo {name}: infer b16")
            best, med, spread = _bench_scalar_stats(zfwd, (zvars, zx),
                                                    iters=10, reps=9,
                                                    min_rep_s=0.3)
            results[f"{key}_infer_fps_b16"] = 16 / best
            results[f"{key}_infer_fps_b16_med"] = 16 / med
            results[f"{key}_infer_b16_spread_pct"] = 100 * spread
            if ref:
                results[f"{key}_vs_2080ti"] = 16 / best / ref
        except Exception as e:
            _mark(f"zoo {name}: failed ({e!r})")

    # ---- fused multi-branch TCN (ops/pallas/ms_tcn.py) vs its XLA region --
    # VERDICT r2 #6: measure on chip, decide the default from data.
    try:
        from dsgcn_tpu.ops.tcn import DGMSTCN
        xt = x1k[:512].reshape(1024, 100, 25, 3)[..., :1].repeat(64, -1)
        for use_pallas, tag in ((False, "xla"), (True, "pallas")):
            tcn = DGMSTCN(out_channels=64, use_pallas=use_pallas)
            tv = jax.jit(lambda k, x_: tcn.init(k, x_, train=False))(
                jax.random.PRNGKey(0), xt[:2])
            tf = jax.jit(lambda v_, x_: tcn.apply(v_, x_, train=False).sum())
            _mark(f"ms_tcn {tag}: c64 T100 b1024")
            dt = _bench_scalar(tf, (tv, xt), iters=6, reps=3)
            results[f"ms_tcn_{tag}_ms_c64_b1024"] = dt * 1e3
    except Exception as e:
        _mark(f"ms_tcn section failed ({e!r})")

    # XLA (non-Pallas) dynamic-graph path for comparison
    model, variables = models.get("dsgcn", (None, None))
    try:
        assert model is not None, "dsgcn model unavailable"
        model_xla = build_named_model("dsgcn", num_classes=60,
                                      use_pallas=False)
        fwd = jax.jit(
            lambda v_, x_: model_xla.apply(v_, x_, train=False).sum())
        _mark("dsgcn: xla-path infer b1024")
        results["dsgcn_infer_fps_b1024_xla"] = 1024 / _bench_scalar(
            fwd, (variables, x1k), iters=3)
    except Exception as e:
        _mark(f"dsgcn: xla path failed ({e!r})")

    # bf16 saturated inference via the production serving helper (params
    # pre-cast ONCE — per-call f32->bf16 casts double the weight traffic
    # and lose to fp32)
    try:
        from dsgcn_tpu.apis import to_bf16_inference
        model_bf16, vb = to_bf16_inference(
            model, {"params": variables["params"],
                    "batch_stats": variables.get("batch_stats", {})})
        # end-to-end bf16-vs-f32 parity ON CHIP (the CPU test suite cannot
        # execute bf16 dots — tests/test_bf16_inference.py skips there):
        # top-1 agreement fraction + relative logit delta on the b16 batch
        lg32 = jax.jit(lambda v_, x_: model.apply(v_, x_, train=False))(
            variables, x16)
        lg16 = jax.jit(lambda v_, x_: model_bf16.apply(v_, x_, train=False))(
            vb, x16)
        agree = jax.jit(lambda a, b: jnp.mean(
            (jnp.argmax(a, -1) == jnp.argmax(b, -1)).astype(jnp.float32)))
        rel = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b))
                      / (jnp.max(jnp.abs(b)) + 1e-9))
        results["dsgcn_bf16_top1_match_frac"] = float(agree(lg16, lg32))
        results["dsgcn_bf16_logit_rel"] = float(rel(lg16, lg32))
        fwd = jax.jit(
            lambda v_, x_: model_bf16.apply(v_, x_, train=False).sum())
        # bf16 batch sweep (the production inference path): monotone in
        # batch — bf16 halves the activation footprint, so the HBM-ceiling
        # regime that caps fp32 at b1024 starts later
        for b in (64, 256):
            _mark(f"dsgcn: bf16 infer b{b}")
            dtb = _bench_scalar(fwd, (vb, x1k[:b]), iters=8, reps=9)
            results[f"dsgcn_infer_fps_b{b}_bf16"] = b / dtb
        _mark("dsgcn: bf16 infer b1024")
        dt = _bench_scalar(fwd, (vb, x1k), iters=4)
        results["dsgcn_infer_fps_b1024_bf16"] = 1024 / dt
        results["dsgcn_infer_fps_bf16_saturated"] = max(
            results.get(f"dsgcn_infer_fps_b{b}_bf16", 0.0)
            for b in (64, 256, 1024))
        comp = jax.jit(lambda v_, x_: model_bf16.apply(v_, x_, train=False)) \
            .lower(vb, x1k).compile()
        flops = float(comp.cost_analysis().get("flops", 0.0))
        results["dsgcn_infer_bf16_tflops"] = flops / dt / 1e12
        results["dsgcn_infer_bf16_mfu_pct"] = 100.0 * flops / dt / peak
    except Exception as e:
        _mark(f"dsgcn: bf16 path failed ({e!r})")

    # dgstgcn bf16 serving: same protocol as the dsgcn section (params cast
    # once, on-chip top-1/logit parity, then the fps sweep).  The b16 row is
    # the serving-dtype counterpart of the official 2080Ti-headline batch.
    try:
        model_dg, vdg = models.get("dgstgcn", (None, None))
        assert model_dg is not None, "dgstgcn model unavailable"
        from dsgcn_tpu.apis import to_bf16_inference
        mdg16, vdg16 = to_bf16_inference(
            model_dg, {"params": vdg["params"],
                       "batch_stats": vdg.get("batch_stats", {})})
        lg32 = jax.jit(lambda v_, x_: model_dg.apply(v_, x_, train=False))(
            vdg, x16)
        lg16 = jax.jit(lambda v_, x_: mdg16.apply(v_, x_, train=False))(
            vdg16, x16)
        agree = jax.jit(lambda a, b: jnp.mean(
            (jnp.argmax(a, -1) == jnp.argmax(b, -1)).astype(jnp.float32)))
        rel = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b))
                      / (jnp.max(jnp.abs(b)) + 1e-9))
        results["dgstgcn_bf16_top1_match_frac"] = float(agree(lg16, lg32))
        results["dgstgcn_bf16_logit_rel"] = float(rel(lg16, lg32))
        fwd16 = jax.jit(
            lambda v_, x_: mdg16.apply(v_, x_, train=False).sum())
        _mark("dgstgcn: bf16 infer b16")
        dtb, _, _ = _bench_scalar_stats(fwd16, (vdg16, x16), iters=12,
                                        reps=9)
        results["dgstgcn_infer_fps_b16_bf16"] = 16 / dtb
        for b in (64, 256):
            _mark(f"dgstgcn: bf16 infer b{b}")
            dtb = _bench_scalar(fwd16, (vdg16, x1k[:b]), iters=8)
            results[f"dgstgcn_infer_fps_b{b}_bf16"] = b / dtb
        results["dgstgcn_infer_fps_bf16_saturated"] = max(
            results.get(f"dgstgcn_infer_fps_b{b}_bf16", 0.0)
            for b in (64, 256))
    except Exception as e:
        _mark(f"dgstgcn: bf16 path failed ({e!r})")

    # jp AOT: certify that the multi-chip joint-partition train step lowers
    # and compiles for the REAL TPU target (detached v5e topology — no chips
    # needed; "compiles on the CPU mesh" proved nothing about Mosaic/TPU) and
    # record its collective footprint from the compiled HLO (VERDICT r3 #4)
    try:
        _mark("jp: AOT TPU compile (v5e topology, n_graph=5, t=100)")
        from dsgcn_tpu.parallel.aot import aot_compile_jp_train
        jp = aot_compile_jp_train(t=100)
        results["jp_aot_tpu_ok"] = 1.0
        for k, v in jp.items():
            if isinstance(v, (int, float)) and k != "ok":
                results["jp_aot_" + k.replace("-", "_")] = float(v)
    except Exception as e:
        results["jp_aot_tpu_ok"] = 0.0
        _mark(f"jp AOT section failed ({e!r})")

    # edges/s of the DS-GCN dynamic-graph aggregation at saturated batch:
    # every (k, u, v) pair per (sample, person, output frame), 10 stages
    if "dsgcn_infer_fps_b1024" in results:
        K, Vj, T_out = 3, 25, 100
        dt = 1024 / results["dsgcn_infer_fps_b1024"]
        results["dsgcn_edges_per_sec"] = \
            1024 * m * T_out * K * Vj * Vj * 10 / dt

if __name__ == "__main__":
    main()
