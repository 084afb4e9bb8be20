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
loop at saturated batch (must be ~1).  The bf16 serving numbers (params
pre-cast once — the production inference path) are a first-class second
headline: ``bf16_value``/``bf16_vs_baseline`` top-level fields alongside
the fp32 ``value``.

Un-losable capture (round-5, after BENCH_r03 AND BENCH_r04 were both lost —
r03 to a transient tunnel outage at backend init, r04 to the driver's kill
budget arriving while the JSON was still unprinted at the end of main()):

1. The run is a flat list of SECTIONS; after EVERY section the full
   accumulated-results JSON line is re-printed to stdout (last complete
   line wins) and mirrored to BENCH_PARTIAL.json.
2. SIGTERM/SIGINT install a handler that prints the accumulated JSON with
   ``"error": "killed"`` and exits 0 — the driver's kill can no longer
   zero out the record.
3. An internal deadline (``BENCH_DEADLINE_S``, default 1400 s — the driver
   killed r04 at ~1800 s) skips remaining sections, recorded under
   ``"skipped_sections"``.
4. Sections are ordered headline-first: every north-star key (dgstgcn +
   dsgcn fp32 and bf16 fps, train clips/s, jp_aot_*, edges/s) lands inside
   the first ~900 s; the zoo / ms_tcn A/B / xla-path rows run last and are
   the first casualties of the deadline.
5. Backend acquisition retries with backoff (~5 min, round-4 fix), and
   every section is individually exception-guarded.

``BENCH_SELFTEST=1`` swaps in tiny no-device sections so the kill/deadline
machinery itself is testable (tests/test_bench_capture.py).

Prints one JSON line per completed section; the LAST printed line is the
most complete capture.
"""
import json
import os
import signal
import sys
import time

import numpy as np

_T0 = time.perf_counter()

PEAK_TFLOPS = {  # dense MXU peak (bf16), per chip
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v4": 275.0,
    "TPU v6 lite": 918.0,
}
BASELINE_2080TI = 409.0  # BASELINE.md: DGSTGCN FPS on RTX 2080Ti

# Accumulated state, visible to the signal handler at any instant.
RESULTS = {}
STATE = {"device": None, "error": None, "skipped": []}


def _mark(msg):
    """Progress to stderr (driver reads the stdout JSON lines only)."""
    print(f"[bench +{time.perf_counter() - _T0:.0f}s] {msg}",
          file=sys.stderr, flush=True)


def _snapshot():
    """Print the full accumulated-results JSON line (and mirror to a file).

    Called after every section and from the SIGTERM handler — the last
    complete stdout line is the capture, so a mid-run kill costs only the
    in-flight section, never the round's record."""
    value = RESULTS.get("dgstgcn_infer_fps_b16",
                        RESULTS.get("dgstgcn_infer_fps_b16_hostloop"))
    bf16_value = RESULTS.get("dgstgcn_infer_fps_b16_bf16")
    out = {
        "metric": "dgstgcn_infer_fps_b16_T100_fp32",
        "value": round(value, 2) if value is not None else None,
        "unit": "samples/s",
        "vs_baseline": (round(value / BASELINE_2080TI, 3)
                        if value is not None else None),
        "bf16_metric": "dgstgcn_infer_fps_b16_T100_bf16",
        "bf16_value": round(bf16_value, 2) if bf16_value is not None else None,
        "bf16_vs_baseline": (round(bf16_value / BASELINE_2080TI, 3)
                             if bf16_value is not None else None),
        "device": STATE["device"],
        "elapsed_s": round(time.perf_counter() - _T0, 1),
        **{k: (round(float(v), 2 if abs(float(v)) >= 0.05 else 6)
               if isinstance(v, (int, float)) else v)
           for k, v in RESULTS.items()},
    }
    if STATE["error"] is not None:
        out["error"] = STATE["error"]
    if STATE["skipped"]:
        out["skipped_sections"] = list(STATE["skipped"])
    line = json.dumps(out)
    print(line, flush=True)
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "BENCH_PARTIAL.json"), "w") as f:
            f.write(line + "\n")
    except OSError:
        pass


def _on_kill(signum, frame):  # noqa: ARG001 — signal handler signature
    STATE["error"] = "killed"
    _mark(f"signal {signum}: dumping capture and exiting 0")
    _snapshot()
    # os._exit: the normal exit path would unwind through whatever device
    # call the signal interrupted (and jax teardown), risking a hang past
    # the driver's SIGKILL follow-up.
    os._exit(0)


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
    Methodology is cross-validated at saturated batch (compute » dispatch),
    where this must agree with the host-loop number."""
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


# ---------------------------------------------------------------------------
# Real sections.  Shared state lives in C (context dict) so each section is
# small, individually guarded, and the deadline can cut between any two.
# ---------------------------------------------------------------------------

def _sec_setup(C):
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    dev = _acquire_device()
    STATE["device"] = getattr(dev, "device_kind", str(dev))
    C["peak"] = PEAK_TFLOPS.get(STATE["device"], 197.0) * 1e12
    m, t, v, c = 2, 100, 25, 3
    rng = np.random.default_rng(0)
    C["rng"] = rng
    C["x16"] = jnp.asarray(
        rng.standard_normal((16, m, t, v, c)).astype(np.float32))
    C["x1k"] = jnp.asarray(
        rng.standard_normal((1024, m, t, v, c)).astype(np.float32))
    C["models"] = {}
    C["bf16"] = {}
    C["sat_batch"] = {"dgstgcn": 512, "dsgcn": 1024}


def _infer_fp32(C, name):
    """init + b16 (host & device loop) + b64 — the headline rows."""
    import jax
    x16, x1k = C["x16"], C["x1k"]
    from dsgcn_tpu.models.builder import build_named_model
    model = build_named_model(name, num_classes=60)
    # jit the init: eager init dispatches each op over the remote tunnel
    # (~3 min of round-trips); jitted it is one cached compile
    _mark(f"{name}: init")
    variables = jax.jit(
        lambda k, x_: model.init(k, x_, train=False))(
        jax.random.PRNGKey(0), x16[:2])
    C["models"][name] = (model, variables)
    eapply = lambda v_, x_: model.apply(v_, x_, train=False)  # noqa: E731
    fwd = jax.jit(lambda v_, x_: eapply(v_, x_).sum())
    _mark(f"{name}: infer b16 (host loop)")
    best, med, spread = _bench_scalar_stats(fwd, (variables, x16),
                                            iters=12, reps=5, min_rep_s=0.4)
    RESULTS[f"{name}_infer_fps_b16_hostloop"] = 16 / best
    RESULTS[f"{name}_infer_fps_b16_hostloop_med"] = 16 / med
    RESULTS[f"{name}_infer_b16_spread_pct"] = 100 * spread
    _mark(f"{name}: infer b16 (device loop)")
    try:
        RESULTS[f"{name}_infer_fps_b16"] = 16 / _bench_device_loop(
            eapply, variables, x16, iters=64)
    except Exception as e:   # never lose the whole bench to the scan path
        _mark(f"{name}: device loop failed ({e!r}); using host loop")
        RESULTS[f"{name}_infer_fps_b16"] = \
            RESULTS[f"{name}_infer_fps_b16_hostloop"]
    _mark(f"{name}: infer b64")
    dt64, med64, spread64 = _bench_scalar_stats(
        fwd, (variables, x1k[:64]), iters=8, reps=9)
    RESULTS[f"{name}_infer_fps_b64"] = 64 / dt64
    RESULTS[f"{name}_infer_b64_spread_pct"] = 100 * spread64
    RESULTS[f"{name}_infer_fps_saturated"] = max(
        RESULTS.get(f"{name}_infer_fps_saturated", 0.0), 64 / dt64)


def _infer_bf16(C, name, batches):
    """bf16 serving: params pre-cast ONCE (per-call f32->bf16 casts double
    the weight traffic and lose to fp32); on-chip top-1/logit parity (the
    CPU test suite cannot execute bf16 dots — tests/test_bf16_inference.py
    skips there), then the fps sweep."""
    import jax
    import jax.numpy as jnp
    from dsgcn_tpu.apis import to_bf16_inference
    model, variables = C["models"][name]
    m16, v16 = to_bf16_inference(
        model, {"params": variables["params"],
                "batch_stats": variables.get("batch_stats", {})})
    C["bf16"][name] = (m16, v16)
    x16, x1k = C["x16"], C["x1k"]
    lg32 = jax.jit(lambda v_, x_: model.apply(v_, x_, train=False))(
        variables, x16)
    lg16 = jax.jit(lambda v_, x_: m16.apply(v_, x_, train=False))(v16, x16)
    agree = jax.jit(lambda a, b: jnp.mean(
        (jnp.argmax(a, -1) == jnp.argmax(b, -1)).astype(jnp.float32)))
    rel = jax.jit(lambda a, b: jnp.max(jnp.abs(a - b))
                  / (jnp.max(jnp.abs(b)) + 1e-9))
    RESULTS[f"{name}_bf16_top1_match_frac"] = float(agree(lg16, lg32))
    RESULTS[f"{name}_bf16_logit_rel"] = float(rel(lg16, lg32))
    fwd16 = jax.jit(lambda v_, x_: m16.apply(v_, x_, train=False).sum())
    eapply16 = lambda v_, x_: m16.apply(v_, x_, train=False)  # noqa: E731
    for b in batches:
        _mark(f"{name}: bf16 infer b{b}")
        if b == 16:
            # device loop at b16 — same protocol as the fp32 headline
            try:
                RESULTS[f"{name}_infer_fps_b16_bf16"] = \
                    16 / _bench_device_loop(eapply16, v16, x16, iters=64)
                continue
            except Exception as e:
                _mark(f"{name}: bf16 device loop failed ({e!r})")
        dtb = _bench_scalar(fwd16, (v16, x1k[:b] if b != 16 else x16),
                            iters=8, reps=5)
        RESULTS[f"{name}_infer_fps_b{b}_bf16"] = b / dtb
    RESULTS[f"{name}_infer_fps_bf16_saturated"] = max(
        RESULTS.get(f"{name}_infer_fps_b{b}_bf16", 0.0)
        for b in batches)


def _train_rows(C, name, rows):
    """Training throughput (clips/s/chip).  b64 is the round-1-comparable
    row; saturated rows remat (True = whole block, 'tcn' = only the TCN
    region, keeping the custom-VJP aggregation un-rematted); dtype
    'bfloat16' = mixed-precision training (f32 master weights, bf16
    compute — core/train.py compute_dtype, gated by
    tests/test_bf16_training.py)."""
    import functools
    import jax
    import jax.numpy as jnp
    from dsgcn_tpu.core.train import TrainState, make_optimizer, train_step
    from dsgcn_tpu.models.builder import build_model, model_cfg
    x16, x1k, rng = C["x16"], C["x1k"], C["rng"]
    model, variables = C["models"][name]
    mdl_cache = {False: model}
    for bs, remat, dtype in rows:
        if remat not in mdl_cache:
            cfg_r = model_cfg(name, num_classes=60)
            cfg_r["backbone"]["remat"] = remat
            mdl_cache[remat] = build_model(cfg_r)
        mdl, vr = mdl_cache[remat], variables   # remat is tree-transparent
        rtag = {False: "", True: "_remat", "tcn": "_remat_tcn"}[remat]
        dtag = "_bf16" if dtype else ""
        _mark(f"{name}: train b{bs}{rtag}{dtag}")
        try:
            xb = x1k[:bs]
            params, stats = vr["params"], vr.get("batch_stats", {})
            tx, _ = make_optimizer(lr=0.1, total_steps=100)
            state = TrainState.create(mdl.apply, params, stats, tx)
            tb = dict(keypoint=xb,
                      label=jnp.asarray(rng.integers(0, 60, size=bs)))
            step = jax.jit(functools.partial(train_step,
                                             compute_dtype=dtype))
            state, metrics = step(state, tb, jax.random.PRNGKey(0))
            float(metrics["loss"])
            iters = 8
            t0 = time.perf_counter()
            for _ in range(iters):
                state, metrics = step(state, tb, jax.random.PRNGKey(0))
            float(metrics["loss"])   # forces the whole dependent chain
            RESULTS[f"{name}_train_clips_per_sec_b{bs}{rtag}{dtag}"] = \
                bs * iters / (time.perf_counter() - t0)
        except Exception as e:   # e.g. OOM at a saturated row — keep going
            _mark(f"{name}: train b{bs}{rtag}{dtag} failed ({e!r})")


def _sec_jp_aot(C):  # noqa: ARG001
    """Certify the multi-chip joint-partition train step lowers+compiles for
    the REAL TPU target (detached v5e topology — no chips needed; "compiles
    on the CPU mesh" proved nothing about Mosaic/TPU) and record its
    collective footprint from the compiled HLO (VERDICT r3 #4)."""
    _mark("jp: AOT TPU compile (v5e topology, n_graph=5, t=100)")
    from dsgcn_tpu.parallel.aot import aot_compile_jp_train
    try:
        jp = aot_compile_jp_train(t=100)
        RESULTS["jp_aot_tpu_ok"] = 1.0
        for k, v in jp.items():
            if isinstance(v, (int, float)) and k != "ok":
                RESULTS["jp_aot_" + k.replace("-", "_")] = float(v)
    except Exception:
        RESULTS["jp_aot_tpu_ok"] = 0.0
        raise


def _edges_per_sec():
    """edges/s of the DS-GCN dynamic-graph aggregation: every (k, u, v) pair
    per (sample, person, output frame), 10 stages — at the best measured
    batch point so far (refreshed when the saturated sweep lands)."""
    fps = max(RESULTS.get(k, 0.0) for k in
              ("dsgcn_infer_fps_b64", "dsgcn_infer_fps_b1024",
               "dsgcn_infer_fps_saturated"))
    if fps > 0:
        K, Vj, T_out, m = 3, 25, 100, 2
        RESULTS["dsgcn_edges_per_sec"] = fps * m * T_out * K * Vj * Vj * 10


def _sec_saturated(C, name):
    import jax
    x1k = C["x1k"]
    model, variables = C["models"][name]
    fwd = jax.jit(lambda v_, x_: model.apply(v_, x_, train=False).sum())
    eapply = lambda v_, x_: model.apply(v_, x_, train=False)  # noqa: E731
    sb = C["sat_batch"][name]
    _mark(f"{name}: infer b{sb}")
    dt, med, spread = _bench_scalar_stats(fwd, (variables, x1k[:sb]),
                                          iters=4, reps=9)
    RESULTS[f"{name}_infer_fps_b{sb}"] = sb / dt
    RESULTS[f"{name}_infer_fps_b{sb}_med"] = sb / med
    RESULTS[f"{name}_infer_b{sb}_spread_pct"] = 100 * spread
    RESULTS[f"{name}_infer_fps_saturated"] = max(
        RESULTS.get(f"{name}_infer_fps_saturated", 0.0), sb / dt)
    # methodology cross-check: at saturated batch the device-loop and
    # host-loop numbers must agree (compute >> per-dispatch overhead)
    _mark(f"{name}: infer b{sb} (device loop)")
    try:
        dt_dev = _bench_device_loop(eapply, variables, x1k[:sb], iters=8)
        RESULTS[f"{name}_deviceloop_check_b{sb}"] = dt / dt_dev
    except Exception as e:
        _mark(f"{name}: device loop failed ({e!r})")
    # achieved rate + MFU from XLA's FLOP count of the compiled fwd
    comp = jax.jit(lambda v_, x_: model.apply(v_, x_, train=False)) \
        .lower(variables, x1k[:sb]).compile()
    flops = float(comp.cost_analysis().get("flops", 0.0))
    RESULTS[f"{name}_infer_tflops"] = flops / dt / 1e12
    RESULTS[f"{name}_infer_mfu_pct"] = 100.0 * flops / dt / C["peak"]
    if name == "dsgcn":
        _edges_per_sec()
        # bf16 at the saturated batch too (monotone in batch — bf16 halves
        # the activation footprint, so the fp32 HBM-ceiling regime starts
        # later)
        if "dsgcn" in C["bf16"]:
            m16, v16 = C["bf16"]["dsgcn"]
            fwd16 = jax.jit(
                lambda v_, x_: m16.apply(v_, x_, train=False).sum())
            _mark("dsgcn: bf16 infer b1024")
            dtb = _bench_scalar(fwd16, (v16, x1k), iters=4)
            RESULTS["dsgcn_infer_fps_b1024_bf16"] = 1024 / dtb
            RESULTS["dsgcn_infer_fps_bf16_saturated"] = max(
                RESULTS.get("dsgcn_infer_fps_bf16_saturated", 0.0),
                1024 / dtb)
            comp = jax.jit(lambda v_, x_: m16.apply(v_, x_, train=False)) \
                .lower(v16, x1k).compile()
            flops = float(comp.cost_analysis().get("flops", 0.0))
            RESULTS["dsgcn_infer_bf16_tflops"] = flops / dtb / 1e12
            RESULTS["dsgcn_infer_bf16_mfu_pct"] = \
                100.0 * flops / dtb / C["peak"]


def _sec_zoo(C):
    """Model-zoo FPS vs the reference's published 2080Ti table (BASELINE.md /
    examples/inference_speed.ipynb: batch 16, M=2, T=100, V=25, fp32; sgn
    runs its reference T=30 protocol).  Each family guarded individually."""
    import jax
    import jax.numpy as jnp
    from dsgcn_tpu.models.builder import build_named_model
    x16, rng = C["x16"], C["rng"]
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
            RESULTS[f"{key}_infer_fps_b16"] = 16 / best
            RESULTS[f"{key}_infer_fps_b16_med"] = 16 / med
            RESULTS[f"{key}_infer_b16_spread_pct"] = 100 * spread
            if ref:
                RESULTS[f"{key}_vs_2080ti"] = 16 / best / ref
        except Exception as e:
            _mark(f"zoo {name}: failed ({e!r})")


def _sec_ms_tcn(C):
    """Fused multi-branch TCN (ops/pallas/ms_tcn.py) vs its XLA region —
    VERDICT r2 #6: measure on chip, decide the default from data."""
    import jax
    from dsgcn_tpu.ops.tcn import DGMSTCN
    x1k = C["x1k"]
    xt = x1k[:512].reshape(1024, 100, 25, 3)[..., :1].repeat(64, -1)
    for use_pallas, tag in ((False, "xla"), (True, "pallas")):
        tcn = DGMSTCN(out_channels=64, use_pallas=use_pallas)
        tv = jax.jit(lambda k, x_: tcn.init(k, x_, train=False))(
            jax.random.PRNGKey(0), xt[:2])
        tf = jax.jit(lambda v_, x_: tcn.apply(v_, x_, train=False).sum())
        _mark(f"ms_tcn {tag}: c64 T100 b1024")
        dt = _bench_scalar(tf, (tv, xt), iters=6, reps=3)
        RESULTS[f"ms_tcn_{tag}_ms_c64_b1024"] = dt * 1e3


def _sec_xla_path(C):
    """XLA (non-Pallas) dynamic-graph path for comparison."""
    import jax
    from dsgcn_tpu.models.builder import build_named_model
    model, variables = C["models"]["dsgcn"]
    x1k = C["x1k"]
    model_xla = build_named_model("dsgcn", num_classes=60, use_pallas=False)
    fwd = jax.jit(
        lambda v_, x_: model_xla.apply(v_, x_, train=False).sum())
    _mark("dsgcn: xla-path infer b1024")
    RESULTS["dsgcn_infer_fps_b1024_xla"] = 1024 / _bench_scalar(
        fwd, (variables, x1k), iters=3)


def _real_sections():
    C = {}
    return [
        # -- north-star keys first: all inside the first ~900 s ------------
        ("setup", lambda: _sec_setup(C)),
        ("dgstgcn_fp32", lambda: _infer_fp32(C, "dgstgcn")),
        ("dgstgcn_bf16", lambda: _infer_bf16(C, "dgstgcn", (16, 64, 256))),
        ("dsgcn_fp32", lambda: (_infer_fp32(C, "dsgcn"), _edges_per_sec())),
        ("dsgcn_bf16", lambda: _infer_bf16(C, "dsgcn", (64, 256))),
        ("train_b64", lambda: [_train_rows(C, n, [(64, False, None),
                                                  (64, False, "bfloat16")])
                               for n in ("dgstgcn", "dsgcn")]),
        ("jp_aot", lambda: _sec_jp_aot(C)),
        # -- saturated sweeps + MFU + big-batch training --------------------
        ("dgstgcn_saturated", lambda: _sec_saturated(C, "dgstgcn")),
        ("dsgcn_saturated", lambda: _sec_saturated(C, "dsgcn")),
        ("train_saturated",
         lambda: [_train_rows(C, n, [(256, True, None),
                                     (256, "tcn", "bfloat16"),
                                     (256, "tcn", None)])
                  for n in ("dgstgcn", "dsgcn")]),
        # -- breadth rows: first casualties of the deadline -----------------
        ("zoo", lambda: _sec_zoo(C)),
        ("ms_tcn_ab", lambda: _sec_ms_tcn(C)),
        ("xla_path", lambda: _sec_xla_path(C)),
    ]


def _selftest_sections():
    """Tiny no-device sections exercising the capture machinery itself
    (tests/test_bench_capture.py): the first records the headline key, the
    second announces itself on stderr and blocks so the test can SIGTERM
    mid-section, the third never runs under a short deadline."""
    def headline():
        RESULTS["dgstgcn_infer_fps_b16"] = 123.0
        time.sleep(float(os.environ.get("BENCH_SELFTEST_HEADLINE_S", "0")))

    def slow():
        _mark("SELFTEST_SLOW_SECTION_RUNNING")
        time.sleep(float(os.environ.get("BENCH_SELFTEST_SLOW_S", "60")))
        RESULTS["selftest_slow_done"] = 1.0

    def never():
        RESULTS["selftest_never_done"] = 1.0

    STATE["device"] = "selftest"
    return [("headline", headline), ("slow", slow), ("never", never)]


def main():
    signal.signal(signal.SIGTERM, _on_kill)
    signal.signal(signal.SIGINT, _on_kill)
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "1400"))
    sections = (_selftest_sections() if os.environ.get("BENCH_SELFTEST")
                else _real_sections())
    fatal = None
    for name, fn in sections:
        elapsed = time.perf_counter() - _T0
        if elapsed > deadline:
            STATE["skipped"].append(name)
            continue
        _mark(f"section {name} (deadline {deadline - elapsed:.0f}s away)")
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — partial capture beats a lost round
            err = f"{name}: {type(e).__name__}: {e}"
            _mark(f"section failed: {err}")
            if name == "setup":
                fatal = err
                STATE["error"] = err
                break
            STATE["error"] = err if STATE["error"] is None \
                else STATE["error"] + " | " + err
        _snapshot()
    if STATE["skipped"]:
        _mark(f"deadline: skipped {STATE['skipped']}")
    _snapshot()
    if fatal is not None and not RESULTS:
        sys.exit(1)


if __name__ == "__main__":
    main()
