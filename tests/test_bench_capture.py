"""The bench capture must be un-losable (VERDICT r4 #1).

BENCH_r03 and BENCH_r04 were both lost: r03 to a transient backend outage,
r04 to the driver's kill budget arriving while bench.py's JSON was still
unprinted at the end of main().  bench.py now (a) prints the accumulated
JSON line after every section, (b) installs a SIGTERM/SIGINT handler that
dumps the capture with ``"error": "killed"`` and exits 0, (c) enforces an
internal deadline (``BENCH_DEADLINE_S``) recording ``skipped_sections``.

These tests drive the machinery itself through bench.py's BENCH_SELFTEST
sections (tiny, no device, no jax import) — the same runner loop, signal
handler, and snapshot path the real run uses.
"""
import json
import os
import signal
import subprocess
import sys
import time

import pytest

BENCH = os.path.join(os.path.dirname(__file__), os.pardir, "bench.py")


def _last_json_line(stdout: str) -> dict:
    lines = [ln for ln in stdout.strip().splitlines() if ln.strip()]
    assert lines, f"no stdout lines: {stdout!r}"
    return json.loads(lines[-1])


def test_sigterm_mid_section_still_emits_capture(tmp_path):
    """The driver's timeout(1) sends SIGTERM: the capture so far must still
    land on stdout as a valid JSON line, with exit code 0."""
    env = dict(os.environ, BENCH_SELFTEST="1", BENCH_SELFTEST_SLOW_S="60",
               BENCH_DEADLINE_S="120")
    proc = subprocess.Popen(
        [sys.executable, BENCH], cwd=tmp_path, env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
    try:
        # wait until bench is blocked INSIDE the slow section
        deadline = time.time() + 30
        for line in proc.stderr:
            if "SELFTEST_SLOW_SECTION_RUNNING" in line:
                break
            assert time.time() < deadline, "selftest never reached slow section"
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=30)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, "SIGTERM must exit 0 (driver records rc)"
    cap = _last_json_line(out)
    # the headline section completed before the kill: its key must be there
    assert cap["value"] == 123.0
    assert cap["vs_baseline"] == pytest.approx(123.0 / 409.0, abs=1e-3)
    assert cap["error"] == "killed"
    # the interrupted section's key must NOT be there
    assert "selftest_slow_done" not in cap


def test_snapshot_after_every_section(tmp_path):
    """Every completed section re-prints the full accumulated JSON line, so
    a kill between sections costs nothing: each stdout line must parse and
    carry the headline from section 1 onward."""
    env = dict(os.environ, BENCH_SELFTEST="1", BENCH_SELFTEST_SLOW_S="0",
               BENCH_DEADLINE_S="120")
    out = subprocess.run(
        [sys.executable, BENCH], cwd=tmp_path, env=env, capture_output=True,
        text=True, timeout=60)
    assert out.returncode == 0
    lines = [ln for ln in out.stdout.strip().splitlines() if ln.strip()]
    # 3 sections + final snapshot
    assert len(lines) >= 4
    for ln in lines:
        cap = json.loads(ln)
        assert cap["value"] == 123.0
    final = json.loads(lines[-1])
    assert final["selftest_slow_done"] == 1.0
    assert final["selftest_never_done"] == 1.0
    assert "error" not in final and "skipped_sections" not in final
    # the capture is mirrored to a file for post-mortem
    partial = os.path.join(os.path.dirname(os.path.abspath(BENCH)),
                           "BENCH_PARTIAL.json")
    assert os.path.exists(partial)
    assert json.loads(open(partial).read())["value"] == 123.0


def test_internal_deadline_skips_and_records(tmp_path):
    """Past BENCH_DEADLINE_S, remaining sections are skipped and recorded —
    the run ends with a complete JSON line instead of running into the
    driver's kill."""
    env = dict(os.environ, BENCH_SELFTEST="1",
               BENCH_SELFTEST_HEADLINE_S="0.6", BENCH_SELFTEST_SLOW_S="60",
               BENCH_DEADLINE_S="0.5")
    out = subprocess.run(
        [sys.executable, BENCH], cwd=tmp_path, env=env, capture_output=True,
        text=True, timeout=60)
    assert out.returncode == 0
    cap = _last_json_line(out.stdout)
    assert cap["value"] == 123.0
    assert cap["skipped_sections"] == ["slow", "never"]
    assert "selftest_slow_done" not in cap
