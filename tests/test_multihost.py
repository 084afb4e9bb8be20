"""Multi-host training e2e: two real OS processes, gloo-backed cross-process
collectives over a 2x2-device CPU mesh, through the actual tools/train.py CLI.

This exercises the whole multi-host stack the reference covers with
torch.distributed.launch + DDP (SURVEY §2.9): jax.distributed.initialize from
env coordinates, make_multihost_mesh (hosts contiguous on the outer data
axis), per-host disjoint loader shards assembled into global batches
(make_array_from_process_local_data), cross-host gradient psum, distributed
validation (per-host device shards + process_allgather), primary-host-only
logging, and multi-process orbax checkpointing.

The final-parameter hash printed by each process must be identical — that is
only true if gradients and BN statistics were actually reduced across the
process boundary every step.
"""
import json
import os
import socket
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import hashlib
import sys

import numpy as np

sys.path.insert(0, {root!r})
sys.path.insert(0, {root!r} + "/tools")
import jax
jax.config.update("jax_platforms", "cpu")

sys.argv = ["train.py", {cfg!r}, "--work-dir", {wd!r}, "--validate",
            "--total-epochs", "2"]
import train
trainer = train.main()

assert jax.process_count() == 2, jax.process_count()
assert dict(trainer.mesh.shape)["data"] == 4, trainer.mesh.shape
assert trainer.is_main == (jax.process_index() == 0)

state = jax.device_get(trainer.state)
leaves = jax.tree.leaves({{"p": state.params, "s": state.batch_stats}})
h = hashlib.sha256(
    b"".join(np.ascontiguousarray(l).tobytes() for l in leaves)).hexdigest()
print(f"PARAM_HASH {{h}}", flush=True)
print(f"VAL {{trainer.validate()}}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_training(tmp_path):
    data = tmp_path / "data"
    data.mkdir()
    env0 = dict(os.environ)
    env0["JAX_PLATFORMS"] = "cpu"
    subprocess.run([sys.executable, "tools/data/make_synthetic.py",
                    str(data / "synth.pkl")], cwd=ROOT, env=env0, check=True,
                   timeout=300)

    cfg = tmp_path / "mh.py"
    cfg.write_text(f"""
_base_ = ['{ROOT}/configs/synthetic/export_tiny.py']
ann_file = '{data}/synth.pkl'
data = dict(
    videos_per_gpu=4, workers_per_gpu=0,
    train=dict(ann_file=ann_file),
    val=dict(ann_file=ann_file),
    test=dict(ann_file=ann_file))
""")
    wd = tmp_path / "wd"
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER.format(root=ROOT, cfg=str(cfg), wd=str(wd)))

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
        env["JAX_COORDINATOR"] = f"127.0.0.1:{port}"
        env["JAX_NUM_PROCESSES"] = "2"
        env["JAX_PROCESS_ID"] = str(pid)
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], cwd=ROOT, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True))
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"rc={p.returncode}\nOUT:{out[-3000:]}\nERR:{err[-3000:]}"
        outs.append(out)

    # cross-host gradient/BN sync: both processes end with identical state
    hashes = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("PARAM_HASH")]
        assert line, out[-2000:]
        hashes.append(line[0].split()[1])
    assert hashes[0] == hashes[1]

    # distributed validation ran on both and produced a metric
    for out in outs:
        assert any(l.startswith("VAL {") and "top1" in l
                   for l in out.splitlines()), out[-2000:]

    # primary host wrote the structured log (with val records) and checkpoint;
    # the secondary wrote neither log nor a competing one
    logs = [f for f in os.listdir(wd) if f.endswith(".log.jsonl")]
    assert len(logs) == 1
    records = [json.loads(l) for l in open(wd / logs[0])]
    assert any(r.get("mode") == "val" for r in records)
    assert any(r.get("event") == "epoch_done" for r in records)
    assert (wd / "ckpt").exists() and os.listdir(wd / "ckpt")
