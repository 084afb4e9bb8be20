"""Learning-curve parity: both stacks LEARN the same way over a meaningful
horizon (VERDICT r3 #6).

The resynced-strict epoch-parity test (test_epoch_parity.py) proves per-step
semantic equality; this test adds the complementary long-horizon evidence: the
torch reference stack and our jitted train path, started from the SAME init
and fed the SAME pipeline batches, free-run 16 epochs in f32 on a learnable
class-separable synthetic task under the full pyskl recipe (SGD nesterov +
coupled wd + per-iteration cosine decay, configs/_init_/lr_schedual.py:11,27;
loop body apis/train.py:52-223) — and both must reach matching, RISING
validation top-1.  f32 free runs diverge chaotically at the parameter level,
so the comparison is at the accuracy level: that is exactly the claim the
published model-zoo tables make.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

import test_epoch_parity as ep
from dsgcn_tpu.core.train import TrainState, train_step
from dsgcn_tpu.data.dataset import (Loader, PoseDataset,
                                    make_synthetic_pose_dataset)
from dsgcn_tpu.models.builder import build_named_model

EPOCHS, STEPS_PER_EPOCH, BATCH = 16, 12, 8
N_SAMPLES, N_CLASSES = 128, ep.N_CLASSES    # 96 train / 32 val at 3:1 split
LR = 0.05


def _make_optimizer(total_steps):
    from dsgcn_tpu.core.train import make_optimizer
    return make_optimizer(lr=LR, total_steps=total_steps,
                          momentum=ep.MOM, weight_decay=ep.WD)


def _batches(tmp_path):
    """EPOCHS worth of train batches + val batches from our real pipeline,
    shared verbatim by both frameworks (f32).  Larger instance of the
    epoch-parity pipeline (ep._pipeline_batches): the 48-sample version
    plateaus near chance within the assertion horizon."""
    path = str(tmp_path / "synth.pkl")
    make_synthetic_pose_dataset(num_samples=N_SAMPLES, num_classes=N_CLASSES,
                                m=2, t=24, seed=3, path=path)
    train_pipe = [
        dict(type="PreNormalize3D"),
        dict(type="GenSkeFeat", dataset="nturgb+d", feats=["j"]),
        dict(type="UniformSampleFrames", clip_len=16),
        dict(type="PoseDecode"),
        dict(type="FormatGCNInput", num_person=2),
        dict(type="Collect", keys=["keypoint", "label"]),
    ]
    val_pipe = [
        dict(type="PreNormalize3D"),
        dict(type="GenSkeFeat", dataset="nturgb+d", feats=["j"]),
        dict(type="UniformSampleFrames", clip_len=16, num_clips=1,
             test_mode=True),
        dict(type="PoseDecode"),
        dict(type="FormatGCNInput", num_person=2),
        dict(type="Collect", keys=["keypoint", "label"]),
    ]
    train = Loader(PoseDataset(path, train_pipe, split="train"),
                   batch_size=BATCH, drop_last=True, seed=11, num_workers=0)
    val = Loader(PoseDataset(path, val_pipe, split="val", test_mode=True),
                 batch_size=BATCH, shuffle=False, num_workers=0)
    epochs = []
    for e in range(EPOCHS):
        steps = []
        for batch in train.epoch(e):
            kp = batch["keypoint"]
            if kp.ndim == 6:              # (N, nc=1, M, T, V, C)
                kp = kp[:, 0]
            steps.append((kp.astype(np.float32), batch["label"]))
        assert len(steps) >= STEPS_PER_EPOCH
        epochs.append(steps[:STEPS_PER_EPOCH])
    vb = []
    for batch in val.epoch(0):
        kp = batch["keypoint"]
        n, nc = kp.shape[:2]
        vb.append((kp.reshape((n * nc,) + kp.shape[2:]).astype(np.float32),
                   batch["label"]))
    return epochs, vb


def _torch_curve(tmodel, epochs, vb):
    total = EPOCHS * STEPS_PER_EPOCH
    topt = torch.optim.SGD(tmodel.parameters(), lr=LR, momentum=ep.MOM,
                           weight_decay=ep.WD, nesterov=True)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(topt, T_max=total,
                                                       eta_min=0.0)
    accs = []
    for batches in epochs:
        tmodel.train()
        for x, y in batches:
            out = tmodel(torch.tensor(x))
            loss = torch.nn.functional.cross_entropy(
                out, torch.tensor(y, dtype=torch.long))
            topt.zero_grad()
            loss.backward()
            topt.step()
            sched.step()
        tmodel.eval()
        hits, n = 0, 0
        for x, y in vb:
            with torch.no_grad():
                pred = tmodel(torch.tensor(x)).argmax(-1).numpy()
            hits += int((pred == np.asarray(y)).sum())
            n += len(y)
        accs.append(hits / n)
    return accs


def _jax_curve(variables, epochs, vb, compute_dtype=None):
    import functools
    total = EPOCHS * STEPS_PER_EPOCH
    model = build_named_model("dsgcn", num_classes=N_CLASSES)
    tx, _ = _make_optimizer(total)
    state = TrainState.create(model.apply, variables["params"],
                              variables["batch_stats"], tx)
    step = jax.jit(functools.partial(train_step,
                                     compute_dtype=compute_dtype))
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    accs = []
    for batches in epochs:
        for x, y in batches:
            state, _ = step(state, dict(keypoint=jnp.asarray(x),
                                        label=jnp.asarray(y)),
                            jax.random.PRNGKey(0))
        v = {"params": state.params, "batch_stats": state.batch_stats}
        hits, n = 0, 0
        for x, y in vb:
            pred = np.asarray(fwd(v, jnp.asarray(x))).argmax(-1)
            hits += int((pred == np.asarray(y)).sum())
            n += len(y)
        accs.append(hits / n)
    return accs


@pytest.mark.slow
def test_learning_curves_match(tmp_path):
    epochs, vb = _batches(tmp_path)

    tmodel = ep._make_torch_model(seed=7, family="dsgcn").float()
    variables, _ = ep._torch_variables(tmodel, "dsgcn")
    variables = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), variables)

    t_accs = _torch_curve(tmodel, epochs, vb)
    j_accs = _jax_curve(variables, epochs, vb)
    print(f"torch curve: {t_accs}")
    print(f"jax   curve: {j_accs}")

    # both curves RISE: late-phase mean clearly above the first epoch
    t_late = float(np.mean(t_accs[-3:]))
    j_late = float(np.mean(j_accs[-3:]))
    assert t_late >= t_accs[0] + 0.2, (t_accs[0], t_late)
    assert j_late >= j_accs[0] + 0.2, (j_accs[0], j_late)
    # both learn the task well past chance (1/N_CLASSES = 0.2)
    assert t_late >= 0.5 and j_late >= 0.5, (t_late, j_late)
    # and agree on WHERE they land (accuracy-level parity)
    assert abs(t_late - j_late) <= 0.15, (t_late, j_late)


@pytest.mark.slow
def test_bf16_learning_curve(tmp_path):
    """Mixed-precision training quality gate (core/train.py compute_dtype):
    the bf16-compute free run must land at the same accuracy level as the
    f32 run over the full 16-epoch recipe.  Skips on backends without bf16
    dot execution (XLA:CPU)."""
    epochs, vb = _batches(tmp_path)
    tmodel = ep._make_torch_model(seed=7, family="dsgcn").float()
    variables, _ = ep._torch_variables(tmodel, "dsgcn")
    variables = jax.tree.map(lambda a: jnp.asarray(a, jnp.float32), variables)

    j_accs = _jax_curve(variables, epochs, vb)
    try:
        b_accs = _jax_curve(variables, epochs, vb, "bfloat16")
    except Exception as e:  # noqa: BLE001
        if "BF16" in str(e) or "bf16" in str(e):
            pytest.skip(f"backend lacks bf16 dot execution: {str(e)[:80]}")
        raise
    print(f"f32  curve: {j_accs}")
    print(f"bf16 curve: {b_accs}")
    j_late = float(np.mean(j_accs[-3:]))
    b_late = float(np.mean(b_accs[-3:]))
    assert b_late >= b_accs[0] + 0.2, (b_accs[0], b_late)
    assert b_late >= 0.5, b_late
    # one-sided: bf16 must not land materially BELOW f32.  Free runs are
    # chaotic at this scale and bf16 can land above f32 by more than any
    # symmetric band (measured on v5e: f32 0.51 late vs bf16 0.75, both
    # rising from 0.22 — bf16_curve_tpu run, round 5); only a bf16
    # QUALITY LOSS is a failure.
    assert b_late >= j_late - 0.15, (j_late, b_late)
