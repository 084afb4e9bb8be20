"""End-to-end Trainer test: synthetic dataset -> pipeline -> SPMD training ->
eval metrics improve -> checkpoint + resume."""
import os

import numpy as np
import pytest

import jax

from dsgcn_tpu.core.trainer import Trainer
from dsgcn_tpu.data.dataset import (Loader, PoseDataset, RepeatDataset,
                                    make_synthetic_pose_dataset)
from dsgcn_tpu.models.builder import build_named_model
from dsgcn_tpu.parallel.mesh import make_mesh

TRAIN_PIPE = [
    dict(type="PreNormalize3D", align_spine=False),
    dict(type="RandomRot", theta=0.2),
    dict(type="GenSkeFeat", feats=["j"]),
    dict(type="UniformSample", clip_len=16),
    dict(type="PoseDecode"),
    dict(type="FormatGCNInput"),
    dict(type="Collect", keys=["keypoint", "label"]),
]
VAL_PIPE = [
    dict(type="PreNormalize3D", align_spine=False),
    dict(type="GenSkeFeat", feats=["j"]),
    dict(type="UniformSample", clip_len=16, num_clips=2, test_mode=True),
    dict(type="PoseDecode"),
    dict(type="FormatGCNInput"),
    dict(type="Collect", keys=["keypoint", "label"]),
]


@pytest.fixture(scope="module")
def ann_file(tmp_path_factory):
    path = tmp_path_factory.mktemp("data") / "synth.pkl"
    make_synthetic_pose_dataset(num_samples=256, num_classes=4, t=40,
                                path=str(path))
    return str(path)


def test_trainer_end_to_end(ann_file, tmp_path):
    train_ds = RepeatDataset(
        PoseDataset(ann_file, TRAIN_PIPE, split="train"), times=1)
    val_ds = PoseDataset(ann_file, VAL_PIPE, split="val", test_mode=True)
    train_loader = Loader(train_ds, batch_size=16, drop_last=True, num_workers=2)
    val_loader = Loader(val_ds, batch_size=8, shuffle=False, num_workers=2)

    model = build_named_model("stgcn++", num_classes=4)
    mesh = make_mesh(n_data=4)
    trainer = Trainer(model, str(tmp_path / "wd"), train_loader, val_loader,
                      total_epochs=5, lr=0.03, mesh=mesh,
                      ckpt_interval_epochs=1, log_interval=4)
    trainer.fit()
    res = trainer.validate()
    assert res["top1_acc"] > 0.5, res   # classes are linearly separable

    # resume path: a fresh trainer picks up the checkpoint
    trainer2 = Trainer(model, str(tmp_path / "wd"), train_loader, val_loader,
                       total_epochs=5, lr=0.03, mesh=mesh,
                       ckpt_interval_epochs=1)
    trainer2.resume_if_possible()
    assert trainer2.start_epoch == 5
    assert int(jax.device_get(trainer2.state.step)) > 0
    res2 = trainer2.validate()
    assert abs(res2["top1_acc"] - res["top1_acc"]) < 1e-6


def test_loader_determinism(ann_file):
    ds = PoseDataset(ann_file, TRAIN_PIPE, split="train")
    l1 = Loader(ds, batch_size=8, seed=3, num_workers=4)
    l2 = Loader(ds, batch_size=8, seed=3, num_workers=0)
    b1 = next(iter(l1.epoch(2)))
    b2 = next(iter(l2.epoch(2)))
    np.testing.assert_array_equal(b1["keypoint"], b2["keypoint"])
    np.testing.assert_array_equal(b1["label"], b2["label"])


def test_loader_sharding_disjoint(ann_file):
    ds = PoseDataset(ann_file, TRAIN_PIPE, split="train")
    from dsgcn_tpu.data.dataset import epoch_indices
    a = epoch_indices(len(ds), 1, shard=0, num_shards=2)
    b = epoch_indices(len(ds), 1, shard=1, num_shards=2)
    assert set(a).isdisjoint(set(b)) or len(ds) % 2 == 1
    assert len(a) + len(b) >= len(ds)


def test_class_prob_sampler(ann_file):
    from dsgcn_tpu.data.dataset import Loader, PoseDataset, epoch_indices
    ds = PoseDataset(ann_file, TRAIN_PIPE, split="train")
    labels = ds.labels
    # triple-sample class 0
    inds = epoch_indices(len(ds), 1, class_prob={0: 3.0}, labels=labels)
    base = (labels == 0).sum()
    got = (labels[inds] == 0).sum()
    assert got == 3 * base
    # loader integrates it
    loader = Loader(ds, batch_size=8, class_prob={0: 3.0}, num_workers=0)
    assert loader.steps_per_epoch() >= (len(ds) + 2 * base) // 8
