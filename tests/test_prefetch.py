"""Input-pipeline prefetch: the background-thread producer must be a pure
pipelining transform — same elements, same order, errors re-raised — and
training through it must be bit-identical to in-line loading."""
import numpy as np
import pytest

import jax

from dsgcn_tpu.core.trainer import Trainer
from dsgcn_tpu.data.dataset import (Loader, PoseDataset,
                                    make_synthetic_pose_dataset, prefetch)
from dsgcn_tpu.models.builder import build_named_model
from dsgcn_tpu.parallel.mesh import make_mesh

PIPE = [
    dict(type="PreNormalize3D", align_spine=False),
    dict(type="GenSkeFeat", feats=["j"]),
    dict(type="UniformSample", clip_len=8),
    dict(type="PoseDecode"),
    dict(type="FormatGCNInput"),
    dict(type="Collect", keys=["keypoint", "label"]),
]


def test_prefetch_order_and_fn():
    items = list(range(23))
    assert list(prefetch(iter(items), depth=4)) == items
    assert list(prefetch(iter(items), fn=lambda x: x * 2, depth=2)) == \
        [2 * x for x in items]
    # depth=0: no thread, plain mapping
    assert list(prefetch(iter(items), fn=lambda x: -x, depth=0)) == \
        [-x for x in items]


def test_prefetch_error_propagates():
    def gen():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        list(it)

    def bad_fn(x):
        raise ValueError("map failed")

    with pytest.raises(ValueError, match="map failed"):
        list(prefetch(iter([1, 2]), fn=bad_fn, depth=2))


def test_prefetch_training_bit_identical(tmp_path):
    ann = tmp_path / "synth.pkl"
    make_synthetic_pose_dataset(num_samples=64, num_classes=4, t=24,
                                path=str(ann))

    def run(depth, wd):
        ds = PoseDataset(str(ann), PIPE, split="train")
        loader = Loader(ds, batch_size=8, drop_last=True, num_workers=2)
        model = build_named_model("stgcn++", num_classes=4)
        trainer = Trainer(model, str(tmp_path / wd), loader, None,
                          total_epochs=1, lr=0.05, mesh=make_mesh(n_data=4),
                          prefetch_depth=depth, ckpt_interval_epochs=100)
        trainer.fit()
        return jax.device_get(
            dict(p=trainer.state.params, s=trainer.state.batch_stats))

    a = run(0, "wd0")
    b = run(2, "wd2")
    for la, lb in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
