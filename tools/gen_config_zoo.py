#!/usr/bin/env python
"""Generate the model-zoo config families matching every BASELINE.md accuracy
row: {stgcn, stgcnpp, aagcn, ctrgcn} x {ntu60_xsub, ntu60_xview, ntu120_xsub,
ntu120_xset} x {j, b, jm, bm}.

Recipe = pyskl practice (reference configs/stgcn++/stgcn++_ntu60_xsub_3dkp/j.py:
clip_len 100, RepeatDataset x5, 16 epochs ~= 80 effective, SGD 0.1 cosine,
batch 16/device) with each family's PLAIN ops — the committed reference family
bases were repurposed for experiments and no longer match the model zoo
(SURVEY §0.2); the stgcn++ leaves preserve the upstream form this reproduces.
"""
import os

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                    "configs")

FAMILIES = {
    "stgcn": """# ST-GCN (plain unit_gcn + unit_tcn, stgcn_spatial partition —
# the original upstream form; the committed reference STGCN_model.py was
# repurposed, SURVEY §0.2)
_base_ = ['../_init_/schedule.py']
model = dict(
    type='RecognizerGCN',
    backbone=dict(
        type='STGCN',
        graph_cfg=dict(layout='nturgb+d', mode='stgcn_spatial')),
    cls_head=dict(type='GCNHead', num_classes={nc}, in_channels=256))
""",
    "stgcnpp": """# STGCN++ (reference configs/stgcn++/STGCN++_model.py:1-9)
_base_ = ['../_init_/schedule.py']
model = dict(
    type='RecognizerGCN',
    backbone=dict(
        type='STGCN',
        gcn_adaptive='init',
        gcn_with_res=True,
        tcn_type='mstcn',
        graph_cfg=dict(layout='nturgb+d', mode='spatial')),
    cls_head=dict(type='GCNHead', num_classes={nc}, in_channels=256))
""",
    "aagcn": """# AAGCN (plain unit_aagcn — upstream form; committed reference
# AAGCN_model.py switched to unit_aahgcn+unitmlp experiments, SURVEY §0.2)
_base_ = ['../_init_/schedule.py']
model = dict(
    type='RecognizerGCN',
    backbone=dict(
        type='AAGCN',
        graph_cfg=dict(layout='nturgb+d', mode='spatial')),
    cls_head=dict(type='GCNHead', num_classes={nc}, in_channels=256))
""",
    "ctrgcn": """# CTR-GCN (plain unit_ctrgcn + CTR-MSTCN — upstream form;
# committed reference CTRGCN_model.py switched to unit_ctrhgcn+msmlp,
# SURVEY §0.2)
_base_ = ['../_init_/schedule.py']
model = dict(
    type='RecognizerGCN',
    backbone=dict(
        type='CTRGCN',
        gcn_type='unit_ctrgcn',
        graph_cfg=dict(layout='nturgb+d', mode='spatial')),
    cls_head=dict(type='GCNHead', num_classes={nc}, in_channels=256))
""",
}

DATASETS = {
    "ntu60_xsub": ("ntu60_3danno.pkl", "xsub", 60),
    "ntu60_xview": ("ntu60_3danno.pkl", "xview", 60),
    "ntu120_xsub": ("ntu120_3danno.pkl", "xsub", 120),
    "ntu120_xset": ("ntu120_3danno.pkl", "xset", 120),
}

LEAF = """# {fam} {mod} stream, {ds} (pyskl practice; see
# reference configs/stgcn++/stgcn++_ntu60_xsub_3dkp/{mod}.py for the recipe)
_base_ = ['../{base}']
modality = '{mod}'
clip_len = 100
dataset_type = 'PoseDataset'
ann_file = 'data/nturgbd/{ann}'
train_pipeline = [
    dict(type='PreNormalize3D'),
    dict(type='GenSkeFeat', dataset='nturgb+d', feats=[modality]),
    dict(type='UniformSample', clip_len=clip_len),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput', num_person=2),
    dict(type='Collect', keys=['keypoint', 'label']),
]
val_pipeline = [
    dict(type='PreNormalize3D'),
    dict(type='GenSkeFeat', dataset='nturgb+d', feats=[modality]),
    dict(type='UniformSample', clip_len=clip_len, num_clips=1,
         test_mode=True),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput', num_person=2),
    dict(type='Collect', keys=['keypoint', 'label']),
]
test_pipeline = [
    dict(type='PreNormalize3D'),
    dict(type='GenSkeFeat', dataset='nturgb+d', feats=[modality]),
    dict(type='UniformSample', clip_len=clip_len, num_clips=10,
         test_mode=True),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput', num_person=2),
    dict(type='Collect', keys=['keypoint', 'label']),
]
data = dict(
    videos_per_gpu=16,
    workers_per_gpu=2,
    test_dataloader=dict(videos_per_gpu=16),
    train=dict(type='RepeatDataset', times=5,
               dataset=dict(type=dataset_type, ann_file=ann_file,
                            pipeline=train_pipeline, split='{split}_train')),
    val=dict(type=dataset_type, ann_file=ann_file, pipeline=val_pipeline,
             split='{split}_val'),
    test=dict(type=dataset_type, ann_file=ann_file, pipeline=test_pipeline,
              split='{split}_val'))
total_epochs = 16
checkpoint_config = dict(interval=1)
"""


def main():
    for fam, model_tpl in FAMILIES.items():
        fam_dir = os.path.join(ROOT, fam)
        os.makedirs(fam_dir, exist_ok=True)
        for ds, (ann, split, nc) in DATASETS.items():
            base_name = f"{fam.upper()}_{nc}_model.py"
            with open(os.path.join(fam_dir, base_name), "w") as f:
                f.write(model_tpl.format(nc=nc))
            leaf_dir = os.path.join(fam_dir, f"{ds}_3dkp")
            os.makedirs(leaf_dir, exist_ok=True)
            for mod in ("j", "b", "jm", "bm"):
                with open(os.path.join(leaf_dir, f"{mod}.py"), "w") as f:
                    f.write(LEAF.format(fam=fam, mod=mod, ds=ds, ann=ann,
                                        split=split, base=base_name))
    print("config zoo generated")


if __name__ == "__main__":
    main()
