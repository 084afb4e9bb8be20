#!/usr/bin/env python
"""Generate the model-zoo config families matching every BASELINE.md accuracy
row: {stgcn, stgcnpp, aagcn, ctrgcn} x {ntu60_xsub, ntu60_xview, ntu120_xsub,
ntu120_xset} x {3dkp, hrnet} x {j, b, jm, bm}, plus the DS-GCN split/dataset
breadth (ntu60_xview, ntu120_xsub/xset, and the 2D-skeleton datasets
kinetics400/GYM/Diving48/HMDB51/UCF101, hrnet-coco).

Recipe = pyskl practice (reference configs/stgcn++/stgcn++_ntu60_xsub_3dkp/j.py:
clip_len 100, RepeatDataset x5, 16 epochs ~= 80 effective, SGD 0.1 cosine,
batch 16/device) with each family's PLAIN ops — the committed reference family
bases were repurposed for experiments and no longer match the model zoo
(SURVEY §0.2); the stgcn++ leaves preserve the upstream form this reproduces.
The hrnet leaves mirror reference configs/stgcn++/stgcn++_ntu60_xsub_hrnet/
j.py:13-21 (PreNormalize2D + coco GenSkeFeat); the DS-GCN 2D leaves mirror
configs/dsstgcn/{kinetics400,GYM,Driving48}_hrnet (the kinetics one keeps
box_thr/valid_ratio filtering, pose_dataset.py:101-124).  Two reference
config bugs are NOT reproduced: HMDB51_hrnet/j.py points at the diving48
pickle with 48 classes, and GYM_hrnet's test split is 'xval' — the emitted
leaves use the real dataset files and split names.
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
        graph_cfg=dict(layout='{layout}', mode='stgcn_spatial')),
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
        graph_cfg=dict(layout='{layout}', mode='spatial')),
    cls_head=dict(type='GCNHead', num_classes={nc}, in_channels=256))
""",
    "aagcn": """# AAGCN (plain unit_aagcn — upstream form; committed reference
# AAGCN_model.py switched to unit_aahgcn+unitmlp experiments, SURVEY §0.2)
_base_ = ['../_init_/schedule.py']
model = dict(
    type='RecognizerGCN',
    backbone=dict(
        type='AAGCN',
        graph_cfg=dict(layout='{layout}', mode='spatial')),
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
        graph_cfg=dict(layout='{layout}', mode='spatial')),
    cls_head=dict(type='GCNHead', num_classes={nc}, in_channels=256))
""",
}

DATASETS = {
    "ntu60_xsub": ("ntu60_3danno.pkl", "xsub", 60),
    "ntu60_xview": ("ntu60_3danno.pkl", "xview", 60),
    "ntu120_xsub": ("ntu120_3danno.pkl", "xsub", 120),
    "ntu120_xset": ("ntu120_3danno.pkl", "xset", 120),
}

HRNET_ANN = {"ntu60": "ntu60_hrnet.pkl", "ntu120": "ntu120_hrnet.pkl"}

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

HRNET_LEAF = """# {fam} {mod} stream, {ds} hrnet-coco 2D keypoints (reference
# configs/stgcn++/stgcn++_ntu60_xsub_hrnet/{mod}.py pipeline)
_base_ = ['../{base}']
modality = '{mod}'
clip_len = 100
dataset_type = 'PoseDataset'
ann_file = 'data/nturgbd/{ann}'
train_pipeline = [
    dict(type='PreNormalize2D'),
    dict(type='GenSkeFeat', dataset='coco', feats=[modality]),
    dict(type='UniformSample', clip_len=clip_len),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput', num_person=2),
    dict(type='Collect', keys=['keypoint', 'label']),
]
val_pipeline = [
    dict(type='PreNormalize2D'),
    dict(type='GenSkeFeat', dataset='coco', feats=[modality]),
    dict(type='UniformSample', clip_len=clip_len, num_clips=1,
         test_mode=True),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput', num_person=2),
    dict(type='Collect', keys=['keypoint', 'label']),
]
test_pipeline = [
    dict(type='PreNormalize2D'),
    dict(type='GenSkeFeat', dataset='coco', feats=[modality]),
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

# ---- DS-GCN breadth (reference configs/dsstgcn/*) --------------------------

DSGCN_MODEL = """# DS-GCN model (reference configs/dsstgcn/DSSTGCN_model.py)
_base_ = ['../_init_/schedule.py']
graph = '{layout}'
model = dict(
    type='RecognizerGCN',
    backbone=dict(
        type='DGSTGCN',
        gcn_type='dgphgcn1',
        gcn_ratio=0.125,
        gcn_node_attention=True,
        gcn_edge_attention=True,
        gcn_decompose=True,
        gcn_subset_wise=True,
        gcn_ctr='T',
        gcn_ada='T',
        tcn_type='dgmstcn',
        graph_cfg=dict(layout=graph, mode='random', num_filter=3,
                       init_off=.04, init_std=.02, seed=0),
        tcn_ms_cfg=[(3, 1), (3, 2), (3, 3), (3, 4), ('max', 3), '1x1']),
    cls_head=dict(type='GCNHead', num_classes={nc}, in_channels=256))
"""

DSGCN_3D_LEAF = """# DS-GCN {mod} stream, {ds} (reference
# configs/dsstgcn/{ds}_3dkp/{mod}.py recipe)
_base_ = ['../{base}']
modality = '{mod}'
clip_len = 60
dataset_type = 'PoseDataset'
ann_file = 'data/nturgbd/{ann}'
train_pipeline = [
    dict(type='PreNormalize3D', align_spine=False),
    dict(type='RandomRot', theta=0.2),
    dict(type='GenSkeFeat', feats=[modality]),
    dict(type='UniformSample', clip_len=clip_len),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput'),
    dict(type='Collect', keys=['keypoint', 'label']),
]
val_pipeline = [
    dict(type='PreNormalize3D', align_spine=False),
    dict(type='GenSkeFeat', feats=[modality]),
    dict(type='UniformSample', clip_len=clip_len, num_clips=1, test_mode=True),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput'),
    dict(type='Collect', keys=['keypoint', 'label']),
]
test_pipeline = [
    dict(type='PreNormalize3D', align_spine=False),
    dict(type='GenSkeFeat', feats=[modality]),
    dict(type='UniformSample', clip_len=clip_len, num_clips=10, test_mode=True),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput'),
    dict(type='Collect', keys=['keypoint', 'label']),
]
data = dict(
    videos_per_gpu=128,
    workers_per_gpu=8,
    test_dataloader=dict(videos_per_gpu=32),
    train=dict(type=dataset_type, ann_file=ann_file, pipeline=train_pipeline,
               split='{split}_train'),
    val=dict(type=dataset_type, ann_file=ann_file, pipeline=val_pipeline,
             split='{split}_val'),
    test=dict(type=dataset_type, ann_file=ann_file, pipeline=test_pipeline,
              split='{split}_val'))
total_epochs = 150
"""

DSGCN_2D_LEAF = """# DS-GCN {mod} stream, {ds} hrnet-coco (reference
# configs/dsstgcn/{refdir}/{mod}.py; split names corrected — see
# tools/gen_config_zoo.py)
_base_ = ['../DSGCN_coco_model.py']
modality = '{mod}'
clip_len = 100
model = dict(cls_head=dict(num_classes={nc}))
dataset_type = 'PoseDataset'
ann_file = '{ann}'
train_pipeline = [
    dict(type='PreNormalize2D'),
    dict(type='GenSkeFeat', dataset='coco', feats=[modality]),
    dict(type='UniformSample', clip_len=clip_len),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput', num_person=2),
    dict(type='Collect', keys=['keypoint', 'label']),
]
val_pipeline = [
    dict(type='PreNormalize2D'),
    dict(type='GenSkeFeat', dataset='coco', feats=[modality]),
    dict(type='UniformSample', clip_len=clip_len, num_clips=1, test_mode=True),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput', num_person=2),
    dict(type='Collect', keys=['keypoint', 'label']),
]
test_pipeline = [
    dict(type='PreNormalize2D'),
    dict(type='GenSkeFeat', dataset='coco', feats=[modality]),
    dict(type='UniformSample', clip_len=clip_len, num_clips=10, test_mode=True),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput', num_person=2),
    dict(type='Collect', keys=['keypoint', 'label']),
]
data = dict(
    videos_per_gpu=32,
    workers_per_gpu=4,
    test_dataloader=dict(videos_per_gpu=32),
    train=dict(type='RepeatDataset', times=5,
               dataset=dict(type=dataset_type, ann_file=ann_file,
                            pipeline=train_pipeline, split='{train_split}')),
    val=dict(type=dataset_type, ann_file=ann_file, pipeline=val_pipeline,
             split='{val_split}'),
    test=dict(type=dataset_type, ann_file=ann_file, pipeline=test_pipeline,
              split='{val_split}'))
total_epochs = 16
checkpoint_config = dict(interval=1)
"""

DSGCN_K400_LEAF = """# DS-GCN {mod} stream, kinetics400 hrnet-coco (reference
# configs/dsstgcn/kinetics400_hrnet/{mod}.py: compressed poses + box_thr /
# valid_ratio filtering, pose_dataset.py:101-124)
_base_ = ['../DSGCN_coco_model.py']
modality = '{mod}'
clip_len = 100
model = dict(cls_head=dict(num_classes=400))
dataset_type = 'PoseDataset'
ann_file = 'data/k400/k400_hrnet.pkl'
box_thr = 0.5
valid_ratio = 0.0
train_pipeline = [
    dict(type='DecompressPose', squeeze=True),
    dict(type='UniformSampleFrames', clip_len=clip_len),
    dict(type='PoseDecode'),
    dict(type='PoseCompact', hw_ratio=1., allow_imgpad=True),
    dict(type='GenSkeFeat', dataset='coco', feats=[modality]),
    dict(type='FormatGCNInput', num_person=2),
    dict(type='Collect', keys=['keypoint', 'label']),
]
val_pipeline = [
    dict(type='DecompressPose', squeeze=True),
    dict(type='UniformSampleFrames', clip_len=clip_len, num_clips=1,
         test_mode=True),
    dict(type='PoseDecode'),
    dict(type='PoseCompact', hw_ratio=1., allow_imgpad=True),
    dict(type='GenSkeFeat', dataset='coco', feats=[modality]),
    dict(type='FormatGCNInput', num_person=2),
    dict(type='Collect', keys=['keypoint', 'label']),
]
test_pipeline = [
    dict(type='DecompressPose', squeeze=True),
    dict(type='UniformSampleFrames', clip_len=clip_len, num_clips=10,
         test_mode=True),
    dict(type='PoseDecode'),
    dict(type='PoseCompact', hw_ratio=1., allow_imgpad=True),
    dict(type='GenSkeFeat', dataset='coco', feats=[modality]),
    dict(type='FormatGCNInput', num_person=2),
    dict(type='Collect', keys=['keypoint', 'label']),
]
data = dict(
    videos_per_gpu=32,
    workers_per_gpu=4,
    test_dataloader=dict(videos_per_gpu=32),
    train=dict(type=dataset_type, ann_file=ann_file, pipeline=train_pipeline,
               split='train', box_thr=box_thr, valid_ratio=valid_ratio),
    val=dict(type=dataset_type, ann_file=ann_file, pipeline=val_pipeline,
             split='val', box_thr=box_thr, valid_ratio=valid_ratio),
    test=dict(type=dataset_type, ann_file=ann_file, pipeline=test_pipeline,
              split='val', box_thr=box_thr, valid_ratio=valid_ratio))
total_epochs = 16
checkpoint_config = dict(interval=1)
"""

# (leaf dir, num_classes, ann_file, train split, val split, reference dir)
DSGCN_2D_SETS = [
    ("gym_hrnet", 99, "data/gym/gym_hrnet.pkl", "train", "val", "GYM_hrnet"),
    ("diving48_hrnet", 48, "data/diving48/diving48_hrnet.pkl", "train",
     "test", "Driving48_hrnet"),
    ("hmdb51_hrnet", 51, "data/hmdb51/hmdb51_hrnet.pkl", "train1", "test1",
     "HMDB51_hrnet"),
    ("ucf101_hrnet", 101, "data/ucf101/ucf101_hrnet.pkl", "train1", "test1",
     "ucf101_hrnet"),
]

STREAMS = ("j", "b", "jm", "bm")


def main():
    for fam, model_tpl in FAMILIES.items():
        fam_dir = os.path.join(ROOT, fam)
        os.makedirs(fam_dir, exist_ok=True)
        for ds, (ann, split, nc) in DATASETS.items():
            base_name = f"{fam.upper()}_{nc}_model.py"
            with open(os.path.join(fam_dir, base_name), "w") as f:
                f.write(model_tpl.format(nc=nc, layout="nturgb+d"))
            coco_base = f"{fam.upper()}_{nc}_coco_model.py"
            with open(os.path.join(fam_dir, coco_base), "w") as f:
                f.write(model_tpl.format(nc=nc, layout="coco"))
            hr_ann = HRNET_ANN[ds.split("_")[0]]
            for suffix, tpl, base, leaf_ann in (
                    ("3dkp", LEAF, base_name, ann),
                    ("hrnet", HRNET_LEAF, coco_base, hr_ann)):
                leaf_dir = os.path.join(fam_dir, f"{ds}_{suffix}")
                os.makedirs(leaf_dir, exist_ok=True)
                for mod in STREAMS:
                    with open(os.path.join(leaf_dir, f"{mod}.py"), "w") as f:
                        f.write(tpl.format(fam=fam, mod=mod, ds=ds,
                                           ann=leaf_ann, split=split,
                                           base=base))

    # ---- DS-GCN breadth ----------------------------------------------------
    dsgcn_dir = os.path.join(ROOT, "dsgcn")
    os.makedirs(dsgcn_dir, exist_ok=True)
    with open(os.path.join(dsgcn_dir, "DSGCN_120_model.py"), "w") as f:
        f.write(DSGCN_MODEL.format(layout="nturgb+d", nc=120))
    with open(os.path.join(dsgcn_dir, "DSGCN_coco_model.py"), "w") as f:
        f.write(DSGCN_MODEL.format(layout="coco", nc=60))
    for ds, (ann, split, nc) in DATASETS.items():
        if ds == "ntu60_xsub":
            continue   # committed by hand (configs/dsgcn/ntu60_xsub_3dkp)
        base = "DSGCN_model.py" if nc == 60 else "DSGCN_120_model.py"
        leaf_dir = os.path.join(dsgcn_dir, f"{ds}_3dkp")
        os.makedirs(leaf_dir, exist_ok=True)
        for mod in STREAMS:
            with open(os.path.join(leaf_dir, f"{mod}.py"), "w") as f:
                f.write(DSGCN_3D_LEAF.format(mod=mod, ds=ds, ann=ann,
                                             split=split, base=base))
    k4_dir = os.path.join(dsgcn_dir, "kinetics400_hrnet")
    os.makedirs(k4_dir, exist_ok=True)
    for mod in STREAMS:
        with open(os.path.join(k4_dir, f"{mod}.py"), "w") as f:
            f.write(DSGCN_K400_LEAF.format(mod=mod))
    for ds, nc, ann, tr, va, refdir in DSGCN_2D_SETS:
        leaf_dir = os.path.join(dsgcn_dir, ds)
        os.makedirs(leaf_dir, exist_ok=True)
        for mod in STREAMS:
            with open(os.path.join(leaf_dir, f"{mod}.py"), "w") as f:
                f.write(DSGCN_2D_LEAF.format(mod=mod, ds=ds, nc=nc, ann=ann,
                                             train_split=tr, val_split=va,
                                             refdir=refdir))
    print("config zoo generated")


if __name__ == "__main__":
    main()
