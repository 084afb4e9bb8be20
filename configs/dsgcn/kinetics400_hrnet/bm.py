# DS-GCN bm stream, kinetics400 hrnet-coco (reference
# configs/dsstgcn/kinetics400_hrnet/bm.py: compressed poses + box_thr /
# valid_ratio filtering, pose_dataset.py:101-124)
_base_ = ['../DSGCN_coco_model.py']
modality = 'bm'
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
