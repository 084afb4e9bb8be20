# DS-GCN bm stream, diving48_hrnet hrnet-coco (reference
# configs/dsstgcn/Driving48_hrnet/bm.py; split names corrected — see
# tools/gen_config_zoo.py)
_base_ = ['../DSGCN_coco_model.py']
modality = 'bm'
clip_len = 100
model = dict(cls_head=dict(num_classes=48))
dataset_type = 'PoseDataset'
ann_file = 'data/diving48/diving48_hrnet.pkl'
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
                            pipeline=train_pipeline, split='train')),
    val=dict(type=dataset_type, ann_file=ann_file, pipeline=val_pipeline,
             split='test'),
    test=dict(type=dataset_type, ann_file=ann_file, pipeline=test_pipeline,
              split='test'))
total_epochs = 16
checkpoint_config = dict(interval=1)
