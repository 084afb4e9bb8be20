# PoseC3D SlowOnly-R50, NTU60 x-sub (pyskl posec3d practice; heatmap pathway)
model = dict(
    type='RecognizerPoseC3D',
    backbone=dict(type='ResNet3dSlowOnly', depth=50, in_channels=17,
                  base_channels=32, num_stages=3, stage_blocks=[4, 6, 3],
                  conv1_stride=[1, 1], pool1_stride=[1, 1], inflate=[0, 1, 1],
                  spatial_strides=[2, 2, 2], temporal_strides=[1, 1, 2]),
    num_classes=60)
dataset_type = 'PoseDataset'
ann_file = 'data/nturgbd/ntu60_hrnet.pkl'
train_pipeline = [
    dict(type='UniformSampleFrames', clip_len=48),
    dict(type='PoseDecode'),
    dict(type='PoseCompact', hw_ratio=1.0, allow_imgpad=True),
    dict(type='Resize', scale=(-1, 64)),
    dict(type='RandomResizedCrop', area_range=(0.56, 1.0)),
    dict(type='Resize', scale=(56, 56), keep_ratio=False),
    dict(type='Flip', flip_ratio=0.5),
    dict(type='GeneratePoseTarget', sigma=0.6, use_score=True),
    dict(type='FormatHeatmapInput'),
    dict(type='Collect', keys=['imgs', 'label']),
]
test_pipeline = [
    dict(type='UniformSampleFrames', clip_len=48, num_clips=10, test_mode=True),
    dict(type='PoseDecode'),
    dict(type='PoseCompact', hw_ratio=1.0, allow_imgpad=True),
    dict(type='Resize', scale=(64, 64), keep_ratio=False),
    dict(type='CenterCrop', crop_size=64),
    dict(type='GeneratePoseTarget', sigma=0.6, use_score=True),
    dict(type='FormatHeatmapInput'),
    dict(type='Collect', keys=['imgs', 'label']),
]
data = dict(
    videos_per_gpu=32,
    workers_per_gpu=8,
    train=dict(type=dataset_type, ann_file=ann_file, pipeline=train_pipeline,
               split='xsub_train'),
    val=dict(type=dataset_type, ann_file=ann_file, pipeline=test_pipeline,
             split='xsub_val'),
    test=dict(type=dataset_type, ann_file=ann_file, pipeline=test_pipeline,
              split='xsub_val'))
optimizer = dict(type='SGD', lr=0.2, momentum=0.9, weight_decay=0.0003,
                 nesterov=True)
total_epochs = 24
