# Tiny STGCN config for the export-CLI tests: 3 stages, 12-frame clips —
# compiles in seconds on CPU while exercising the full config->train->export
# path.  Generate data first: python tools/data/make_synthetic.py data/synth.pkl
model = dict(
    type='RecognizerGCN',
    backbone=dict(
        type='STGCN', num_stages=3,
        graph_cfg=dict(layout='nturgb+d', mode='stgcn_spatial')),
    cls_head=dict(type='GCNHead', num_classes=10, in_channels=64))
train_pipeline = [
    dict(type='PreNormalize3D', align_spine=False),
    dict(type='GenSkeFeat', feats=['j']),
    dict(type='UniformSample', clip_len=12),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput'),
    dict(type='Collect', keys=['keypoint', 'label']),
]
val_pipeline = [
    dict(type='PreNormalize3D', align_spine=False),
    dict(type='GenSkeFeat', feats=['j']),
    dict(type='UniformSample', clip_len=12, num_clips=2, test_mode=True),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput'),
    dict(type='Collect', keys=['keypoint', 'label']),
]
data = dict(
    videos_per_gpu=4,
    workers_per_gpu=0,
    train=dict(type='PoseDataset', ann_file='data/synth.pkl',
               pipeline=train_pipeline, split='train'),
    val=dict(type='PoseDataset', ann_file='data/synth.pkl',
             pipeline=val_pipeline, split='val'),
    test=dict(type='PoseDataset', ann_file='data/synth.pkl',
              pipeline=val_pipeline, split='val'))
optimizer = dict(lr=0.05, momentum=0.9, weight_decay=0.0005)
total_epochs = 1
checkpoint_config = dict(interval=1)
evaluation = dict(interval=1, metrics=['top_k_accuracy'])
