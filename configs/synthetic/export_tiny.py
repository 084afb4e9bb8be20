# Tiny STGCN config for the export-CLI test: 3 stages, 12-frame clips —
# compiles in seconds on CPU while exercising the full config->export path.
model = dict(
    type='RecognizerGCN',
    backbone=dict(
        type='STGCN', num_stages=3,
        graph_cfg=dict(layout='nturgb+d', mode='stgcn_spatial')),
    cls_head=dict(type='GCNHead', num_classes=5, in_channels=64))
val_pipeline = [
    dict(type='PreNormalize3D', align_spine=False),
    dict(type='GenSkeFeat', feats=['j']),
    dict(type='UniformSample', clip_len=12, num_clips=2, test_mode=True),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput'),
    dict(type='Collect', keys=['keypoint', 'label']),
]
data = dict(
    videos_per_gpu=2,
    test=dict(type='PoseDataset', ann_file='data/synth.pkl',
              pipeline=val_pipeline, split='val'))
