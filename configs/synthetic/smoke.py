# Synthetic smoke config: runnable anywhere; generate data first with
#   python tools/data/make_synthetic.py data/synth.pkl
model = dict(
    type='RecognizerGCN',
    backbone=dict(
        type='DGSTGCN',
        gcn_type='dgphgcn1', gcn_ratio=0.125,
        gcn_node_attention=True, gcn_edge_attention=True,
        gcn_decompose=True, gcn_subset_wise=True,
        gcn_ctr='T', gcn_ada='T', tcn_type='dgmstcn',
        graph_cfg=dict(layout='nturgb+d', mode='random', num_filter=3,
                       init_off=.04, init_std=.02, seed=0)),
    cls_head=dict(type='GCNHead', num_classes=10, in_channels=256))
_p = [
    dict(type='PreNormalize3D', align_spine=False),
    dict(type='GenSkeFeat', feats=['j']),
    dict(type='UniformSample', clip_len=24),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput'),
    dict(type='Collect', keys=['keypoint', 'label']),
]
train_pipeline = [_p[0], dict(type='RandomRot', theta=0.2)] + _p[1:]
val_pipeline = [
    dict(type='PreNormalize3D', align_spine=False),
    dict(type='GenSkeFeat', feats=['j']),
    dict(type='UniformSample', clip_len=24, num_clips=2, test_mode=True),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput'),
    dict(type='Collect', keys=['keypoint', 'label']),
]
data = dict(
    videos_per_gpu=2,   # per-device; x local devices = host batch
    workers_per_gpu=4,
    train=dict(type='PoseDataset', ann_file='data/synth.pkl',
               pipeline=train_pipeline, split='train'),
    val=dict(type='PoseDataset', ann_file='data/synth.pkl',
             pipeline=val_pipeline, split='val'),
    test=dict(type='PoseDataset', ann_file='data/synth.pkl',
              pipeline=val_pipeline, split='val'))
optimizer = dict(lr=0.05, momentum=0.9, weight_decay=0.0005)
total_epochs = 3
checkpoint_config = dict(interval=1)
evaluation = dict(interval=1, metrics=['top_k_accuracy'])
