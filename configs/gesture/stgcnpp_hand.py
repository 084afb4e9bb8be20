# STGCN++ on MediaPipe hand skeletons, 40 gestures
# (reference demo/stgcnpp_gesture.py:1-40; the reference config is unusable
# as committed — its own Graph lacks layout 'handmp' (graph.py:97-147) and
# its PreNormalize2D rejects threshold/mode — both realized here).
graph = 'handmp'
modality = 'j'

model = dict(
    type='RecognizerGCN',
    backbone=dict(
        type='STGCN',
        in_channels=2,
        gcn_adaptive='init',
        gcn_with_res=True,
        tcn_type='mstcn',
        num_stages=6,
        down_stages=[6],
        inflate_stages=[6],
        graph_cfg=dict(layout=graph, mode='spatial')),
    cls_head=dict(type='GCNHead', num_classes=40, in_channels=128))

train_pipeline = [
    dict(type='PreNormalize2D', threshold=0, mode='auto'),
    dict(type='GenSkeFeat', dataset=graph, feats=[modality]),
    dict(type='UniformSample', clip_len=10),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput', num_person=1),
    dict(type='Collect', keys=['keypoint', 'label']),
]
test_pipeline = [
    dict(type='PreNormalize2D', threshold=0, mode='auto'),
    dict(type='GenSkeFeat', dataset=graph, feats=[modality]),
    dict(type='UniformSample', clip_len=10, num_clips=1, test_mode=True),
    dict(type='PoseDecode'),
    dict(type='FormatGCNInput', num_person=1),
    dict(type='Collect', keys=['keypoint', 'label']),
]

dataset_type = 'GestureDataset'
ann_file = 'data/gesture/hagrid_jester.pkl'
data = dict(
    videos_per_gpu=64,
    workers_per_gpu=2,
    test_dataloader=dict(videos_per_gpu=64),
    train=dict(type=dataset_type, ann_file=ann_file,
               pipeline=train_pipeline, split='train+val'),
    test=dict(type=dataset_type, ann_file=ann_file,
              pipeline=test_pipeline, split='test'))

optimizer = dict(type='SGD', lr=0.1, momentum=0.9, weight_decay=0.0005,
                 nesterov=True)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='CosineAnnealing', min_lr=0)
total_epochs = 24
checkpoint_config = dict(interval=1)
evaluation = dict(interval=1, metrics=['top_k_accuracy'])
work_dir = './work_dirs/gesture/stgcnpp_hand'
