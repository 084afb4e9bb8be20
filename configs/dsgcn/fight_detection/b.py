# DS-GCN b stream, fight detection (2-class k400-hrnet-style variant;
# reference configs/dsstgcn/fight_detection/j.py: num_classes=2,
# FormatGCNInput num_person=5, box_thr=0.5, valid_ratio=None, coco graph.
# Reference quirk not replicated: its b/jm/bm leaves are stale k400
# copies — 400 classes, num_person=2, k400 ann_file — so all four streams
# here carry the j.py fight semantics).
_base_ = ['../DSGCN_coco_model.py']
modality = 'b'
clip_len = 100
model = dict(cls_head=dict(num_classes=2))
dataset_type = 'PoseDataset'
ann_file = 'data/fight_detection/fight_k400_merge.pkl'
box_thr = 0.5
valid_ratio = None
train_pipeline = [
    dict(type='DecompressPose', squeeze=True),
    dict(type='UniformSampleFrames', clip_len=clip_len),
    dict(type='PoseDecode'),
    dict(type='PoseCompact', hw_ratio=1., allow_imgpad=True),
    dict(type='GenSkeFeat', dataset='coco', feats=[modality]),
    dict(type='FormatGCNInput', num_person=5),
    dict(type='Collect', keys=['keypoint', 'label']),
]
val_pipeline = [
    dict(type='DecompressPose', squeeze=True),
    dict(type='UniformSampleFrames', clip_len=clip_len, num_clips=1,
         test_mode=True),
    dict(type='PoseDecode'),
    dict(type='PoseCompact', hw_ratio=1., allow_imgpad=True),
    dict(type='GenSkeFeat', dataset='coco', feats=[modality]),
    dict(type='FormatGCNInput', num_person=5),
    dict(type='Collect', keys=['keypoint', 'label']),
]
test_pipeline = [
    dict(type='DecompressPose', squeeze=True),
    dict(type='UniformSampleFrames', clip_len=clip_len, num_clips=10,
         test_mode=True),
    dict(type='PoseDecode'),
    dict(type='PoseCompact', hw_ratio=1., allow_imgpad=True),
    dict(type='GenSkeFeat', dataset='coco', feats=[modality]),
    dict(type='FormatGCNInput', num_person=5),
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
