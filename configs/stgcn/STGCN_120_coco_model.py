# ST-GCN (plain unit_gcn + unit_tcn, stgcn_spatial partition —
# the original upstream form; the committed reference STGCN_model.py was
# repurposed, SURVEY §0.2)
_base_ = ['../_init_/schedule.py']
model = dict(
    type='RecognizerGCN',
    backbone=dict(
        type='STGCN',
        graph_cfg=dict(layout='coco', mode='stgcn_spatial')),
    cls_head=dict(type='GCNHead', num_classes=120, in_channels=256))
