# CTR-GCN (plain unit_ctrgcn + CTR-MSTCN — upstream form;
# committed reference CTRGCN_model.py switched to unit_ctrhgcn+msmlp,
# SURVEY §0.2)
_base_ = ['../_init_/schedule.py']
model = dict(
    type='RecognizerGCN',
    backbone=dict(
        type='CTRGCN',
        gcn_type='unit_ctrgcn',
        graph_cfg=dict(layout='coco', mode='spatial')),
    cls_head=dict(type='GCNHead', num_classes=60, in_channels=256))
