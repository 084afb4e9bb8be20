# AAGCN (plain unit_aagcn — upstream form; committed reference
# AAGCN_model.py switched to unit_aahgcn+unitmlp experiments, SURVEY §0.2)
_base_ = ['../_init_/schedule.py']
model = dict(
    type='RecognizerGCN',
    backbone=dict(
        type='AAGCN',
        graph_cfg=dict(layout='coco', mode='spatial')),
    cls_head=dict(type='GCNHead', num_classes=120, in_channels=256))
