# DS-GCN model (reference configs/dsstgcn/DSSTGCN_model.py)
_base_ = ['../_init_/schedule.py']
graph = 'coco'
model = dict(
    type='RecognizerGCN',
    backbone=dict(
        type='DGSTGCN',
        gcn_type='dgphgcn1',
        gcn_ratio=0.125,
        gcn_node_attention=True,
        gcn_edge_attention=True,
        gcn_decompose=True,
        gcn_subset_wise=True,
        gcn_ctr='T',
        gcn_ada='T',
        tcn_type='dgmstcn',
        graph_cfg=dict(layout=graph, mode='random', num_filter=3,
                       init_off=.04, init_std=.02, seed=0),
        tcn_ms_cfg=[(3, 1), (3, 2), (3, 3), (3, 4), ('max', 3), '1x1']),
    cls_head=dict(type='GCNHead', num_classes=60, in_channels=256))
