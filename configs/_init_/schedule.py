# Base schedule: pyskl practice (reference configs/_init_/lr_schedual.py)
optimizer = dict(type='SGD', lr=0.1, momentum=0.9, weight_decay=0.0005,
                 nesterov=True)
optimizer_config = dict(grad_clip=None)
lr_config = dict(policy='CosineAnnealing', min_lr=0, by_epoch=False)
total_epochs = 150
checkpoint_config = dict(interval=5)
evaluation = dict(interval=1, metrics=['top_k_accuracy', 'mean_class_accuracy'])
log_config = dict(interval=20)
