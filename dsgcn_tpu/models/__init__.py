from .builder import build_model, build_backbone, build_head, build_named_model, model_cfg  # noqa
from .recognizer import RecognizerGCN, average_clip  # noqa
from .heads import GCNHead  # noqa
