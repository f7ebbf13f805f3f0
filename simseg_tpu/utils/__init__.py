from simseg_tpu.utils.collections import AttrDict
from simseg_tpu.utils.logger import logger
from simseg_tpu.utils.registry import Registry, build_from_cfg
from simseg_tpu.utils.metrics import (
    intersect_and_union,
    mean_iou,
    miou_from_totals,
    topk_accuracy,
)
from simseg_tpu.utils.prompts import IMAGENET_TEMPLATES, openai_imagenet_template

__all__ = [
    "AttrDict",
    "logger",
    "Registry",
    "build_from_cfg",
    "intersect_and_union",
    "mean_iou",
    "miou_from_totals",
    "topk_accuracy",
    "IMAGENET_TEMPLATES",
    "openai_imagenet_template",
]
