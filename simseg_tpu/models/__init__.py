from simseg_tpu.models.bert import BERT_CONFIGS, BertEncoder, build_bert
from simseg_tpu.models.clip import CLIPModel, PIPELINE, build_clip_model
from simseg_tpu.models.projection import ComplexProjection, SimpleProjection
from simseg_tpu.models.resnet import RESNET_CONFIGS, ResNet, build_resnet
from simseg_tpu.models.vit import VIT_CONFIGS, VisionTransformer, build_vit

__all__ = [
    "BERT_CONFIGS",
    "BertEncoder",
    "build_bert",
    "CLIPModel",
    "PIPELINE",
    "build_clip_model",
    "ComplexProjection",
    "SimpleProjection",
    "RESNET_CONFIGS",
    "ResNet",
    "build_resnet",
    "VIT_CONFIGS",
    "VisionTransformer",
    "build_vit",
]
