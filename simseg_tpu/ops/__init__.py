from simseg_tpu.ops.attention import multi_head_attention, padding_bias
from simseg_tpu.ops.crf import (dense_crf_batched, dense_crf_batched_du,
                                dense_crf_binary)
from simseg_tpu.ops.grad_rev import grad_reverse
from simseg_tpu.ops.interpolate_pe import bicubic_resize_2d, interpolate_pos_embed
from simseg_tpu.ops.losses import (
    info_nce,
    label_smoothing_ce,
    mixup_nce,
    mse_embedding_loss,
    soft_target_ce,
    symmetric_info_nce,
    triplet_loss,
)
from simseg_tpu.ops.morphology import closing, dilate, erode, nearest_upsample
from simseg_tpu.ops.pooling import avg_pool, l2_normalize, topk_pool
from simseg_tpu.ops.seg_decode import make_seg_decode_fn
from simseg_tpu.ops.tome import bipartite_merge, unmerge, update_gather_map

__all__ = [
    "multi_head_attention",
    "padding_bias",
    "dense_crf_batched",
    "dense_crf_batched_du",
    "dense_crf_binary",
    "grad_reverse",
    "bicubic_resize_2d",
    "interpolate_pos_embed",
    "info_nce",
    "label_smoothing_ce",
    "mixup_nce",
    "mse_embedding_loss",
    "soft_target_ce",
    "symmetric_info_nce",
    "triplet_loss",
    "closing",
    "dilate",
    "erode",
    "nearest_upsample",
    "avg_pool",
    "l2_normalize",
    "topk_pool",
    "make_seg_decode_fn",
    "bipartite_merge",
    "unmerge",
    "update_gather_map",
]
