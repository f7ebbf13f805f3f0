from simseg_tpu.ops.attention import multi_head_attention, padding_bias
from simseg_tpu.ops.pooling import avg_pool, l2_normalize, topk_pool

__all__ = [
    "multi_head_attention",
    "padding_bias",
    "avg_pool",
    "l2_normalize",
    "topk_pool",
]
