from vqatpu.kernels.trilinear import (
    attention_logits_xla,
    masked_softmax_vqa_pallas,
    masked_softmax_vqa_xla,
    trilinear_attention,
    trilinear_attention_xla,
    trilinear_pool,
    trilinear_pool_pallas,
    trilinear_pool_xla,
)

__all__ = [
    "attention_logits_xla", "masked_softmax_vqa_pallas",
    "masked_softmax_vqa_xla", "trilinear_attention",
    "trilinear_attention_xla", "trilinear_pool", "trilinear_pool_pallas",
    "trilinear_pool_xla",
]
