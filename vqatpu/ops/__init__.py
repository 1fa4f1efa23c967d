from vqatpu.ops.activation import get_activation, swish
from vqatpu.ops.attention import (
    BiAttention,
    StackedAttention,
    TriAttention,
    box_mask_from_features,
    masked_softmax,
)
from vqatpu.ops.bilinear import BCNet
from vqatpu.ops.classifier import SimpleClassifier
from vqatpu.ops.counter import Counter, PiecewiseLin
from vqatpu.ops.embedding import WordEmbedding
from vqatpu.ops.linear import FCNet, FCSTL, Linear, WNLinear
from vqatpu.ops.tensor import mode_product
from vqatpu.ops.losses import bce_with_logits_sum, distillation_loss
from vqatpu.ops.module import Ctx, MaskSource, dropout
from vqatpu.ops.rnn import QuestionEmbedding
from vqatpu.ops.trilinear import TCNet

__all__ = [
    "BCNet", "BiAttention", "Counter", "Ctx", "FCNet", "FCSTL", "Linear",
    "MaskSource",
    "mode_product",
    "PiecewiseLin", "QuestionEmbedding", "SimpleClassifier",
    "StackedAttention", "TCNet", "TriAttention", "WNLinear", "WordEmbedding",
    "bce_with_logits_sum", "box_mask_from_features", "distillation_loss",
    "dropout", "get_activation", "masked_softmax", "swish",
]
