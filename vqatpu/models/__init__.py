from vqatpu.models.ffoe import BanModel, CTIModel, StackedAttentionModel
from vqatpu.models.mc import BanModelMC, StackedAttentionModelMC, TanModel
from vqatpu.models.registry import build_model

__all__ = [
    "BanModel", "BanModelMC", "CTIModel", "StackedAttentionModel",
    "StackedAttentionModelMC", "TanModel", "build_model",
]
