"""Model factories keyed by name, preserving the reference's
``--model {ban,san,cti}`` surface (``FFOE/main.py:112-113`` resolves
``build_%s`` by string; ``MC/main.py`` ditto).

The reference's MC ``--model san`` crash (``MC/main.py:30`` offers 'san' but
only ``build_stacked_attention`` exists) is deliberately fixed here: both
names resolve.
"""

from __future__ import annotations

from vqatpu.config import ModelConfig
from vqatpu.models.ffoe import BanModel, CTIModel, StackedAttentionModel
from vqatpu.models.mc import BanModelMC, StackedAttentionModelMC, TanModel

_FFOE = {
    "ban": BanModel,
    "san": StackedAttentionModel,
    "stacked_attention": StackedAttentionModel,
    "cti": CTIModel,
}

_MC = {
    "ban": BanModelMC,
    "san": StackedAttentionModelMC,
    "stacked_attention": StackedAttentionModelMC,
    "cti": TanModel,
    "tan": TanModel,
}


def build_model(cfg: ModelConfig):
    table = _MC if cfg.task == "mc" else _FFOE
    try:
        cls = table[cfg.model]
    except KeyError:
        raise ValueError(
            f"unknown model {cfg.model!r} for task {cfg.task!r}; "
            f"choices: {sorted(table)}"
        ) from None
    return cls(cfg)
