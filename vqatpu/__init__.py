"""vqatpu — a TPU-native JAX/XLA/Pallas framework for Compact Trilinear
Interaction VQA (capabilities of aioz-ai/ICCV19_VQA-CTI, rebuilt TPU-first).

Layer map (mirrors SURVEY.md §1, re-architected for TPU):

- ``vqatpu.ops``      — pure-functional neural ops (weight-norm MLPs, GRU/LSTM,
                        bilinear/trilinear interaction, counting, attention).
- ``vqatpu.kernels``  — Pallas TPU kernels for the hot contractions, with
                        XLA-einsum fallbacks (flag-switchable).
- ``vqatpu.models``   — BAN / SAN / CTI model assembly for the FFOE
                        (free-form open-ended) and MC (multiple-choice)
                        pipelines, factories keyed by name.
- ``vqatpu.data``     — dictionary/tokenizer, HDF5 feature ingestion
                        (adaptive ``pos_boxes`` layout), static-shape
                        batching, tf-idf GloVe embedding init.
- ``vqatpu.train``    — jitted train/eval steps, Adamax + flat-grad global
                        norm clip, warmup/decay LR schedule, distillation
                        loss, checkpointing, metrics.
- ``vqatpu.eval``     — EvalAI JSON export, teacher-logit dump, TDIUC
                        mean-per-type metrics, MC scoring.
- ``vqatpu.cli``      — entry points preserving the reference's CLI surface.
- ``vqatpu.parallel.sharding`` — device-mesh construction and data-parallel layout.
"""

__version__ = "0.1.0"

from vqatpu.config import ModelConfig, TrainConfig  # noqa: E402


def __getattr__(name):
    """Lazy top-level conveniences (avoid importing jax-heavy modules at
    package import)."""
    if name == "build_model":
        from vqatpu.models import build_model
        return build_model
    if name == "InferenceSession":
        from vqatpu.serve import InferenceSession
        return InferenceSession
    raise AttributeError(name)
