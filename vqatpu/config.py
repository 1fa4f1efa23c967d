"""Typed configuration replacing the reference's four duplicated argparse
blocks (``FFOE/main.py:21-79``, ``MC/main.py:21-76``, both ``test.py``).

Defaults are frozen from SURVEY.md §2.6 (the reference CLI defaults that
produced the published numbers)."""

from __future__ import annotations

import dataclasses
from typing import Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    # dataset-derived
    ntoken: int
    v_dim: int
    num_ans_candidates: int
    # shared (FFOE/main.py:25-53)
    model: str = "ban"  # ban | san | cti
    num_hid: int = 1024
    op: str = "c"  # 'c' => concat frozen GloVe copy (600-d words)
    gamma: int = 2  # glimpses
    activation: str = "relu"
    dropout: float = 0.5
    # GRU stack depth.  The reference's QuestionEmbedding signature allows
    # nlayers (language_model.py:51-66) though every builder passes 1 —
    # exposed here as --num_layers; torch-oracle tested for 2-layer stacks.
    num_layers: int = 1
    use_counter: bool = False
    objects: int = 10  # counter top-k (FFOE/base_model.py:149)
    num_stacks: int = 2  # SAN
    # CTI (FFOE/main.py:60-64)
    h_mm: int = 512
    h_out: int = 1
    rank: int = 32
    k: int = 1
    # MC pipeline emits 2-way match/non-match logits (MC/base_model.py:177)
    task: str = "ffoe"  # ffoe | mc
    # "xla" | "pallas": fused-kernel path for the trilinear hot ops
    kernel_backend: str = "xla"
    # > 0 enables blockwise (flash-style) trilinear attention+pooling over
    # V blocks of this size when the box count exceeds it — the stretch
    # regime for thousands of regions (vqatpu/kernels/blockwise.py).
    # Attention maps are not materialized (apply returns att=None).
    v_block_size: int = 0
    # fuse the three v-side tucker projections (t_att + one per glimpse,
    # all reading the same [B, V, v_dim] features) into ONE GEMM with a
    # shared dropout mask on v.  Eval-mode math is bit-identical to the
    # unfused path; in train mode the three branches see the SAME dropout
    # draw instead of three independent ones.  Measured (v5e tunnel, B=256,
    # V=50, same-process A/B): 17.96 vs 17.98 ms/step — XLA already overlaps
    # the three GEMMs well at reference shapes, so the default keeps the
    # reference's independent-mask semantics; the knob remains for large-V
    # regimes where re-reading v dominates.  Ignored under remat_glimpse
    # (fusing would force storing the tucker activations remat avoids).
    # Incompatible with a tensor-parallel model axis: param_shardings shards
    # only the t_net tuckers, so fusing them with the replicated t_att
    # tucker would force an all-gather every step (guarded where TP is
    # enabled: train() and dryrun_multichip).
    fused_v_tucker: bool = False
    # rematerialize the per-glimpse joint-embedding computation under
    # jax.checkpoint: trades ~1 extra forward of the t_net tuckers for not
    # storing their [B, V, D] activations — the dominant temp memory at
    # large V (measured: 7.9 -> ~4 GB at B=64, V=2048).
    remat_glimpse: bool = False

    @property
    def word_dim(self) -> int:
        return 600 if "c" in self.op else 300

    @property
    def num_classes(self) -> int:
        return 2 if self.task == "mc" else self.num_ans_candidates


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    # FFOE/main.py:25-53 defaults
    epochs: int = 13
    batch_size: int = 256
    lr: float = 1e-3
    clip_norm: float = 0.25
    update_freq: int = 4
    seed: int = 1204
    saving_epoch: int = 9  # 0 for MC (MC/train.py:29)
    # LR schedule (FFOE/train.py:26-31)
    warmup_factors: Tuple[float, ...] = (0.5, 1.0, 1.5, 2.0)
    lr_decay_start: int = 10
    lr_decay_end: int = 20
    lr_decay_step: int = 2
    lr_decay_rate: float = 0.25
    # distillation (README.md:49-58)
    distillation: bool = False
    T: float = 1.5
    alpha: float = 0.2
    # TPU-side knobs (no reference analogue)
    compute_dtype: str = "float32"  # or "bfloat16"
    data_axis: str = "data"
    # PRNG for dropout masks: "rbg" (XLA RngBitGenerator, the TPU hardware
    # RNG; measured ~2.5 ms/step faster than threefry at CTI reference
    # shapes) or "threefry" (jax default).  Either is deterministic per key;
    # mask *streams* differ between the two (as they do vs the reference's
    # torch RNG either way).
    rng_impl: str = "rbg"
    # Adamax m/u storage dtype: "bfloat16" halves the optimizer's HBM
    # traffic (the measured update floor, PROFILE.md); update math stays
    # f32.  Default f32 = exact torch-Adamax trajectories.
    optim_state_dtype: str = "float32"
    # 32 = exact torch bernoulli(keep) semantics; 16 = threshold uint16 bits
    # (half the RNG bits; keep-prob quantized to 1/65536 with the inverted
    # scale using the exact realized probability — unbiased)
    mask_bits: int = 32
    # Regenerate dropout masks from the saved PRNG key in backward (custom
    # VJP) instead of keeping ~95M realized mask elements alive as AD
    # residuals.  Bit-identical either way (tests/test_ops_linear.py);
    # measured a wash on time AND temp memory at CTI reference shapes
    # (scripts/ab_dropout_replay.py) — kept off, knob for large-V regimes.
    mask_replay: bool = False
    ckpt_backend: str = "pickle"  # or "orbax" (multi-host/sharded restore)
    # True disables dropout inside the train step (the only train/eval
    # behavioral difference in these models).  Used by the reference
    # trajectory-parity tests, where torch/jax RNG streams can never align,
    # and for debugging; no reference analogue.
    deterministic: bool = False
    # Skip the optimizer update when the microbatch loss is non-finite —
    # the on-device analog of the reference's OverflowError zero-grad
    # recovery (trainer.py:141-143), without a host round-trip.  The
    # skipped step reports metrics["skipped"]=1.  Default off: exact
    # reference semantics propagate whatever the math produces.
    skip_nonfinite: bool = False
    # Host->device wire dtype for the big per-batch feature tensors (v, b):
    # "float16"/"bfloat16" halves the H2D bytes (~100 MB/batch of v at
    # B=256/V=50/2048-d; the dominant end-to-end term on transfer-bound
    # hosts — measured for serving in PROFILE.md).  The step upcasts on
    # device before compute, so only the input quantization differs.
    # Default f32 = exact reference trajectories.
    transfer_dtype: str = "float32"
    # Device-resident feature store (data/device_store.py): upload the
    # whole store to HBM once and gather v/b/v_mask by index ON DEVICE —
    # the per-batch wire carries ~50 KB of row indices instead of the
    # ~100 MB (f32) feature slab.  Batches are bit-identical to the wire
    # path for every transfer_dtype, so trajectories don't change.
    # Tri-state: "auto" (default — build when the dataset is capable AND
    # estimate_hbm_bytes fits hbm_budget_bytes), "on" (force; declines
    # loudly when impossible), "off".  Bools accepted (True->on,
    # False->off).  Falls back loudly when the dataset can't be uploaded
    # (streaming store) or under multi-process training.
    device_features: str = "auto"
    # Row-shard the HBM tables across the mesh's data axis for stores
    # bigger than one chip's HBM (gather via all-gather(indices) +
    # psum_scatter over ICI; values still bit-equal — see
    # DeviceFeatureStore._make_sharded_gather).  Implies device_features.
    shard_feature_store: bool = False
    # With device_features: ship targets sparse (t_label/t_score pairs,
    # <=10 nonzeros per VQA sample) instead of the dense [B, n_ans] f32
    # slab — the step densifies on device via a one-hot matmul,
    # bit-identically (steps.densify_target).  Measured a WASH on the
    # bench host (scripts/ab_devstore.py: 16.8 vs 19.5 ms/batch best,
    # dense wins 4/6 interleaved reps — the dense target wire hides
    # behind dispatch overlap while the densify adds step work), so
    # default OFF; try it where the wire is genuinely unhidden (slow
    # links, much larger answer vocabularies).
    sparse_targets: bool = False
