"""Learning sanity: the full training stack actually learns — train score
climbs well above chance when overfitting a tiny fixture."""

import numpy as np

import jax

from vqatpu.config import TrainConfig
from vqatpu.data import BatchLoader, VQAFeatureDataset
from vqatpu.data.synthetic import make_vqa_fixture
from vqatpu.eval import evaluate
from vqatpu.models import build_model
from vqatpu.train.loop import train
from tests.test_end_to_end import small_cfg


def test_ban_overfits_tiny_dataset(tmp_path):
    root = str(tmp_path / "data")
    d = make_vqa_fixture(root, n_train=32, n_val=32, n_images=8, v_dim=16,
                         seed=3)
    train_ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=12)

    cfg = TrainConfig(epochs=18, batch_size=8, update_freq=1, saving_epoch=99,
                      lr=2e-3)
    model = build_model(small_cfg(train_ds, "ban"))
    state = train(model, train_ds, None, cfg, str(tmp_path / "out"),
                  use_mesh=False, print_interval=10**9)

    score, bound = evaluate(model, state.params, BatchLoader(train_ds, 8))
    # soft-score upper bound is ~0.9 avg; chance is ~1/12. Overfitting 32
    # examples for 18 epochs must reach well over half the upper bound.
    assert bound > 0.5
    assert score > 0.5 * bound, (score, bound)


def test_ban_counter_overfits_in_bfloat16(tmp_path):
    """BAN is the GEMM-bound family where bf16 buys −27% step time
    (PROFILE.md r3, scripts/ab_ban_dtype.py) — prove the recommended
    deployment knob still learns through BAN's trickiest numerics
    (counter IoU graph + PiecewiseLin) with bf16 activations."""
    root = str(tmp_path / "data")
    d = make_vqa_fixture(root, n_train=32, n_val=32, n_images=8, v_dim=16,
                         seed=7)
    train_ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=12)

    cfg = TrainConfig(epochs=18, batch_size=8, update_freq=1, saving_epoch=99,
                      lr=2e-3, compute_dtype="bfloat16")
    model = build_model(small_cfg(train_ds, "ban", use_counter=True))
    state = train(model, train_ds, None, cfg, str(tmp_path / "out"),
                  use_mesh=False, print_interval=10**9)

    score, bound = evaluate(model, state.params, BatchLoader(train_ds, 8))
    assert bound > 0.5
    assert score > 0.5 * bound, (score, bound)


def test_cti_overfits_in_bfloat16(tmp_path):
    """bf16 activations (compute_dtype knob) still learn: CTI overfits the
    tiny fixture with bf16 forward/backward and f32 master params/loss —
    the evidence behind offering bf16 as the throughput mode (measured ~25%
    faster per step on v5e at reference shapes)."""
    root = str(tmp_path / "data")
    d = make_vqa_fixture(root, n_train=32, n_val=32, n_images=8, v_dim=16,
                         seed=5)
    train_ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=12)

    cfg = TrainConfig(epochs=18, batch_size=8, update_freq=1, saving_epoch=99,
                      lr=2e-3, compute_dtype="bfloat16")
    model = build_model(small_cfg(train_ds, "cti"))
    state = train(model, train_ds, None, cfg, str(tmp_path / "out"),
                  use_mesh=False, print_interval=10**9)

    score, bound = evaluate(model, state.params, BatchLoader(train_ds, 8))
    assert bound > 0.5
    assert score > 0.5 * bound, (score, bound)


def test_cti_overfits_with_bf16_optimizer_state(tmp_path):
    """optim_state_dtype=bfloat16 (half the Adamax HBM traffic) still
    learns: m/u are stored bf16, update math stays f32."""
    import jax
    import jax.numpy as jnp

    root = str(tmp_path / "data")
    d = make_vqa_fixture(root, n_train=32, n_val=32, n_images=8, v_dim=16,
                         seed=5)
    train_ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=12)

    cfg = TrainConfig(epochs=18, batch_size=8, update_freq=1, saving_epoch=99,
                      lr=2e-3, optim_state_dtype="bfloat16")
    model = build_model(small_cfg(train_ds, "cti"))
    state = train(model, train_ds, None, cfg, str(tmp_path / "out"),
                  use_mesh=False, print_interval=10**9)

    # the carried moments really are bf16
    inner = state.opt_state.inner_state[0]
    m_leaf = jax.tree.leaves(inner.inner_state.m
                             if hasattr(inner, "inner_state") else inner.m)[0]
    assert m_leaf.dtype == jnp.bfloat16

    score, bound = evaluate(model, state.params, BatchLoader(train_ds, 8))
    assert bound > 0.5
    assert score > 0.5 * bound, (score, bound)


def test_cti_overfits_all_io_knobs_on(tmp_path):
    """Knob-interaction sweep: streaming feature store (in_memory=False ->
    PrefetchLoader fallback) + f16 wire tensors + bf16 activations together
    still learn — the full low-RAM/transfer-bound deployment recipe."""
    root = str(tmp_path / "data")
    d = make_vqa_fixture(root, n_train=32, n_val=32, n_images=8, v_dim=16,
                         seed=5)
    train_ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=12,
                                 features_in_memory=False)
    assert not train_ds.store.in_memory

    cfg = TrainConfig(epochs=18, batch_size=8, update_freq=1, saving_epoch=99,
                      lr=2e-3, compute_dtype="bfloat16",
                      transfer_dtype="float16")
    model = build_model(small_cfg(train_ds, "cti"))
    state = train(model, train_ds, None, cfg, str(tmp_path / "out"),
                  use_mesh=False, print_interval=10**9)

    score, bound = evaluate(model, state.params, BatchLoader(train_ds, 8),
                            transfer_dtype="float16")
    assert bound > 0.5
    assert score > 0.5 * bound, (score, bound)


def test_cti_overfits_through_int8_wire(tmp_path):
    """transfer_dtype=int8 (4x H2D byte cut) still learns: per-box
    symmetric feature quantization on the wire, f32 compute after the
    device-side dequant — the evidence behind offering int8 as the
    transfer-bound-host knob (PROFILE.md r3)."""
    root = str(tmp_path / "data")
    d = make_vqa_fixture(root, n_train=32, n_val=32, n_images=8, v_dim=16,
                         seed=5)
    train_ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=12)

    cfg = TrainConfig(epochs=18, batch_size=8, update_freq=1, saving_epoch=99,
                      lr=2e-3, transfer_dtype="int8")
    model = build_model(small_cfg(train_ds, "cti"))
    state = train(model, train_ds, None, cfg, str(tmp_path / "out"),
                  use_mesh=False, print_interval=10**9)

    score, bound = evaluate(model, state.params, BatchLoader(train_ds, 8))
    assert bound > 0.5
    assert score > 0.5 * bound, (score, bound)
