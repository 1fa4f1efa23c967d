"""Training engine: Adamax parity vs torch, clip, LR schedule, jitted
train step with gradient accumulation, data-parallel sharding, checkpoints."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.parallel import make_mesh, replicate, shard_batch
from vqatpu.train import (
    TrainState,
    adamax,
    clip_flat_grads,
    lr_for_epoch,
    make_eval_step,
    make_train_state,
    make_train_step,
    restore_train_state,
    save_checkpoint,
    trainable_mask,
)
from tests.test_models import tiny_batch, tiny_cfg


def test_adamax_matches_torch(rng):
    w0 = rng.randn(4, 3).astype(np.float32)
    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adamax([tw], lr=0.02)
    tx = adamax()
    import optax
    chain = optax.chain(tx, optax.scale(-0.02))
    params = {"w": jnp.asarray(w0)}
    state = chain.init(params)
    for i in range(5):
        g = rng.randn(4, 3).astype(np.float32)
        opt.zero_grad()
        tw.grad = torch.from_numpy(g.copy())
        opt.step()
        updates, state = chain.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)
    np.testing.assert_allclose(
        np.asarray(params["w"]), tw.detach().numpy(), atol=1e-6
    )


def test_clip_flat_grads_matches_reference_semantics(rng):
    grads = {"a": jnp.asarray(rng.randn(10).astype(np.float32)) * 10}
    clipped, norm = clip_flat_grads(grads, 0.25)
    total = float(jnp.linalg.norm(clipped["a"]))
    # coef = max_norm / (norm + 1e-6)
    assert np.isclose(total, 0.25 * float(norm) / (float(norm) + 1e-6), rtol=1e-5)
    # below threshold: untouched
    small = {"a": jnp.asarray([0.1, 0.1]).astype(jnp.float32)}
    same, _ = clip_flat_grads(small, 0.25)
    np.testing.assert_allclose(np.asarray(same["a"]), np.asarray(small["a"]))


def test_lr_schedule_matches_reference():
    cfg = TrainConfig(lr=1e-3)
    # warmup epochs 0-3: [0.5, 1, 1.5, 2] x lr (FFOE/train.py:30,63-64)
    assert np.isclose(lr_for_epoch(cfg, 0), 5e-4)
    assert np.isclose(lr_for_epoch(cfg, 3), 2e-3)
    # plateau at 2x until decay starts at epoch 10
    assert np.isclose(lr_for_epoch(cfg, 9), 2e-3)
    assert np.isclose(lr_for_epoch(cfg, 10), 5e-4)
    assert np.isclose(lr_for_epoch(cfg, 11), 5e-4)
    assert np.isclose(lr_for_epoch(cfg, 12), 1.25e-4)
    # decay epochs capped at range(10, 20, 2): 5 decays total
    assert np.isclose(lr_for_epoch(cfg, 25), 2e-3 * 0.25 ** 5)


def test_trainable_mask_freezes_emb_copy():
    cfg = tiny_cfg(model="cti")
    m = build_model(cfg)
    p = m.init(jax.random.PRNGKey(0))
    mask = trainable_mask(p)
    assert mask["w_emb"]["emb_"] is False
    assert mask["w_emb"]["emb"] is True
    assert mask["wa_emb"]["emb_"] is False
    mask2 = trainable_mask(p, tfidf_loaded=True)
    assert mask2["w_emb"]["emb_"] is True


@pytest.mark.parametrize("model_name", ["ban", "cti"])
def test_train_step_accumulation_and_update(rng, model_name):
    cfg = tiny_cfg(model=model_name)
    tcfg = TrainConfig(update_freq=2, batch_size=2)
    m = build_model(cfg)
    state = make_train_state(m, jax.random.PRNGKey(0))
    step = make_train_step(m, tcfg)
    batch = tiny_batch(rng)
    batch["target"] = jnp.asarray(rng.rand(2, cfg.num_ans_candidates).astype(np.float32))

    p0 = jax.tree.map(np.asarray, state.params)
    state, metrics = step(state, batch, jnp.float32(1e-3), jax.random.PRNGKey(1))
    # first microbatch: buffered, no param change
    assert int(metrics["updated"]) == 0
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.params)[0]),
        np.asarray(jax.tree.leaves(p0)[0]),
    )
    assert int(state.accum_count) == 1
    state, metrics = step(state, batch, jnp.float32(1e-3), jax.random.PRNGKey(2))
    # second microbatch: update fires, accum resets
    assert int(metrics["updated"]) == 1
    assert int(state.accum_count) == 0
    assert int(state.step) == 1
    assert float(metrics["grad_norm"]) > 0
    assert not np.allclose(
        np.asarray(jax.tree.leaves(state.params)[0]),
        np.asarray(jax.tree.leaves(p0)[0]),
    )
    # frozen emb copy must not move
    np.testing.assert_array_equal(
        np.asarray(state.params["w_emb"]["emb_"]), np.asarray(p0["w_emb"]["emb_"])
    )
    assert np.isfinite(float(metrics["loss"]))


def test_train_step_distillation_ban(rng):
    cfg = tiny_cfg(model="ban")
    tcfg = TrainConfig(update_freq=1, distillation=True, T=2.0, alpha=0.3)
    m = build_model(cfg)
    state = make_train_state(m, jax.random.PRNGKey(0))
    step = make_train_step(m, tcfg)
    batch = tiny_batch(rng)
    batch["target"] = jnp.asarray(rng.rand(2, cfg.num_ans_candidates).astype(np.float32))
    batch["t_logits"] = jnp.asarray(rng.randn(2, cfg.num_ans_candidates).astype(np.float32))
    state, metrics = step(state, batch, jnp.float32(1e-3), jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))
    assert int(metrics["updated"]) == 1


def test_data_parallel_mesh_matches_single_device(rng):
    """Same batch, sharded over 8 virtual devices vs unsharded: identical
    loss and updated params (DP is semantics-preserving)."""
    assert len(jax.devices()) == 8
    cfg = tiny_cfg(model="cti")
    tcfg = TrainConfig(update_freq=1)
    m = build_model(cfg)
    step = make_train_step(m, tcfg)

    B = 8
    v = rng.randn(B, 8, 32).astype(np.float32)
    batch = {
        "v": jnp.asarray(v),
        "q": jnp.asarray(rng.randint(0, 51, (B, 12))),
        "a": jnp.asarray(rng.randint(0, 51, (B, 3))),
        "target": jnp.asarray(rng.rand(B, cfg.num_ans_candidates).astype(np.float32)),
    }

    s1 = make_train_state(m, jax.random.PRNGKey(0))
    s1, m1 = step(s1, batch, jnp.float32(1e-3), jax.random.PRNGKey(9))

    mesh = make_mesh()
    s2 = make_train_state(m, jax.random.PRNGKey(0))
    s2 = TrainState(*[replicate(x, mesh) for x in s2])
    sharded = shard_batch(batch, mesh)
    s2, m2 = step(s2, sharded, jnp.float32(1e-3), jax.random.PRNGKey(9))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    l1 = jax.tree.leaves(s1.params)
    l2 = jax.tree.leaves(s2.params)
    for a, b in zip(l1, l2):
        # sharded reductions reassociate float sums; 2e-5 absorbs that
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_data_parallel_mesh_int8_wire(rng):
    """The int8 wire composes with the data mesh: a host-quantized batch
    (v int8 + v_scale side tensor) sharded over 8 devices steps identically
    to the same wire batch unsharded — v_scale shards on its leading axis
    like every other tensor."""
    from vqatpu.train.steps import wire_cast

    assert len(jax.devices()) == 8
    cfg = tiny_cfg(model="cti")
    m = build_model(cfg)
    step = make_train_step(m, TrainConfig(update_freq=1))

    B = 8
    batch = wire_cast({
        "v": rng.randn(B, 8, 32).astype(np.float32) * 3,
        "b": rng.rand(B, 8, 6).astype(np.float32),
        "q": rng.randint(0, 51, (B, 12)),
        "a": rng.randint(0, 51, (B, 3)),
        "target": rng.rand(B, cfg.num_ans_candidates).astype(np.float32),
    }, "int8")
    assert batch["v"].dtype == np.int8 and "v_scale" in batch

    s1 = make_train_state(m, jax.random.PRNGKey(0))
    s1, m1 = step(s1, batch, jnp.float32(1e-3), jax.random.PRNGKey(9))

    mesh = make_mesh()
    s2 = make_train_state(m, jax.random.PRNGKey(0))
    s2 = TrainState(*[replicate(x, mesh) for x in s2])
    s2, m2 = step(s2, shard_batch(batch, mesh), jnp.float32(1e-3),
                  jax.random.PRNGKey(9))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_eval_step_and_checkpoint_roundtrip(rng, tmp_path):
    cfg = tiny_cfg(model="ban")
    m = build_model(cfg)
    state = make_train_state(m, jax.random.PRNGKey(0))
    ev = make_eval_step(m)
    batch = tiny_batch(rng)
    batch["target"] = jnp.asarray(rng.rand(2, cfg.num_ans_candidates).astype(np.float32))
    out = ev(state.params, batch)
    assert out["logits"].shape == (2, cfg.num_ans_candidates)
    assert float(out["upper_bound"]) > 0

    path = str(tmp_path / "model_epoch0.ckpt")
    save_checkpoint(path, state, epoch=0)
    fresh = make_train_state(m, jax.random.PRNGKey(42))
    restored, start_epoch, _ = restore_train_state(path, fresh)
    assert start_epoch == 1
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out2 = ev(restored.params, batch)
    np.testing.assert_allclose(
        np.asarray(out2["logits"]), np.asarray(out["logits"]), atol=1e-6
    )


def test_restore_wrong_model_checkpoint_is_descriptive(tmp_path):
    """A checkpoint saved from one model family restored into another must
    fail with a clear 'incompatible checkpoint' error naming the saved model
    and the structural mismatch — not a raw pytree 'Dict key mismatch' or a
    downstream KeyError (r3 ADVICE/verdict item)."""
    import pytest

    ban_state = make_train_state(build_model(tiny_cfg(model="ban")),
                                 jax.random.PRNGKey(0))
    cti = build_model(tiny_cfg(model="cti"))
    cti_state = make_train_state(cti, jax.random.PRNGKey(0))
    path = str(tmp_path / "model_epoch9.ckpt")
    save_checkpoint(path, ban_state, epoch=9, extra={"model": "ban"})
    with pytest.raises(ValueError, match="incompatible checkpoint.*'ban'"):
        restore_train_state(path, cti_state)
    # same-structure wrong-dims stays on the per-leaf shape message
    big_state = make_train_state(build_model(tiny_cfg(model="cti",
                                                      num_hid=24)),
                                 jax.random.PRNGKey(0))
    path2 = str(tmp_path / "model_epoch8.ckpt")
    save_checkpoint(path2, big_state, epoch=8)
    with pytest.raises(ValueError, match="incompatible checkpoint.*shape"):
        restore_train_state(path2, cti_state)


def test_eval_step_bfloat16(rng):
    """bf16 eval (the BAN serving/eval throughput knob) returns f32 logits
    close to the f32 path and identical argmax on well-separated logits."""
    cfg = tiny_cfg(model="ban")
    m = build_model(cfg)
    state = make_train_state(m, jax.random.PRNGKey(0))
    batch = tiny_batch(rng)
    batch["target"] = jnp.asarray(
        rng.rand(2, cfg.num_ans_candidates).astype(np.float32))
    out32 = make_eval_step(m)(state.params, batch)
    out16 = make_eval_step(m, compute_dtype="bfloat16")(state.params, batch)
    assert out16["logits"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out16["logits"]),
                               np.asarray(out32["logits"]),
                               atol=5e-2, rtol=5e-2)


def test_transfer_dtype_wire_path(rng):
    """f16 wire tensors (TrainConfig.transfer_dtype — H2D byte halving) are
    upcast on device: eval logits stay f32 and close to the all-f32 path,
    and a train step on wire-f16 v/b runs with a finite loss."""
    from vqatpu.train.loop import _device_batch

    cfg = tiny_cfg(model="ban", use_counter=True)  # counter consumes b
    m = build_model(cfg)
    state = make_train_state(m, jax.random.PRNGKey(0))
    batch = tiny_batch(rng)
    batch["target"] = jnp.asarray(
        rng.rand(2, cfg.num_ans_candidates).astype(np.float32))

    host = {k: np.asarray(v) for k, v in batch.items()}
    wired = _device_batch(host, transfer_dtype="float16")
    assert wired["v"].dtype == np.float16 and wired["b"].dtype == np.float16
    assert wired["q"].dtype == host["q"].dtype  # ints untouched

    ev = make_eval_step(m)
    out32 = ev(state.params, batch)
    out16 = ev(state.params, {k: jnp.asarray(v) for k, v in wired.items()})
    assert out16["logits"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out16["logits"]),
                               np.asarray(out32["logits"]),
                               atol=5e-2, rtol=5e-2)

    tcfg = TrainConfig(update_freq=1, batch_size=2, transfer_dtype="float16")
    step = make_train_step(m, tcfg)
    st, metrics = step(state, {k: jnp.asarray(v) for k, v in wired.items()},
                       jnp.float32(1e-3), jax.random.PRNGKey(1))
    assert np.isfinite(float(np.asarray(metrics["loss"])))

    # unknown wire strings fail loudly instead of silently quantizing
    from vqatpu.train.steps import wire_cast
    with pytest.raises(ValueError, match="transfer_dtype"):
        wire_cast(host, "fp32")


def test_transfer_dtype_int8_wire(rng):
    """int8 wire: per-box symmetric quantization (4x H2D byte cut).  The
    host side emits int8 v + f32 v_scale + f16 b; the device side
    dequantizes inside the jitted steps; eval logits stay close to f32 and
    a train step runs finite."""
    from vqatpu.train.loop import _device_batch
    from vqatpu.train.steps import quantize_v, wire_cast

    # quantizer contract: error bound, zero-row exactness, shapes
    v = rng.randn(3, 5, 16).astype(np.float32) * 8.0
    v[1, 2] = 0.0  # padded box stays exactly zero
    q, scale = quantize_v(v)
    assert q.dtype == np.int8 and scale.dtype == np.float32
    assert q.shape == v.shape and scale.shape == (3, 5)
    deq = q.astype(np.float32) * scale[..., None]
    amax = np.abs(v).max(-1, keepdims=True)
    assert np.all(np.abs(deq - v) <= amax / 254.0 + 1e-7)
    assert not deq[1, 2].any() and scale[1, 2] == 1.0

    cfg = tiny_cfg(model="ban", use_counter=True)  # counter consumes b
    m = build_model(cfg)
    state = make_train_state(m, jax.random.PRNGKey(0))
    batch = tiny_batch(rng)
    batch["target"] = jnp.asarray(
        rng.rand(2, cfg.num_ans_candidates).astype(np.float32))

    host = {k: np.asarray(v) for k, v in batch.items()}
    wired = _device_batch(host, transfer_dtype="int8")
    assert wired["v"].dtype == np.int8 and wired["b"].dtype == np.float16
    assert wired["v_scale"].shape == host["v"].shape[:2]
    assert wire_cast(host, "float32") is host  # f32 path untouched

    ev = make_eval_step(m)
    out32 = ev(state.params, batch)
    out8 = ev(state.params, {k: jnp.asarray(x) for k, x in wired.items()})
    assert out8["logits"].dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out8["logits"]),
                               np.asarray(out32["logits"]),
                               atol=5e-2, rtol=5e-2)

    tcfg = TrainConfig(update_freq=1, batch_size=2, transfer_dtype="int8")
    step = make_train_step(m, tcfg)
    _, metrics = step(state, {k: jnp.asarray(x) for k, x in wired.items()},
                      jnp.float32(1e-3), jax.random.PRNGKey(1))
    assert np.isfinite(float(np.asarray(metrics["loss"])))


def test_profiler_trace_and_steptimer(tmp_path):
    import jax.numpy as jnp
    from vqatpu.train.profiling import StepTimer, trace

    out = str(tmp_path / "trace")
    with trace(out):
        x = jnp.ones((8, 8)) @ jnp.ones((8, 8))
        jax.block_until_ready(x)
    import os
    assert os.path.isdir(out) and any(os.scandir(out))
    # no-op path
    with trace(None):
        pass

    timer = StepTimer(warmup=1)
    for _ in range(4):
        timer.step(16, sync_value=x)
    assert timer.samples_per_sec(sync_value=x) > 0


def test_orbax_checkpoint_roundtrip(rng, tmp_path):
    from vqatpu.train.checkpoints import (
        restore_train_state_orbax,
        save_checkpoint_orbax,
    )

    cfg = tiny_cfg(model="ban")
    m = build_model(cfg)
    state = make_train_state(m, jax.random.PRNGKey(0))
    # advance one step so opt_state is non-trivial
    step = make_train_step(m, TrainConfig(update_freq=1))
    batch = tiny_batch(rng)
    batch["target"] = jnp.asarray(rng.rand(2, cfg.num_ans_candidates).astype(np.float32))
    state, _ = step(state, batch, jnp.float32(1e-3), jax.random.PRNGKey(1))

    path = str(tmp_path / "orbax_ck")
    save_checkpoint_orbax(path, state, epoch=3)
    fresh = make_train_state(m, jax.random.PRNGKey(42))
    restored, start_epoch = restore_train_state_orbax(path, fresh)
    assert start_epoch == 4
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(restored.opt_state), jax.tree.leaves(state.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


def test_remat_glimpse_is_bit_identical(rng):
    """remat_glimpse must not change outputs — the dropout rng enters the
    checkpointed fn as an argument so the replayed trace sees the same keys."""
    import dataclasses
    from vqatpu.ops.module import Ctx

    cfg = tiny_cfg(model="cti")
    m1 = build_model(cfg)
    m2 = build_model(dataclasses.replace(cfg, remat_glimpse=True))
    p = m1.init(jax.random.PRNGKey(0))
    batch = tiny_batch(rng)
    o1, _ = m1.apply(p, batch, Ctx(train=True, rng=jax.random.PRNGKey(7)))
    o2, _ = m2.apply(p, batch, Ctx(train=True, rng=jax.random.PRNGKey(7)))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_accumulation_flushes_at_epoch_end(rng, tmp_path):
    """With batches-per-epoch not divisible by update_freq, the trailing
    microbatch must flush at epoch end (FFOE/train.py:78-82) so the device
    counter never carries across epochs."""
    from vqatpu.data.synthetic import make_vqa_fixture
    from vqatpu.data import VQAFeatureDataset
    from vqatpu.train.loop import train
    from tests.test_end_to_end import small_cfg

    root = str(tmp_path / "d")
    d = make_vqa_fixture(root, n_train=24, n_val=8, n_images=6, v_dim=16)
    ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=12)
    # 24 samples / batch 8 = 3 batches; update_freq 2 -> updates at batch 2
    # (count) and batch 3 (forced flush): 2 updates/epoch, step even across
    # epochs
    m = build_model(small_cfg(ds, "ban"))
    cfg = TrainConfig(epochs=2, batch_size=8, update_freq=2, saving_epoch=99)
    state = train(m, ds, None, cfg, str(tmp_path / "o"), use_mesh=False)
    assert int(state.step) == 4  # 2 updates x 2 epochs
    assert int(state.accum_count) == 0  # nothing carried over


def test_orbax_sharded_state_save_restore_step(rng, tmp_path):
    """Orbax checkpoint of a TrainState sharded on the 4x2 (data x model)
    mesh: restore into a fresh sharded state, take one more step — BIT-equal
    to the uninterrupted sharded run, and equal (to float-reassociation
    tolerance) to the unsharded run."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vqatpu.parallel import DATA_AXIS, make_mesh_2d, replicate, shard_params
    from vqatpu.train.checkpoints import (
        restore_train_state_orbax,
        save_checkpoint_orbax,
    )

    # vocab divisible by the model axis (the classifier out-dim is sharded)
    cfg = tiny_cfg(model="cti", num_ans_candidates=16)
    m = build_model(cfg)
    step = make_train_step(m, TrainConfig(update_freq=1))

    B = 8
    v = rng.randn(B, 8, 32).astype(np.float32)
    batch = {
        "v": jnp.asarray(v),
        "q": jnp.asarray(rng.randint(0, 51, (B, 12))),
        "a": jnp.asarray(rng.randint(0, 51, (B, 3))),
        "target": jnp.asarray(rng.rand(B, cfg.num_ans_candidates).astype(np.float32)),
    }

    # unsharded 2-step reference trajectory
    s0 = make_train_state(m, jax.random.PRNGKey(0))
    s0, _ = step(s0, batch, jnp.float32(1e-3), jax.random.PRNGKey(1))
    s0, _ = step(s0, batch, jnp.float32(1e-3), jax.random.PRNGKey(2))

    mesh = make_mesh_2d(4, 2)

    def shard_state(s):
        return TrainState(
            params=shard_params(s.params, mesh),
            opt_state=replicate(s.opt_state, mesh),
            grad_accum=shard_params(s.grad_accum, mesh),
            accum_count=replicate(s.accum_count, mesh),
            step=replicate(s.step, mesh),
        )

    sb = jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P(DATA_AXIS))), batch)
    s = shard_state(make_train_state(m, jax.random.PRNGKey(0)))
    s, _ = step(s, sb, jnp.float32(1e-3), jax.random.PRNGKey(1))

    # save BEFORE the continuation step (the jitted step donates its input
    # state buffers), then compare the two continuations
    path = str(tmp_path / "sharded_orbax")
    save_checkpoint_orbax(path, s, epoch=0)
    s_cont, _ = step(s, sb, jnp.float32(1e-3), jax.random.PRNGKey(2))
    fresh = shard_state(make_train_state(m, jax.random.PRNGKey(42)))
    restored, start_epoch = restore_train_state_orbax(path, fresh)
    assert start_epoch == 1
    restored = shard_state(restored)
    s_rest, _ = step(restored, sb, jnp.float32(1e-3), jax.random.PRNGKey(2))

    for a, b in zip(jax.tree.leaves(s_cont.params), jax.tree.leaves(s_rest.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(s0.params), jax.tree.leaves(s_rest.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_restore_premasked_checkpoint(tmp_path, rng):
    """Checkpoints written before the masked-Adamax change (full m/u state
    for the frozen emb_) restore into the current masked opt_state: stale
    frozen-leaf state is dropped, live state is kept."""
    from vqatpu.train.checkpoints import restore_train_state, save_checkpoint
    from vqatpu.train.optim import adamax_with_lr
    from tests.test_end_to_end import small_cfg

    class _DS:
        pass

    cfg = ModelConfig(ntoken=30, v_dim=8, num_ans_candidates=7, model="ban",
                      num_hid=16, op="c")
    model = build_model(cfg)
    state = make_train_state(model, jax.random.PRNGKey(0))  # masked layout

    # forge the OLD layout: unmasked optimizer over the same params
    old_tx = adamax_with_lr()
    old_state = state._replace(opt_state=old_tx.init(state.params))
    path = str(tmp_path / "model_epoch3.ckpt")
    save_checkpoint(path, old_state, epoch=3)

    restored, start, _ = restore_train_state(path, state)
    assert start == 4
    # structure matches the masked template and a step runs
    assert jax.tree.structure(restored.opt_state) == jax.tree.structure(
        state.opt_state)
    step = make_train_step(model, TrainConfig(update_freq=1))
    batch = {
        "v": jnp.asarray(rng.randn(4, 6, 8).astype(np.float32)),
        "q": jnp.asarray(rng.randint(0, 31, (4, 12))),
        "target": jnp.asarray(rng.rand(4, 7).astype(np.float32)),
    }
    new_state, metrics = step(restored, batch, jnp.float32(1e-3),
                              jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_train_loop_tp_flag(tmp_path):
    """VERDICT r2 item 4: --tp is drivable through train() — a 1-epoch run
    on a 4x2 data x model mesh produces the same loss/eval trajectory as
    the pure-DP run (same seeds, same data)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "helpers"))
    from synth_ds import SynthVQADataset

    from vqatpu.train.loop import train

    cfg = ModelConfig(ntoken=50, v_dim=16, num_ans_candidates=16, model="cti",
                      num_hid=16, h_mm=8, rank=2, gamma=2)
    tcfg = TrainConfig(epochs=1, batch_size=8, update_freq=1, saving_epoch=0,
                       seed=1204)
    model = build_model(cfg)

    def run(out, tp):
        train(model, SynthVQADataset(32, num_ans=16, seed=5),
              SynthVQADataset(16, num_ans=16, seed=6),
              tcfg, str(tmp_path / out), print_interval=10 ** 6, tp=tp)
        losses, evals = [], []
        for ln in open(str(tmp_path / out / "log.txt")):
            if ln.startswith("\ttrain_loss:"):
                losses.append(float(ln.split("train_loss:")[1].split(",")[0]))
            elif ln.startswith("\teval score:"):
                evals.append(float(ln.split("eval score:")[1].split("(")[0]))
        return losses, evals

    dp_losses, dp_evals = run("dp", tp=1)
    tp_losses, tp_evals = run("tp", tp=2)
    np.testing.assert_allclose(tp_losses, dp_losses, atol=0.01)
    np.testing.assert_allclose(tp_evals, dp_evals, atol=0.01)

    # the fused_v_tucker + model-axis combination is rejected up front
    model_fused = build_model(
        ModelConfig(ntoken=50, v_dim=16, num_ans_candidates=16, model="cti",
                    num_hid=16, h_mm=8, rank=2, gamma=2, fused_v_tucker=True))
    with pytest.raises(AssertionError, match="fused_v_tucker"):
        train(model_fused, SynthVQADataset(8, num_ans=16, seed=5), None, tcfg,
              str(tmp_path / "fused"), tp=2)


def test_skip_nonfinite_guard(rng):
    """skip_nonfinite: a NaN-loss microbatch contributes zero gradient (the
    reference's zero-grad recovery semantics, trainer.py:141-143 + the OOM
    path); without the knob the NaNs propagate into the params."""
    cfg = tiny_cfg(model="cti")
    model = build_model(cfg)
    batch = {
        "v": jnp.asarray(rng.randn(4, 8, cfg.v_dim).astype(np.float32)),
        "q": jnp.asarray(rng.randint(0, cfg.ntoken, (4, 12))),
        "a": jnp.asarray(rng.randint(0, cfg.ntoken, (4, 3))),
        "target": jnp.asarray(rng.rand(4, cfg.num_ans_candidates).astype(np.float32)),
    }
    bad = dict(batch, v=batch["v"].at[0, 0, 0].set(jnp.nan))

    def run(skip):
        state = make_train_state(model, jax.random.PRNGKey(0))
        step = make_train_step(model, TrainConfig(update_freq=1,
                                                  skip_nonfinite=skip))
        state, m = step(state, bad, jnp.float32(1e-3), jax.random.PRNGKey(1))
        finite = all(np.isfinite(np.asarray(x)).all()
                     for x in jax.tree.leaves(state.params))
        return finite, int(m["skipped"])

    finite_guarded, skipped = run(True)
    assert finite_guarded and skipped == 1
    finite_raw, skipped_raw = run(False)
    assert not finite_raw and skipped_raw == 0

    # finite batches never trip the guard
    state = make_train_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model, TrainConfig(update_freq=1,
                                              skip_nonfinite=True))
    _, m = step(state, batch, jnp.float32(1e-3), jax.random.PRNGKey(1))
    assert int(m["skipped"]) == 0 and int(m["updated"]) == 1


def test_evaluate_sweep_int8_wire(tmp_path):
    """The eval sweep surfaces (evaluate / get_logits) through the int8
    wire: scores equal f32's on a tiny fixture and logits stay close —
    the knob the test CLIs expose for transfer-bound hosts."""
    from vqatpu.data import BatchLoader, VQAFeatureDataset
    from vqatpu.data.synthetic import make_vqa_fixture
    from vqatpu.eval.ffoe import evaluate, get_logits
    from vqatpu.models import build_model as build

    root = str(tmp_path / "data")
    d = make_vqa_fixture(root, n_train=8, n_val=16, n_images=4, v_dim=16,
                         seed=3)
    ds = VQAFeatureDataset("val", d, dataroot=root, max_boxes=12)
    cfg = ModelConfig(ntoken=d.ntoken, v_dim=16,
                      num_ans_candidates=ds.num_ans_candidates,
                      model="cti", num_hid=16, h_mm=8, rank=2, gamma=2)
    m = build(cfg)
    params = make_train_state(m, jax.random.PRNGKey(0)).params

    s32 = evaluate(m, params, BatchLoader(ds, 8))
    s8 = evaluate(m, params, BatchLoader(ds, 8), transfer_dtype="int8")
    assert s32 == s8  # argmax-stable at tiny scale

    l32, qids = get_logits(m, params, BatchLoader(ds, 8))
    l8, qids8 = get_logits(m, params, BatchLoader(ds, 8),
                           transfer_dtype="int8")
    np.testing.assert_array_equal(qids, qids8)
    np.testing.assert_allclose(l8, l32, atol=5e-2, rtol=5e-2)


def test_oom_skip_on_flush_batch_resets_accumulation(tmp_path, monkeypatch):
    """If a batch OOM-skips while microbatches are buffered (worst case:
    the epoch's forced-flush LAST batch), the window must be dropped — the
    reference's recovery zero-grads (``FFOE/trainer.py:206-219``) — so
    device accumulation never straddles epochs and the host-side cadence
    stays in sync with the device counter."""
    import vqatpu.train.loop as loop_mod
    from tests.test_end_to_end import small_cfg
    from vqatpu.data import VQAFeatureDataset
    from vqatpu.data.synthetic import make_vqa_fixture

    root = str(tmp_path / "d")
    d = make_vqa_fixture(root, n_train=32, n_val=8, n_images=6, v_dim=16)
    ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=12)
    m = build_model(small_cfg(ds, "ban"))
    # 32 samples / batch 8 = 4 batches; update_freq 2 -> update at i=1,
    # batch i=2 buffers, and the i=3 forced flush is the step we OOM —
    # without the reset, i=2's gradient would be stranded in grad_accum
    cfg = TrainConfig(epochs=1, batch_size=8, update_freq=2, saving_epoch=99)

    real_make = loop_mod.make_train_step
    calls = {"n": 0}

    def wrapped_make(*a, **kw):
        step = real_make(*a, **kw)

        def stepper(state, db, lr, key, force=False):
            calls["n"] += 1
            if calls["n"] == 4:
                raise jax.errors.JaxRuntimeError(
                    "RESOURCE_EXHAUSTED (injected)")
            return step(state, db, lr, key, force)

        return stepper

    monkeypatch.setattr(loop_mod, "make_train_step", wrapped_make)
    state = loop_mod.train(m, ds, None, cfg, str(tmp_path / "o"),
                           use_mesh=False)
    assert calls["n"] == 4
    assert int(np.asarray(state.step)) == 1  # only the i=1 update applied
    assert int(np.asarray(state.accum_count)) == 0
    assert all(not np.any(np.asarray(g))
               for g in jax.tree.leaves(state.grad_accum)), \
        "OOM-skipped window left gradients buffered across the epoch"


def test_resume_does_not_clobber_better_best_checkpoint(tmp_path,
                                                        monkeypatch):
    """``best_eval`` rides the checkpoint extra: a resumed run whose eval
    scores are WORSE than the pre-crash best must not overwrite
    ``model_epoch_best`` (divergence-fix vs the reference's
    ``best_eval_score = 0`` reset on every ``train()`` call,
    ``FFOE/train.py:41``)."""
    import vqatpu.train.loop as loop_mod
    from tests.test_end_to_end import small_cfg
    from vqatpu.data import VQAFeatureDataset
    from vqatpu.data.synthetic import make_vqa_fixture

    root = str(tmp_path / "d")
    d = make_vqa_fixture(root, n_train=16, n_val=8, n_images=6, v_dim=16)
    ds = VQAFeatureDataset("train", d, dataroot=root, max_boxes=12)
    ev = VQAFeatureDataset("val", d, dataroot=root, max_boxes=12)
    m = build_model(small_cfg(ds, "ban"))
    out = str(tmp_path / "o")

    cfg1 = TrainConfig(epochs=1, batch_size=8, update_freq=1, saving_epoch=0)
    monkeypatch.setattr(loop_mod, "evaluate_ffoe",
                        lambda *a, **kw: (0.9, 1.0))
    state = loop_mod.train(m, ds, ev, cfg1, out, use_mesh=False)

    # resume from the real checkpoint: extra carries the best score
    fresh = make_train_state(m, jax.random.PRNGKey(7))
    restored, start_epoch, extra = restore_train_state(
        os.path.join(out, "model_epoch0.ckpt"), fresh)
    assert start_epoch == 1
    assert extra["best_eval"] == 0.9

    # resumed epoch scores WORSE: best must not be overwritten
    monkeypatch.setattr(loop_mod, "evaluate_ffoe",
                        lambda *a, **kw: (0.5, 1.0))
    saves = []
    monkeypatch.setattr(
        loop_mod, "_save_ckpt",
        lambda output, name, st, epoch, backend, extra=None:
            saves.append((name, extra)))
    cfg2 = TrainConfig(epochs=2, batch_size=8, update_freq=1, saving_epoch=0)
    loop_mod.train(m, ds, ev, cfg2, out, state=restored,
                   start_epoch=start_epoch, best_eval=extra["best_eval"],
                   use_mesh=False)
    names = [n for n, _ in saves]
    assert names == ["model_epoch1"], names  # no model_epoch_best clobber
    assert saves[0][1]["best_eval"] == 0.9  # the pre-crash best rides on
