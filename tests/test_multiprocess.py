"""Multi-HOST (multi-process) distributed training smoke: 2 CPU processes
with gloo collectives stand in for 2 pod hosts.  Each process supplies its
local batch shard; the global mesh spans both processes' devices; one
jitted CTI train step runs; both processes' losses must equal the
single-process loss on the same global batch.

This exercises the exact multi-host API surface a TPU pod uses
(jax.distributed.initialize + make_array_from_process_local_data);
see vqatpu/parallel/distributed.py.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.train.steps import make_train_state, make_train_step

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "helpers", "mp_train_worker.py")


def _single_process_loss():
    cfg = ModelConfig(ntoken=50, v_dim=16, num_ans_candidates=11, model="cti",
                      num_hid=16, h_mm=8, rank=2, gamma=2)
    model = build_model(cfg)
    B = 8
    rng = np.random.RandomState(7)
    batch = {
        "v": jnp.asarray(rng.randn(B, 6, 16).astype(np.float32)),
        "q": jnp.asarray(rng.randint(0, 51, (B, 12)).astype(np.int32)),
        "a": jnp.asarray(rng.randint(0, 51, (B, 3)).astype(np.int32)),
        "target": jnp.asarray(rng.rand(B, 11).astype(np.float32)),
    }
    state = make_train_state(model, jax.random.PRNGKey(0))
    step = make_train_step(model, TrainConfig(update_freq=1))
    state, metrics = step(state, batch, jnp.float32(1e-3),
                          jax.random.PRNGKey(1))
    from vqatpu.train.steps import make_eval_step

    ev = make_eval_step(model)(state.params, batch)
    return (float(np.asarray(metrics["loss"])),
            float(np.asarray(ev["score"])))


def _free_port() -> int:
    """Ephemeral port for the jax.distributed coordinator — a hardcoded port
    collides when two test runs (or a stale worker) overlap."""
    import socket

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_train_step_matches_single(tmp_path):
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    ckpt = str(tmp_path / "mp_orbax")
    port = _free_port()
    procs = [
        subprocess.Popen([sys.executable, WORKER, str(pid), "2", str(port),
                          ckpt],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=360)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-3000:]}"

    def grab(tag, out):
        line = [ln for ln in out.splitlines() if ln.startswith(tag + " ")]
        assert line, out[-2000:]
        return float(line[-1].split()[1])

    want_loss, want_score = _single_process_loss()
    for out in outs:
        # identical math; cross-device reduction order may differ in the
        # last float bits
        got = grab("LOSS", out)
        assert abs(got - want_loss) < 1e-4 * max(1.0, abs(want_loss)), (
            got, want_loss)
        got_s = grab("SCORE", out)
        assert abs(got_s - want_score) < 1e-4 * max(1.0, abs(want_score)), (
            got_s, want_score)
        assert "ORBAX OK" in out, out[-2000:]


LOOP_WORKER = os.path.join(REPO, "tests", "helpers", "mp_train_loop_worker.py")


def _single_process_epochs(tmp_path, wire="float32"):
    """Same 2-epoch train() as the workers, single process (8 virtual CPU
    devices)."""
    sys.path.insert(0, os.path.join(REPO, "tests", "helpers"))
    from synth_ds import SynthVQADataset

    from vqatpu.train.loop import train

    cfg = ModelConfig(ntoken=50, v_dim=16, num_ans_candidates=11, model="cti",
                      num_hid=16, h_mm=8, rank=2, gamma=2)
    tcfg = TrainConfig(epochs=2, batch_size=8, update_freq=2, saving_epoch=0,
                       seed=1204, transfer_dtype=wire)
    model = build_model(cfg)
    out = str(tmp_path / "single")
    state = train(model, SynthVQADataset(32, seed=5),
                  SynthVQADataset(16, seed=6), tcfg, out,
                  print_interval=10 ** 6)
    psum = float(sum(np.abs(np.asarray(x)).sum()
                     for x in jax.tree.leaves(state.params)))
    return psum, _epoch_lines(os.path.join(out, "log.txt"))


def _epoch_lines(log_path):
    """(train_loss, eval_score) per epoch from the reference-format log."""
    losses, evals = [], []
    for ln in open(log_path):
        if ln.startswith("\ttrain_loss:"):
            losses.append(float(ln.split("train_loss:")[1].split(",")[0]))
        elif ln.startswith("\teval score:"):
            evals.append(float(ln.split("eval score:")[1].split("(")[0]))
    return losses, evals


@pytest.mark.parametrize("wire", ["float32", "int8"])
def test_two_process_full_train_loop_matches_single(tmp_path, wire):
    """VERDICT r2 item 3: a full 2-process, 2-epoch train() — loss curve,
    eval scores, final params, and on-disk checkpoints all match the
    single-process run (the per-epoch log format is byte-compatible with
    the reference's train.py:103-106 lines).

    The int8 case pins multi-host LOCKSTEP through the quantized wire:
    every process must produce byte-identical int8 batches (the canonical
    quantizer + the -ffp-contract=off build guarantee it), or the psum'd
    gradients silently diverge."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    out = str(tmp_path / "multi")
    port = _free_port()
    procs = [
        subprocess.Popen([sys.executable, LOOP_WORKER, str(pid), "2",
                          str(port), out, wire],
                         env=env, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True, cwd=REPO)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            outp, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(outp)
    for pid, (p, outp) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{outp[-3000:]}"

    def grab(tag, outp):
        line = [ln for ln in outp.splitlines() if ln.startswith(tag + " ")]
        assert line, outp[-2000:]
        return float(line[-1].split()[1])

    want_psum, (want_losses, want_evals) = _single_process_epochs(tmp_path,
                                                                   wire)
    # both hosts ended on the same replicated params == single-process run
    for outp in outs:
        got = grab("PSUM", outp)
        assert abs(got - want_psum) < 1e-3 * max(1.0, abs(want_psum)), (
            got, want_psum)

    got_losses, got_evals = _epoch_lines(os.path.join(out, "log.txt"))
    assert len(got_losses) == len(want_losses) == 2
    np.testing.assert_allclose(got_losses, want_losses, atol=0.01)
    np.testing.assert_allclose(got_evals, want_evals, atol=0.01)

    # process-0 wrote the loop's pickle checkpoints (saving_epoch=0)
    from vqatpu.train.checkpoints import load_checkpoint

    multi = load_checkpoint(os.path.join(out, "model_epoch1.ckpt"))
    single = load_checkpoint(
        str(tmp_path / "single" / "model_epoch1.ckpt"))
    for a, b in zip(jax.tree.leaves(multi["params"]),
                    jax.tree.leaves(single["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
