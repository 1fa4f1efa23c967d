"""Worker for tests/test_multiprocess.py: one process of a 2-process
distributed CTI train step (CPU + gloo standing in for a pod host).

argv: process_id num_processes coordinator_port [orbax_ckpt_dir]
Prints "LOSS <value>" — the test compares both processes' values to the
single-process loss on the same global batch.

Determinism note: the single-process oracle in the TEST must build the
batch with the same generator calls used here (numpy RandomState(7)).
"""

import sys

import jax

from vqatpu.parallel.distributed import (
    global_batch_from_local,
    global_mesh,
    init_distributed,
    replicate_tree_global,
)

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
init_distributed(f"127.0.0.1:{port}", nproc, pid, cpu_gloo=True)

import numpy as np
import jax.numpy as jnp

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.train.steps import TrainState, make_train_state, make_train_step

cfg = ModelConfig(ntoken=50, v_dim=16, num_ans_candidates=11, model="cti",
                  num_hid=16, h_mm=8, rank=2, gamma=2)
tcfg = TrainConfig(update_freq=1)
model = build_model(cfg)

B_global = 8
rng = np.random.RandomState(7)
v = rng.randn(B_global, 6, 16).astype(np.float32)
q = rng.randint(0, 51, (B_global, 12)).astype(np.int32)
a = rng.randint(0, 51, (B_global, 3)).astype(np.int32)
target = rng.rand(B_global, 11).astype(np.float32)

from vqatpu.parallel.distributed import local_batch_slice

mesh = global_mesh()
batch = global_batch_from_local(
    local_batch_slice({"v": v, "q": q, "a": a, "target": target}), mesh)

state = make_train_state(model, jax.random.PRNGKey(0))
state = TrainState(*[replicate_tree_global(part, mesh) for part in state])

step = make_train_step(model, tcfg)
state, metrics = step(state, batch, jnp.float32(1e-3),
                      replicate_tree_global(jax.random.PRNGKey(1), mesh))
print(f"LOSS {float(np.asarray(metrics['loss'])):.8f}", flush=True)

# distributed eval over the same global mesh (post-update params)
from vqatpu.train.steps import make_eval_step

ev = make_eval_step(model)(state.params, batch)
print(f"SCORE {float(np.asarray(ev['score'])):.8f}", flush=True)

if len(sys.argv) > 4:
    # multi-host orbax checkpoint: every process participates in the save
    # of the cross-process state, then the raw restore must match
    from vqatpu.train.checkpoints import save_checkpoint_orbax

    ckpt = sys.argv[4]
    save_checkpoint_orbax(ckpt, state, epoch=1)
    import orbax.checkpoint as ocp

    back = ocp.PyTreeCheckpointer().restore(ckpt)
    want = np.asarray(state.params["classifier"]["l1"]["v"])
    got = np.asarray(back["params"]["classifier"]["l1"]["v"])
    assert np.allclose(want, got), "orbax roundtrip mismatch"
    print("ORBAX OK", flush=True)
