"""Worker for the FULL multi-process training-loop test: one process of a
2-process `vqatpu.train.loop.train()` run over 2 epochs on a deterministic
synthetic dataset (CPU + gloo standing in for pod hosts).

argv: process_id num_processes coordinator_port outdir [transfer_dtype]

Process 0 writes `outdir/log.txt` and the pickle checkpoints through the
normal loop policy; both processes print "PSUM <value>" (a replicated
params checksum) so the test can assert the hosts stayed in lockstep and
match the single-process run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from vqatpu.parallel.distributed import init_distributed

pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]), sys.argv[3],
                            sys.argv[4])
wire = sys.argv[5] if len(sys.argv) > 5 else "float32"
init_distributed(f"127.0.0.1:{port}", nproc, pid, cpu_gloo=True)

import jax
import numpy as np

from synth_ds import SynthVQADataset

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.train.loop import train

cfg = ModelConfig(ntoken=50, v_dim=16, num_ans_candidates=11, model="cti",
                  num_hid=16, h_mm=8, rank=2, gamma=2)
tcfg = TrainConfig(epochs=2, batch_size=8, update_freq=2, saving_epoch=0,
                   seed=1204, transfer_dtype=wire)
model = build_model(cfg)
train_ds = SynthVQADataset(32, seed=5)
eval_ds = SynthVQADataset(16, seed=6)

state = train(model, train_ds, eval_ds, tcfg, outdir, print_interval=10 ** 6)
psum = float(sum(np.abs(np.asarray(x)).sum()
                 for x in jax.tree.leaves(state.params)))
print(f"PSUM {psum:.6f}", flush=True)
