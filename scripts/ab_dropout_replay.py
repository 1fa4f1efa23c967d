"""Interleaved A/B: dropout mask-replay VJP (regenerate masks from the
saved PRNG key in backward) vs plain AD (realized masks kept alive as
residuals from forward to backward — ~95M bool elements/step at CTI
reference shapes).

Both variants are bit-identical in fwd AND bwd
(tests/test_ops_linear.py::test_dropout_mask_replay_bit_equal), so this is
purely a residual-traffic experiment.  Alternating windows with
value-readback barriers per CLAUDE.md (tunnel drift).

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_dropout_replay.py [cti|ban]
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.train.steps import make_train_state, make_train_step

B, V, Q, A = 256, 50, 12, 3


def main(model_name="cti"):
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model=model_name, num_hid=1024, h_mm=512, rank=32,
                      gamma=2, use_counter=(model_name == "ban"))
    model = build_model(cfg)

    rng = np.random.RandomState(0)
    batch = {
        "v": jnp.asarray(rng.randn(B, V, 2048).astype(np.float32)),
        "q": jnp.asarray(rng.randint(0, 20000, (B, Q)).astype(np.int32)),
        "a": jnp.asarray(rng.randint(0, 20000, (B, A)).astype(np.int32)),
        "b": jnp.asarray(np.abs(rng.randn(B, V, 6)).astype(np.float32)),
        "v_mask": jnp.asarray(np.arange(V)[None] < 44).repeat(B, 0),
        "target": jnp.asarray(rng.rand(B, 3129).astype(np.float32)),
    }
    key = jax.random.PRNGKey(1)

    runners = {}
    for name, replay in (("resid", False), ("replay", True)):
        tcfg = TrainConfig(update_freq=1, batch_size=B, mask_replay=replay)
        st = make_train_state(model, jax.random.PRNGKey(0))
        stp = make_train_step(model, tcfg)
        st, m = stp(st, batch, jnp.float32(1e-3), key)
        float(np.asarray(m["loss"]))
        runners[name] = [st, stp]

    for rep in range(4):
        for name, r in runners.items():
            t0 = time.perf_counter()
            for i in range(30):
                r[0], m = r[1](r[0], batch, jnp.float32(1e-3),
                               jax.random.fold_in(key, i))
            float(np.asarray(m["loss"]))
            dt = (time.perf_counter() - t0) / 30
            print(f"rep{rep} {model_name} {name:6s} {dt * 1e3:8.3f} ms",
                  flush=True)


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "cti")
