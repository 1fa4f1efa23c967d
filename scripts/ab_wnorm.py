"""Interleaved A/B: weight-norm scale on the GEMM OUTPUT (new) vs scaled
weight materialization (old, r2 layout).  Both variants are traced into
separate jitted steps, then timed in alternating windows with value-readback
barriers (tunnel drift makes sequential comparisons meaningless; CLAUDE.md).

Run on the TPU:  python scripts/profile shim -> python scripts/ab_wnorm.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from vqatpu.config import ModelConfig, TrainConfig
from vqatpu.models import build_model
from vqatpu.ops.linear import WNLinear
from vqatpu.ops.trilinear import TCNet
from vqatpu.train.steps import make_train_state, make_train_step

B, V, Q, A = 256, 50, 12, 3


def old_wn_apply(self, p, x):
    v = p["v"]
    w = (p["g"] / jnp.linalg.norm(v.reshape(-1))) * v
    y = x @ w.T
    if self.bias:
        y = y + p["b"]
    return y


def old_rank_project(self, stacked, x, drop, ctx):
    from vqatpu.ops.activation import get_activation
    from vqatpu.ops.module import dropout as _dropout

    p = stacked["l0"]
    v = p["v"]
    norms = jnp.sqrt((v * v).sum(axis=(1, 2)))
    w = v * (p["g"] / norms)[:, None, None]
    w_all = w.reshape(self.rank * self.h_sub, v.shape[-1])
    b_all = p["b"].reshape(self.rank * self.h_sub)
    x = _dropout(x, drop, ctx)
    out = get_activation(self.act)(x @ w_all.T + b_all)
    return out.reshape(x.shape[0], x.shape[1], self.rank, self.h_sub)


def main(model_name="cti"):
    cfg = ModelConfig(ntoken=20000, v_dim=2048, num_ans_candidates=3129,
                      model=model_name, num_hid=1024, h_mm=512, rank=32,
                      gamma=2, use_counter=(model_name == "ban"))
    tcfg = TrainConfig(update_freq=1, batch_size=B)
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

    new_wn, new_rp = WNLinear.apply, TCNet._rank_project
    runners = {}
    for name, wn, rp in (("old", old_wn_apply, old_rank_project),
                         ("new", new_wn, new_rp)):
        WNLinear.apply = wn
        TCNet._rank_project = rp
        st = make_train_state(model, jax.random.PRNGKey(0))
        stp = make_train_step(model, tcfg)
        st, m = stp(st, batch, jnp.float32(1e-3), key)
        float(np.asarray(m["loss"]))
        runners[name] = [st, stp]
    WNLinear.apply, TCNet._rank_project = new_wn, new_rp

    for rep in range(4):
        for name, r in runners.items():
            t0 = time.perf_counter()
            for i in range(30):
                r[0], m = r[1](r[0], batch, jnp.float32(1e-3),
                               jax.random.fold_in(key, i))
            float(np.asarray(m["loss"]))
            dt = (time.perf_counter() - t0) / 30
            print(f"rep{rep} {model_name} {name:4s} {dt * 1e3:8.3f} ms",
                  flush=True)


if __name__ == "__main__":
    import sys

    main(sys.argv[1] if len(sys.argv) > 1 else "cti")
