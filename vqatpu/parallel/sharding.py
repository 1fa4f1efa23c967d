"""Device mesh + data-parallel layout.

The reference has no live distributed execution (SURVEY.md §2.5) — its
"all-reduce" is local flat-grad arithmetic inherited from fairseq
(``FFOE/trainer.py:221-232``) and ``nn.DataParallel`` is commented out
everywhere.  The TPU-native replacement is a 1-D ``data`` mesh:

- batches sharded ``P('data', ...)`` across chips,
- params/opt-state replicated,
- gradient reduction emitted by XLA as ICI collectives when ``jit`` traces
  the global loss — zero user-level backend code.

``make_mesh`` builds the mesh from visible devices (real TPU chips, or the
virtual CPU devices under ``--xla_force_host_platform_device_count``).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(dp: int, tp: int) -> Mesh:
    """2-D (data x model) mesh for the stretch config (SURVEY.md §2.5 TP
    row): model axis shards the classifier vocab dim and the PARALIND core's
    rank dim; data axis shards the batch."""
    devices = jax.devices()[: dp * tp]
    assert len(devices) == dp * tp, (len(devices), dp, tp)
    return Mesh(np.asarray(devices).reshape(dp, tp), (DATA_AXIS, MODEL_AXIS))


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for params on a 2-D mesh, replicated on 1-D
    (pure DP).  Model-axis layout:

    - classifier final vocab projection: output dim (column-parallel),
    - ``T_g`` + stacked per-rank nets: the PARALIND rank dim,
    - per-glimpse ``t_net`` tuckers: output dim ``d`` (column-parallel) —
      the largest GEMMs in the CTI step ([B*V, 2048] x [2048, d]) — paired
      with row-parallel ``q_prj``/``a_prj`` (input dim sharded), the
      Megatron pattern: the joint embedding stays d-sharded through the
      pooling (elementwise in d) and resolves to one ICI all-reduce at each
      prj, emitted by GSPMD from these annotations alone."""
    has_model = MODEL_AXIS in mesh.axis_names
    # row-parallel prj only where it pairs with d-sharded t_net tuckers
    # (CTI/Tan); BAN's prj consumes replicated BCNet output
    has_tnet = isinstance(params, dict) and "t_net0" in params

    def fits(leaf, spec):
        """A NamedSharding dim must divide the mesh axis (found by the
        near-reference-dims dryrun: the REAL 3129-answer vocab is odd, so
        the classifier can't split over model=2 — such leaves replicate;
        Megatron would pad the vocab instead, which changes logit shapes)."""
        for dim, name in enumerate(spec):
            if name is not None and (np.shape(leaf)[dim]
                                     % int(mesh.shape[name]) != 0):
                return False
        return True

    def walk(tree, path):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        spec = P()
        if has_model:
            if len(path) >= 2 and path[0] == "classifier" and path[-2] == "l2":
                # final vocab projection: shard out_dim (v is [out, in])
                if path[-1] == "v":
                    spec = P(MODEL_AXIS, None)
                elif path[-1] == "b":
                    spec = P(MODEL_AXIS)
            elif path[-1] == "T_g":
                spec = P(MODEL_AXIS)  # rank dim of the PARALIND core
            elif len(path) >= 3 and path[-3] in ("v_net", "q_net", "a_net"):
                spec = P(MODEL_AXIS)  # stacked per-rank nets: [rank, ...]
            elif (has_tnet and path[0].startswith("t_net")
                  and len(path) >= 2 and path[1].endswith("_tucker")):
                # column-parallel tucker: v [d, in], b [d]
                if path[-1] == "v":
                    spec = P(MODEL_AXIS, None)
                elif path[-1] == "b":
                    spec = P(MODEL_AXIS)
            elif (has_tnet
                  and (path[0].startswith("q_prj") or path[0].startswith("a_prj"))):
                # row-parallel prj: v [out, d] contracts the sharded d
                if path[-1] == "v":
                    spec = P(None, MODEL_AXIS)
        if not fits(tree, spec):
            spec = P()
        return NamedSharding(mesh, spec)

    return walk(params, ())


def shard_params(params, mesh: Mesh):
    shardings = param_shardings(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place every array in the batch with its leading axis sharded."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
