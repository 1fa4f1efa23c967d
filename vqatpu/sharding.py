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


def make_mesh(num_devices: Optional[int] = None, axis: str = DATA_AXIS) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


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
