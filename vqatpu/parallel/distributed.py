"""Multi-host (multi-process) runtime plumbing.

A real TPU pod slice runs one process per host; ``jax.distributed`` wires
them into one global device set and GSPMD treats the mesh exactly like the
single-host case — the train step, shardings, and collectives in this
package are unchanged.  What multi-host adds is only:

- an initialize step (coordinator rendezvous),
- per-process GLOBAL array construction: each host holds its local batch
  slice / a full params copy, and ``jax.make_array_from_process_local_data``
  assembles the jax.Arrays the jitted step consumes.

Tested end-to-end with 2 CPU processes (gloo collectives) in
``tests/test_multiprocess.py`` — per-host batch slices, replicated params,
one jitted CTI train step, loss bit-equal to the single-process run.
The reference has no distributed execution at all (SURVEY.md §2.5).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vqatpu.parallel.sharding import DATA_AXIS


def init_distributed(coordinator_address: str, num_processes: int,
                     process_id: int, cpu_gloo: bool = False) -> None:
    """Join the jax.distributed rendezvous.  ``cpu_gloo=True`` selects the
    gloo CPU collectives (tests / CPU fallback); TPU pods need neither."""
    if cpu_gloo:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axis: str = DATA_AXIS,
                num_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over ALL processes' devices (jax.devices() is global)."""
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def global_batch_from_local(batch: dict, mesh: Mesh) -> dict:
    """Assemble global data-sharded arrays from THIS process's batch shard.

    Every process passes its local slice (global_batch / num_processes
    rows); the result is one global jax.Array per entry, leading axis
    sharded over the data axis."""
    sh = NamedSharding(mesh, P(DATA_AXIS))
    return {
        k: jax.make_array_from_process_local_data(sh, np.asarray(v))
        for k, v in batch.items()
    }


def local_batch_slice(batch: dict, num_processes: Optional[int] = None,
                      process_id: Optional[int] = None) -> dict:
    """THIS process's rows of a (deterministically ordered) global batch.

    A multi-host loop runs the same seeded ``BatchLoader`` on every host,
    slices each global batch with this, and assembles jax.Arrays with
    :func:`global_batch_from_local` — the data-loading analogue of what a
    per-host input pipeline would do.  Batch size must divide evenly."""
    n = jax.process_count() if num_processes is None else num_processes
    i = jax.process_index() if process_id is None else process_id
    out = {}
    for k, v in batch.items():
        b = v.shape[0]
        assert b % n == 0, (k, b, n)
        per = b // n
        out[k] = v[i * per:(i + 1) * per]
    return out


def replicate_tree_global(tree, mesh: Mesh):
    """Replicate a host-local pytree (params / train state) onto every
    device of the global mesh.  All processes must pass identical values
    (same init seed or a broadcast checkpoint)."""
    sh = NamedSharding(mesh, P())

    def put(x):
        return jax.make_array_from_process_local_data(sh, np.asarray(x))

    return jax.tree.map(put, tree)
