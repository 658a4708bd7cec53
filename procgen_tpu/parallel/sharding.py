"""Device-mesh sharding of the env batch axis.

The reference's only parallel axis is num_envs (worker threads,
vecgame.cpp:103-142).  TPU-natively the env axis is data-parallel over a
1-D mesh: every leaf of the batched ``BasicState`` is sharded on its
leading axis with a ``NamedSharding``; XLA inserts the (few) collectives —
notably inside the compact auto-reset gather.  Multi-host runs extend the
same mesh over ``jax.distributed`` processes; per-host env shards stay
resident and only observations consumed cross-host move over ICI/DCN.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ENV_AXIS = "env"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (ENV_AXIS,))


def env_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a leaf with leading env axis."""
    return NamedSharding(mesh, P(ENV_AXIS))


def shard_states(states, mesh: Mesh):
    """Place every leaf of a batched state pytree on the mesh, env-sharded."""
    sh = env_sharding(mesh)

    def place(a):
        return jax.device_put(a, sh)

    return jax.tree_util.tree_map(place, states)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def init_multihost(coordinator_address: Optional[str] = None,
                   num_processes: Optional[int] = None,
                   process_id: Optional[int] = None) -> Mesh:
    """Multi-host runtime: jax.distributed + a global env mesh.

    Replaces the reference's MPI-rank seed decorrelation (env.py:73-82) and
    per-process isolation: each host owns its contiguous shard of the env
    axis; `jax.make_array_from_single_device_arrays` (or just device_put of
    globally-shaped arrays under jit) assembles global batches.  Per-host
    observation shards stay resident; consumers all-gather over ICI/DCN only
    when they need the full batch.
    """
    import jax

    if jax.process_count() == 1 and coordinator_address is not None:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return make_mesh()


def host_local_slice(num_envs: int) -> tuple[int, int]:
    """[start, end) of this process's env shard for host-side seeding."""
    import jax

    per = num_envs // jax.process_count()
    start = per * jax.process_index()
    return start, start + per
