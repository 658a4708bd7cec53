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
