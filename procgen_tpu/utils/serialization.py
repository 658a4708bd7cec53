"""Per-env state blobs (reference get_state/set_state, vecgame.cpp:485-505).

The env state is a pytree of arrays with leading env axis; a per-env blob is
the concatenation of that env's leaves in deterministic (tree-flatten)
order, with a magic header and the reference's 0xCAFECAFE end marker.  The
heavy packing runs in the native codec (native/statecodec.cpp) when built,
with a NumPy fallback.

This provides the same capability surface as the reference's WriteBuffer
serialization (save/restore any env at any step, restore into a
differently-seeded env — tests/test_state.py).  Byte-level compatibility
with the C++ WriteBuffer layout is a non-goal; the pytree is the state of
record, and the native codec exposes the mt19937-text primitives needed to
bridge formats.
"""

from __future__ import annotations

import jax
import numpy as np

from . import native_codec

MAGIC = b"PGTPU001"
END_OF_BUFFER = 0xCAFECAFE  # vecgame.cpp:6


def states_to_bytes(states, num: int) -> list[bytes]:
    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(states)]
    return native_codec.pack_states(leaves, num)


def states_from_bytes(blobs: list[bytes], template):
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = [np.array(np.asarray(l)) for l in leaves]
    native_codec.unpack_states(blobs, new_leaves, len(blobs))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
