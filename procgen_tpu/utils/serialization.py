"""Per-env state blobs (reference get_state/set_state, vecgame.cpp:485-505).

The env state is a pytree of arrays with leading env axis; a per-env blob is
the concatenation of that env's leaves in deterministic (tree-flatten)
order, with a small header.  This gives the same capability surface as the
reference's WriteBuffer byte serialization (save/restore any env at any
step, restore into a differently-seeded env) — see tests/test_state.py.

Byte-level compatibility with the C++ WriteBuffer format is NOT a goal: the
reference serializes mt19937 as decimal text and per-entity field streams;
the pytree layout is the TPU-native state of record.
"""

from __future__ import annotations

import struct

import jax
import numpy as np

MAGIC = b"PGTPU001"
END_OF_BUFFER = 0xCAFECAFE  # vecgame.cpp:6


def states_to_bytes(states, num: int) -> list[bytes]:
    leaves = jax.tree_util.tree_leaves(states)
    out = []
    for i in range(num):
        parts = [MAGIC]
        for leaf in leaves:
            arr = np.asarray(leaf[i])
            raw = arr.tobytes()
            parts.append(struct.pack("<I", len(raw)))
            parts.append(raw)
        parts.append(struct.pack("<I", END_OF_BUFFER))
        out.append(b"".join(parts))
    return out


def states_from_bytes(blobs: list[bytes], template) -> "object":
    leaves, treedef = jax.tree_util.tree_flatten(template)
    new_leaves = [np.array(np.asarray(l)) for l in leaves]
    for i, blob in enumerate(blobs):
        assert blob[:8] == MAGIC, "bad state blob"
        off = 8
        for j, leaf in enumerate(new_leaves):
            (n,) = struct.unpack_from("<I", blob, off)
            off += 4
            arr = np.frombuffer(blob, dtype=leaf.dtype, count=n // leaf.dtype.itemsize, offset=off)
            off += n
            new_leaves[j][i] = arr.reshape(leaf.shape[1:])
        (marker,) = struct.unpack_from("<I", blob, off)
        assert marker == END_OF_BUFFER, "truncated state blob"
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
