"""Cellular-automata room generation (reference: procgen/src/roomgen.cpp).

Shared by jumper and caveflyer: CA smoothing, biggest-room extraction via
connected-component labeling, exact queue-order BFS pathfinding, and room
dilation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

i32 = jnp.int32


def ca_update(grid, wall_type: int, space_type: int, dim: int):
    """One CA iteration: wall if >=5 of the 3x3 neighborhood (incl. self and
    out-of-bounds) are walls (roomgen.cpp:21-36).  OOB counts as wall because
    out_of_bounds_object is the wall type during generation."""
    padded = jnp.pad(grid == wall_type, 1, constant_values=True).astype(i32)
    cnt = sum(
        padded[1 + dy : 1 + dy + dim, 1 + dx : 1 + dx + dim]
        for dy in (-1, 0, 1)
        for dx in (-1, 0, 1)
    )
    return jnp.where(cnt >= 5, wall_type, space_type)


def best_room_mask(grid, space_type: int, dim: int):
    """Biggest 4-connected SPACE component (roomgen.cpp:126-145).

    Label = min flat index per component; ``argmax(counts)`` returns the
    smallest such label among maximal rooms — identical to the C++ "first
    room found with strictly larger size" rule (rooms are discovered in
    ascending min-index order).
    """
    A = dim * dim
    gx = jnp.arange(dim)[None, :]
    gy = jnp.arange(dim)[:, None]
    space = grid == space_type
    idx2 = (gy * dim + gx).astype(i32)
    labels = jnp.where(space, idx2, A)

    def prop(carry):
        labels, _ = carry
        best = labels
        for dy, dx in ((-1, 0), (1, 0), (0, -1), (0, 1)):
            sh = jnp.pad(labels, 1, constant_values=A)[
                1 + dy : 1 + dy + dim, 1 + dx : 1 + dx + dim
            ]
            best = jnp.minimum(best, sh)
        best = jnp.where(space, best, A)
        return (best, jnp.any(best != labels))

    labels, _ = jax.lax.while_loop(
        lambda c: c[1], prop, (labels, jnp.asarray(True))
    )
    counts = jnp.zeros((A + 1,), i32).at[labels.reshape(-1)].add(
        space.reshape(-1).astype(i32)
    )
    best_label = jnp.argmax(counts[:A])
    return space & (labels == best_label)


def bfs_path_mask(grid, space_type: int, src, dst, dim: int):
    """Exact queue-order BFS + parent walk (roomgen.cpp:71-124): neighbor
    push order (-1,0),(0,-1),(0,1),(1,0) gives the C++-identical path."""
    A = dim * dim

    def gobj(cell):
        return grid[
            jnp.clip(cell // dim, 0, dim - 1), jnp.clip(cell % dim, 0, dim - 1)
        ]

    expanded0 = jnp.full((A,), -1, i32).at[0].set(src)
    parents0 = jnp.full((A,), -1, i32)
    covered0 = jnp.zeros((A,), bool)

    def cond(c):
        expanded, parents, covered, size, si = c
        return (si < size) & (expanded[jnp.clip(si, 0, A - 1)] != dst)

    def body(c):
        expanded, parents, covered, size, si = c
        cell = expanded[jnp.clip(si, 0, A - 1)]
        x = cell % dim
        y = cell // dim
        for dx, dy in ((-1, 0), (0, -1), (0, 1), (1, 0)):
            nx = x + dx
            ny = y + dy
            inb = (nx >= 0) & (nx < dim) & (ny >= 0) & (ny < dim)
            ncell = jnp.clip(ny * dim + nx, 0, A - 1)
            ok = inb & ~covered[ncell] & (gobj(ncell) == space_type)
            slot = jnp.clip(size, 0, A - 1)
            expanded = expanded.at[slot].set(
                jnp.where(ok & (size < A), ncell, expanded[slot])
            )
            parents = parents.at[slot].set(
                jnp.where(ok & (size < A), si, parents[slot])
            )
            covered = covered.at[ncell].set(covered[ncell] | ok)
            size = size + (ok & (size < A)).astype(i32)
        return (expanded, parents, covered, size, si + 1)

    expanded, parents, covered, size, si = jax.lax.while_loop(
        cond, body,
        (expanded0, parents0, covered0, jnp.asarray(1, i32), jnp.asarray(0, i32)),
    )

    found = expanded[jnp.clip(si, 0, A - 1)] == dst
    mask0 = jnp.zeros((A,), bool)

    def wcond(c):
        _, wi = c
        return wi >= 0

    def wbody(c):
        mask, wi = c
        cell = expanded[jnp.clip(wi, 0, A - 1)]
        mask = mask.at[cell].set(True)
        return (mask, parents[jnp.clip(wi, 0, A - 1)])

    mask, _ = jax.lax.while_loop(
        wcond, wbody, (mask0, jnp.where(found, si, -1))
    )
    return mask


def expand_mask(mask_flat, space_flat, n: int, dim: int):
    """expand_room(set, n) (roomgen.cpp:147-177): n rounds of 8-neighborhood
    dilation restricted to SPACE cells."""
    wide = mask_flat
    curr = mask_flat
    for _ in range(n):
        cm = curr.reshape(dim, dim)
        dil = jnp.zeros((dim, dim), bool)
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                if dy == 0 and dx == 0:
                    continue
                dil = dil | jnp.pad(cm, 1)[
                    1 - dy : 1 - dy + dim, 1 - dx : 1 - dx + dim
                ]
        newly = dil.reshape(-1) & space_flat & ~wide
        wide = wide | newly
        curr = newly
    return wide
