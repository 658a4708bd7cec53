"""Kruskal maze generation (reference: procgen/src/mazegen.cpp).

Exact draw-order translation: the C++ loop picks ``randn(walls.size())``
every iteration and erases that wall whether or not it is removed, so the
total draw count equals the wall count and the loop becomes a bounded
``fori_loop``.  Union-find sets are represented purely by the
``cell_sets_idxs`` array (set identity per cell); merging rewrites ids
vectorised, exactly matching mazegen.cpp:112-188.

The maze grid uses dynamic stride ``array_dim = maze_dim + 2`` over a static
``(MDIM_MAX+2)^2`` buffer, mirroring the reference's flat Grid indexing.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.constants import SPACE, WALL_OBJ
from ..core.game import tree_where

i32 = jnp.int32

MAZE_OFFSET = 1  # mazegen.h:14


def _wall_candidates(mdim_max: int):
    """Static wall list in exact C++ construction order (mazegen.cpp:135-149),
    with per-wall validity predicates as functions of the traced maze_dim."""
    walls = []  # (x1, y1, x2, y2, kind) kind 0 = first loop, 1 = second
    for i in range(1, mdim_max, 2):
        for j in range(0, mdim_max, 2):
            walls.append((i - 1, j, i + 1, j, 0, i, j))
    for i in range(0, mdim_max, 2):
        for j in range(1, mdim_max, 2):
            walls.append((i, j - 1, i, j + 1, 1, i, j))
    return walls


def generate_maze(g: rng.MTState, maze_dim, mdim_max: int):
    """Returns (g, grid, free_cells, num_free, in_free).

    grid: i32[(mdim_max+2)^2] flat with dynamic stride array_dim.
    free_cells / in_free: the carved-cell bookkeeping used by place_objects.
    """
    adim_max = mdim_max + 2
    array_dim = maze_dim + 2
    mcells = mdim_max * mdim_max

    grid = jnp.full((adim_max * adim_max,), WALL_OBJ, i32)
    grid = grid.at[MAZE_OFFSET * array_dim + MAZE_OFFSET].set(0)  # cpp:119

    idxs = jnp.arange(mcells, dtype=i32)  # cell_sets_idxs (cpp:124-133)
    free_cells = jnp.zeros((mcells,), i32)
    in_free = jnp.zeros((mcells,), bool)
    num_free = jnp.zeros((), i32)

    cands = _wall_candidates(mdim_max)
    cx1 = jnp.array([c[0] for c in cands], i32)
    cy1 = jnp.array([c[1] for c in cands], i32)
    cx2 = jnp.array([c[2] for c in cands], i32)
    cy2 = jnp.array([c[3] for c in cands], i32)
    kind = jnp.array([c[4] for c in cands], i32)
    ci = jnp.array([c[5] for c in cands], i32)
    cj = jnp.array([c[6] for c in cands], i32)

    valid = jnp.where(
        kind == 0,
        (ci < maze_dim - 1) & (cj < maze_dim),
        (ci < maze_dim) & (cj < maze_dim - 1),
    )
    # stable compaction keeps C++ ordering among valid walls
    perm = jnp.argsort(~valid, stable=True)
    wx1, wy1, wx2, wy2 = cx1[perm], cy1[perm], cx2[perm], cy2[perm]
    wall_count = jnp.sum(valid).astype(i32)
    w_static = len(cands)

    def body(t, carry):
        g, grid, idxs, free_cells, in_free, num_free, alive = carry
        live = t < wall_count
        remaining = wall_count - t

        g2, n = rng.randn(g, remaining)
        g = tree_where(live, g2, g)

        # select the n-th alive wall in original order, then kill it
        ranks = jnp.cumsum(alive.astype(i32)) - 1
        sel = alive & (ranks == n)
        widx = jnp.argmax(sel)
        alive = alive & ~sel

        x1, y1 = wx1[widx], wy1[widx]
        x2, y2 = wx2[widx], wy2[widx]
        s0_idx = idxs[maze_dim * y1 + x1]
        s1_idx = idxs[maze_dim * y2 + x2]
        x0 = (x1 + x2) // 2
        y0 = (y1 + y2) // 2
        center = maze_dim * y0 + x0

        gpos = (y0 + MAZE_OFFSET) * array_dim + (x0 + MAZE_OFFSET)
        can_remove = live & (grid[gpos] == WALL_OBJ) & (s0_idx != s1_idx)

        # set_free_cell for (x1,y1), (x0,y0), (x2,y2) — sequential (cpp:27-36)
        for cx, cy in ((x1, y1), (x0, y0), (x2, y2)):
            gp = (cy + MAZE_OFFSET) * array_dim + (cx + MAZE_OFFSET)
            grid = grid.at[gp].set(jnp.where(can_remove, SPACE, grid[gp]))
            cell = maze_dim * cy + cx
            isnew = can_remove & ~in_free[cell]
            free_cells = free_cells.at[num_free].set(
                jnp.where(isnew, cell, free_cells[num_free])
            )
            in_free = in_free.at[cell].set(in_free[cell] | isnew)
            num_free = num_free + isnew.astype(i32)

        # merge s0 into s1 (+ center) — cpp:170-177
        idxs = jnp.where(can_remove & (idxs == s0_idx), s1_idx, idxs)
        idxs = idxs.at[center].set(jnp.where(can_remove, s1_idx, idxs[center]))

        return (g, grid, idxs, free_cells, in_free, num_free, alive)

    alive0 = jnp.arange(w_static) < wall_count
    g, grid, idxs, free_cells, in_free, num_free, _ = jax.lax.fori_loop(
        0, w_static, body,
        (g, grid, idxs, free_cells, in_free, num_free, alive0),
    )
    return g, grid, free_cells, num_free, in_free


def generate_maze_no_dead_ends(g: rng.MTState, maze_dim, mdim_max: int):
    """mazegen.cpp:190-211: open a random wall at every dead end, in
    ascending cell order (later cells see earlier fixes)."""
    g, grid, free_cells, num_free, in_free = generate_maze(g, maze_dim, mdim_max)
    adim_max = mdim_max + 2
    array_dim = maze_dim + 2

    # neighbor order matches get_neighbors (mazegen.cpp:50-69)
    offs = ((-1, 0), (0, -1), (0, 1), (1, 0))

    def body(i, carry):
        g, grid = carry
        x = i % array_dim
        y = i // array_dim
        interior = (x > 0) & (x < array_dim - 1) & (y > 0) & (y < array_dim - 1)
        obj = jnp.where(interior, grid[jnp.clip(i, 0, grid.shape[0] - 1)], -1)

        n_idx = []
        n_obj = []
        for dx, dy in offs:
            nx = x + dx
            ny = y + dy
            ni = jnp.clip(ny * array_dim + nx, 0, grid.shape[0] - 1)
            n_interior = (
                (nx > 0) & (nx < array_dim - 1) & (ny > 0) & (ny < array_dim - 1)
            )
            n_idx.append(ni)
            n_obj.append(jnp.where(n_interior, grid[ni], -1))
        n_idx = jnp.stack(n_idx)
        n_obj = jnp.stack(n_obj)

        n_space = jnp.sum(n_obj == SPACE)
        wall_mask = n_obj == WALL_OBJ
        n_wall = jnp.sum(wall_mask)
        fix = (obj == SPACE) & (n_space == 1) & (n_wall > 0) & (i < array_dim * array_dim)

        g2, r = rng.randn(g, jnp.maximum(n_wall, 1))
        g = tree_where(fix, g2, g)
        ranks = jnp.cumsum(wall_mask.astype(jnp.int32)) - 1
        sel = jnp.argmax(wall_mask & (ranks == r))
        tgt = n_idx[sel]
        grid = grid.at[tgt].set(jnp.where(fix, SPACE, grid[tgt]))
        return (g, grid)

    g, grid = jax.lax.fori_loop(0, adim_max * adim_max, body, (g, grid))
    return g, grid, free_cells, num_free, in_free


def place_objects(g, grid, free_cells, num_free, maze_dim, mdim_max: int,
                  start_obj: int, num_objs: int):
    """mazegen.cpp:292-306 — scatter objects on distinct carved cells,
    excluding the agent corner cell (stored cell id 0)."""
    array_dim = maze_dim + 2

    for j in range(num_objs):
        g, m = rng.randn(g, num_free)

        def cond(carry):
            g, m = carry
            v = free_cells[m]
            return (v == -1) | (v == 0)

        def body(carry):
            g, m = carry
            return rng.randn(g, num_free)

        g, m = jax.lax.while_loop(cond, body, (g, m))
        cell = free_cells[m]
        free_cells = free_cells.at[m].set(-1)
        gp = (cell // maze_dim + MAZE_OFFSET) * array_dim + (
            cell % maze_dim + MAZE_OFFSET
        )
        grid = grid.at[gp].set(start_obj + j)

    return g, grid, free_cells
