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

    # every live iteration draws exactly once (walls.erase consumes a draw
    # whether or not the wall is removed, mazegen.cpp:151-186), so the whole
    # sequence comes from one upfront block — no per-iteration twist.
    assert w_static <= rng.N, "wall list exceeds one MT block"
    g, wall_draws = rng.draw_n(g, w_static, wall_count)

    def body(t, carry):
        grid, idxs, free_cells, in_free, num_free, alive = carry
        live = t < wall_count
        remaining = wall_count - t
        n = rng._randn_from(wall_draws[t], remaining)

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

        return (grid, idxs, free_cells, in_free, num_free, alive)

    alive0 = jnp.arange(w_static) < wall_count
    grid, idxs, free_cells, in_free, num_free, _ = jax.lax.fori_loop(
        0, w_static, body,
        (grid, idxs, free_cells, in_free, num_free, alive0),
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

    # one draw per dead end, consumed from an upfront block (dead ends are a
    # strict subset of carved cells, always < one MT block)
    _, de_draws = rng.draw_n(g, rng.N, jnp.zeros((), i32))

    def body(i, carry):
        grid, cursor = carry
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

        r = rng._randn_from(
            de_draws[jnp.clip(cursor, 0, rng.N - 1)], jnp.maximum(n_wall, 1)
        )
        cursor = cursor + fix.astype(i32)
        ranks = jnp.cumsum(wall_mask.astype(jnp.int32)) - 1
        sel = jnp.argmax(wall_mask & (ranks == r))
        tgt = n_idx[sel]
        grid = grid.at[tgt].set(jnp.where(fix, SPACE, grid[tgt]))
        return (grid, cursor)

    grid, cursor = jax.lax.fori_loop(
        0, adim_max * adim_max, body, (grid, jnp.zeros((), i32))
    )
    g, _ = rng.draw_n(g, rng.N, cursor)  # advance by the consumed count
    return g, grid, free_cells, num_free, in_free


def _expand_to_type(grid, s0, s1, target_type, interior, space, array_dim,
                    do):
    """mazegen.cpp:72-101: BFS from s0 over SPACE, accumulating s1, stopping
    at the first frontier cell (ascending order) with a target-type
    neighbor; returns (s1, found_idx or -1).

    The C++ early-return mid-iteration means frontier cells after the hit do
    NOT contribute neighbors — reproduced via the prefix mask.
    """
    import jax.numpy as jnp

    A = s0.shape[0]
    idxs = jnp.arange(A)
    tmask = (grid == target_type) & interior

    def rolls(m):
        return (
            jnp.roll(m, 1),
            jnp.roll(m, array_dim),
            jnp.roll(m, -array_dim),
            jnp.roll(m, -1),
        )  # neighbor order: left (i-1), up (i-adim), down (i+adim), right

    t_l, t_u, t_d, t_r = rolls(tmask)
    has_t = t_l | t_u | t_d | t_r

    def cond(carry):
        _, _, _, _, stop = carry
        return ~stop

    def body(carry):
        curr, s0_, s1, found, stop = carry
        hit = curr & has_t
        any_hit = jnp.any(hit)
        first = jnp.argmax(hit)
        processed = jnp.where(any_hit, curr & (idxs <= first), curr)
        # dilation: cells adjacent to a processed cell
        dil = (
            jnp.roll(processed, -1)
            | jnp.roll(processed, -array_dim)
            | jnp.roll(processed, array_dim)
            | jnp.roll(processed, 1)
        )
        newly = dil & space & ~s0_ & ~s1
        s1 = s1 | newly
        # found = first target neighbor of `first`, in adjacency order
        nb = jnp.stack(
            [first - 1, first - array_dim, first + array_dim, first + 1]
        )
        nb_c = jnp.clip(nb, 0, A - 1)
        nb_t = tmask[nb_c]
        sel = jnp.argmax(nb_t)
        found = jnp.where(any_hit & (found < 0), nb_c[sel], found)
        curr = newly
        stop = any_hit | ~jnp.any(newly)
        return (curr, s0_, s1, found, stop)

    curr0 = s0
    stop0 = ~jnp.asarray(do, bool)
    _, _, s1, found, _ = jax.lax.while_loop(
        cond, body, (curr0, s0, s1, jnp.asarray(-1, jnp.int32), stop0)
    )
    return s1, found


def generate_maze_with_doors(g: rng.MTState, maze_dim, mdim_max: int,
                             num_doors):
    """mazegen.cpp:213-290: doors at forks, BFS-expanding reachable regions,
    one key per door, exit last.  Returns (g, grid, actual_num_doors)."""
    from ..core.constants import AGENT_OBJ, DOOR_OBJ, EXIT_OBJ, KEY_OBJ

    g, grid, _, _, _ = generate_maze(g, maze_dim, mdim_max)
    adim_max = mdim_max + 2
    array_dim = maze_dim + 2
    A = adim_max * adim_max
    idxs = jnp.arange(A)
    x = idxs % array_dim
    y = idxs // array_dim
    interior = (
        (x > 0) & (x < array_dim - 1) & (y > 0) & (y < array_dim - 1)
        & (idxs < array_dim * array_dim)
    )

    def nb_count(m):
        return (
            jnp.roll(m, 1).astype(i32)
            + jnp.roll(m, -1).astype(i32)
            + jnp.roll(m, array_dim).astype(i32)
            + jnp.roll(m, -array_dim).astype(i32)
        )

    space = (grid == SPACE) & interior
    forks = space & (nb_count(space) > 2)
    fsize = jnp.sum(forks).astype(i32)

    # choose_n(forks, num_doors) (randgen.cpp:49-68): when the pool is
    # smaller than n, everything is taken without draws
    take_all = num_doors > fsize
    alive = forks
    chosen = jnp.zeros_like(forks)
    for j in range(3):
        do = ~take_all & (j < num_doors)
        cnt = jnp.sum(alive).astype(i32)
        g2, r = rng.randn(g, jnp.maximum(cnt, 1))
        g = tree_where(do, g2, g)
        ranks = jnp.cumsum(alive.astype(i32)) - 1
        pick = jnp.argmax(alive & (ranks == r))
        chosen = chosen.at[pick].set(chosen[pick] | do)
        alive = alive.at[pick].set(alive[pick] & ~do)
    chosen = jnp.where(take_all, forks, chosen)
    actual_doors = jnp.where(take_all, fsize, num_doors)
    grid = jnp.where(chosen, DOOR_OBJ, grid)

    # agent cell: random SPACE cell not adjacent to a door (cpp:245-258)
    space2 = (grid == SPACE) & interior
    cnt2 = jnp.maximum(jnp.sum(space2).astype(i32), 1)
    ranks2 = jnp.cumsum(space2.astype(i32)) - 1
    door_mask = (grid == DOOR_OBJ) & interior
    door_adj = nb_count(door_mask) > 0

    def draw_cell(g):
        g, r = rng.randn(g, cnt2)
        return g, jnp.argmax(space2 & (ranks2 == r))

    g, cell = draw_cell(g)

    def cond(c):
        return door_adj[c[1]]

    def body(c):
        return draw_cell(c[0])

    g, agent_cell = jax.lax.while_loop(cond, body, (g, cell))
    grid = grid.at[agent_cell].set(AGENT_OBJ)

    # per-door expansion: recolor the found door, place its key; exit last
    s0 = jnp.zeros((A,), bool).at[agent_cell].set(True)
    for door_num in range(4):  # num_doors <= 3, +1 exit round
        it_on = door_num < actual_doors + 1
        do_door = door_num < actual_doors
        space_cur = (grid == SPACE) & interior
        s1 = jnp.zeros((A,), bool)
        s1, found = _expand_to_type(
            grid, s0, s1, DOOR_OBJ, interior, space_cur, array_dim, do_door
        )
        ok_found = do_door & (found >= 0)
        grid = grid.at[jnp.maximum(found, 0)].set(
            jnp.where(ok_found, DOOR_OBJ + door_num + 1,
                      grid[jnp.maximum(found, 0)])
        )
        s0 = s0 | (s1 & do_door)

        space_cur = (grid == SPACE) & interior
        s1, _ = _expand_to_type(
            grid, s0, s1, -999, interior, space_cur, array_dim, it_on
        )

        cnt1 = jnp.maximum(jnp.sum(s1).astype(i32), 1)
        g2, r1 = rng.randn(g, cnt1)
        g = tree_where(it_on, g2, g)
        ranks1 = jnp.cumsum(s1.astype(i32)) - 1
        key_cell = jnp.argmax(s1 & (ranks1 == r1))
        val = jnp.where(
            door_num == actual_doors, EXIT_OBJ, KEY_OBJ + door_num + 1
        )
        grid = grid.at[key_cell].set(
            jnp.where(it_on, val, grid[key_cell])
        )
        s0 = s0 | (s1 & it_on)
        s0 = s0.at[jnp.maximum(found, 0)].set(
            s0[jnp.maximum(found, 0)] | ok_found
        )

    return g, grid, actual_doors


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
