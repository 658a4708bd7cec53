"""Jumper: open-world platformer with double jump; carrot +10, spikes kill.

Reference: procgen/src/games/jumper.cpp.  Level gen: maze skeleton x3 scale
→ stochastic fill → 2 CA iterations → biggest room (connected-component
labeling) → exact BFS path (queue simulated cell-by-cell for C++-identical
parent order) → wide-path pruning → spikes and anti-wall fixes.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from ..core import rng
from ..core.constants import EASY_MODE, MEMORY_MODE, PLAYER, SPACE, TRAIL, WALL_OBJ
from ..core.entities import default_fields
from ..core.game import BasicAbstractGame, BasicState, tree_where
from ..levelgen import maze as mazegen
from ..levelgen import room as roomgen
from .registry import register

i32 = jnp.int32
f32 = jnp.float32

GOAL_REWARD = 10.0

GOAL = 1
SPIKE = 2
CAVEWALL = 6
CAVEWALL_TOP = 7
PLAYER_JUMP = 9
PLAYER_LEFT1 = 10
PLAYER_LEFT2 = 11
PLAYER_RIGHT1 = 12
PLAYER_RIGHT2 = 13

MAZE_SCALE = 3
JUMP_COOLDOWN = 3
NUM_WALL_THEMES = 4
PI = math.pi


def _is_wall(t):
    return (t == CAVEWALL) | (t == CAVEWALL_TOP)


@struct.dataclass
class JumperState:
    jump_count: jnp.ndarray
    jump_delta: jnp.ndarray
    jump_time: jnp.ndarray
    has_support: jnp.ndarray
    facing_right: jnp.ndarray
    wall_theme: jnp.ndarray


@register("jumper")
class Jumper(BasicAbstractGame):
    name = "jumper"
    ENT_CAP = 64  # agent + goal + spikes (~0.2 of ground cells)
    DECOR_CAP = 16  # movement trails, expire in 8 steps
    DISPATCH_VECTORIZED = True
    MAX_STEP_DRAWS = 4
    MAX_SUB_STEPS = 9  # |v| <= sqrt(.5^2 + 2^2)

    def __init__(self, options):
        super().__init__(options)
        mode = options.distribution_mode
        if mode == EASY_MODE:
            dim = 20
        elif mode == MEMORY_MODE:
            dim = 45
        else:
            dim = 40
        self.world_dim = dim
        self.WORLD_DIM_MAX = (dim, dim)
        if mode == MEMORY_MODE:
            self.timeout = 2000
        self.visibility = 12.0 if mode == EASY_MODE else 16.0
        self.compass_dim = 3.0 if mode == EASY_MODE else 2.0
        # out_of_bounds_object flips WALL_OBJ -> CAVEWALL during reset; the
        # steady-state value is CAVEWALL (jumper.cpp:378)
        self.out_of_bounds_object = CAVEWALL

    def background_names(self):
        from ..render.assets import PLATFORM_BACKGROUNDS

        return PLATFORM_BACKGROUNDS

    def asset_for_type(self, type_):
        # jumper.cpp:50-78
        if type_ == PLAYER:
            return ["misc_assets/bunny2_ready.png"]
        if type_ == SPIKE:
            return ["misc_assets/spikeMan_stand.png"]
        if type_ == GOAL:
            return ["misc_assets/carrot.png"]
        if type_ == PLAYER_JUMP:
            return ["misc_assets/bunny2_jump.png"]
        if type_ in (PLAYER_RIGHT1, PLAYER_LEFT1):
            return ["misc_assets/bunny2_walk1.png"]
        if type_ in (PLAYER_RIGHT2, PLAYER_LEFT2):
            return ["misc_assets/bunny2_walk2.png"]
        if type_ == CAVEWALL_TOP:
            return [
                "platformer/tileBlue_05.png",
                "platformer/tileGreen_05.png",
                "platformer/tileYellow_06.png",
                "platformer/tileBrown_06.png",
            ]
        if type_ == CAVEWALL:
            return [
                "platformer/tileBlue_08.png",
                "platformer/tileGreen_08.png",
                "platformer/tileYellow_09.png",
                "platformer/tileBrown_09.png",
            ]
        return []

    def use_block_asset(self, type_):
        return type_ in (CAVEWALL, CAVEWALL_TOP)

    def game_init_state(self):
        z = jnp.zeros((), i32)
        return JumperState(
            jump_count=z, jump_delta=z, jump_time=z,
            has_support=jnp.asarray(False), facing_right=jnp.asarray(True),
            wall_theme=z,
        )

    def choose_world_dim(self, s):
        d = jnp.asarray(self.world_dim, i32)
        return s.replace(main_width=d, main_height=d)

    # -- physics ------------------------------------------------------------

    def is_blocked(self, s, src_type, target_type, is_horizontal):
        b = super().is_blocked(s, src_type, target_type, is_horizontal)
        return b | ((src_type == PLAYER) & _is_wall(target_type))

    def update_agent_velocity(self, s):
        # jumper.cpp:96-102
        e = s.ents
        vx = (1 - s.mixrate) * e.vx[0] + s.mixrate * s.maxspeed * s.action_vx
        vy = jnp.where(
            s.action_vy != 0, s.maxspeed * s.action_vy * 2, e.vy[0]
        )
        return s.replace(ents=e.set_fields(0, vx=vx, vy=vy))

    def _can_support(self, t):
        return _is_wall(t) | (t == CAVEWALL)

    def set_action_xy(self, s, move_action):
        # jumper.cpp:389-423 (double jump with cooldown)
        avx = (move_action // 3 - 1).astype(f32)
        avy = jnp.maximum((move_action % 3 - 1).astype(f32), 0.0)
        g = s.game
        facing = jnp.where(avx > 0, True, jnp.where(avx < 0, False, g.facing_right))
        e = s.ents
        b1 = self.get_obj_from_floats(
            s, e.x[0] - (e.rx[0] - 0.01), e.y[0] - (e.ry[0] + 0.01)
        )
        b2 = self.get_obj_from_floats(
            s, e.x[0] + (e.rx[0] - 0.01), e.y[0] - (e.ry[0] + 0.01)
        )
        has_support = self._can_support(b1) | self._can_support(b2)
        jump_count = jnp.where(has_support, 2, g.jump_count)
        can_jump = (
            (avy == 1)
            & (jump_count > 0)
            & (s.cur_time - g.jump_time > JUMP_COOLDOWN)
        )
        jump_count = jnp.where(can_jump, jump_count - 1, jump_count)
        jump_delta = jnp.where(can_jump, -1, 0)
        avy = jnp.where(can_jump, 1.0, 0.0)
        jump_time = jnp.where(avy > 0, s.cur_time, g.jump_time)
        return s.replace(
            action_vx=avx,
            action_vy=avy,
            action_vrot=f32(0.0),
            game=g.replace(
                facing_right=facing,
                has_support=has_support,
                jump_count=jump_count,
                jump_delta=jump_delta,
                jump_time=jump_time,
            ),
        )

    def handle_agent_collision_vec(self, s, d, hit):
        # jumper.cpp:81-89
        e = s.ents
        goal = jnp.any(hit & (e.type == GOAL))
        spike = jnp.any(hit & (e.type == SPIKE))
        return s.replace(
            done=s.done | goal | spike,
            reward=s.reward + jnp.where(goal, f32(GOAL_REWARD), 0.0),
            level_complete=s.level_complete | goal,
        ), d

    # -- rendering ----------------------------------------------------------

    def theme_for_grid_obj(self, s, type_):
        return jnp.where(_is_wall(type_), s.game.wall_theme, 0)

    def image_for_type(self, s, type_):
        # jumper.cpp:120-135
        e = s.ents
        g = s.game
        standing = (jnp.abs(e.vx[0]) < 0.01) & (s.action_vx == 0) & g.has_support
        frame1 = ((s.cur_time // 5) % 2 == 0) | ~g.has_support
        right = jnp.where(frame1, PLAYER_RIGHT1, PLAYER_RIGHT2)
        left = jnp.where(frame1, PLAYER_LEFT1, PLAYER_LEFT2)
        moving = jnp.where(g.facing_right, right, left)
        player_img = jnp.where(standing, PLAYER, moving)
        return jnp.where(type_ == PLAYER, player_img, jnp.abs(type_))

    def render_overlay(self, s, obs, sx, sy, res, unit, vis):
        # compass + distance bar (jumper.cpp:137-169)
        if self.options.distribution_mode == MEMORY_MODE:
            return obs
        cd = self.compass_dim
        e = s.ents
        goal_slot = jnp.argmax(e.active & (e.type == GOAL))
        # compass circle (abs rect at view_dim - cd - .25, .25)
        x0 = (vis - cd - 0.25) * unit
        y0 = 0.25 * unit
        ccx = x0 + cd * unit / 2
        ccy = y0 + cd * unit / 2
        cr = cd * unit / 2
        dx2 = sx[None, :] - ccx
        dy2 = sy[:, None] - ccy
        rr = dx2 * dx2 + dy2 * dy2
        in_circle = rr < cr * cr
        clock = jnp.array([168, 166, 158], i32)
        obs = jnp.where(in_circle[:, :, None], clock[None, None, :], obs)

        # needle toward the goal
        theta = jnp.arctan2(e.y[goal_slot] - e.y[0], e.x[goal_slot] - e.x[0])
        nr = cr * 0.95
        ex = ccx + nr * jnp.cos(theta)
        ey = ccy - nr * jnp.sin(theta)
        # distance from pixel to the segment (ccx,ccy)-(ex,ey)
        vx_ = ex - ccx
        vy_ = ey - ccy
        seg_len2 = jnp.maximum(vx_ * vx_ + vy_ * vy_, 1e-6)
        t = jnp.clip((dx2 * vx_ + dy2 * vy_) / seg_len2, 0.0, 1.0)
        ddx = dx2 - t * vx_
        ddy = dy2 - t * vy_
        thick = res / (256.0 / cd) / 2
        on_needle = (ddx * ddx + ddy * ddy) < thick * thick
        hi = jnp.array([252, 186, 3], i32)
        obs = jnp.where(on_needle[:, :, None], hi[None, None, :], obs)

        # distance bar
        dist = jnp.sqrt(
            (e.x[0] - e.x[goal_slot]) ** 2 + (e.y[0] - e.y[goal_slot]) ** 2
        )
        dist_pct = dist / (s.main_width.astype(f32) * math.sqrt(2))
        bx0 = (vis - cd - 0.25) * unit
        by0 = (0.25 + cd) * unit
        bw = cd * dist_pct * unit
        bh = (cd / 8) * unit
        in_bar = (
            ((sy >= by0) & (sy < by0 + bh))[:, None]
            & ((sx >= bx0) & (sx < bx0 + bw))[None, :]
        )
        obs = jnp.where(in_bar[:, :, None], hi[None, None, :], obs)
        return obs

    # -- reset --------------------------------------------------------------

    def game_reset(self, s: BasicState) -> BasicState:
        s = self.game_reset_base(s)
        dim = self.world_dim
        A = dim * dim

        s, wall_theme = self.randn(s, NUM_WALL_THEMES)
        s = s.replace(
            visibility=f32(self.visibility),
            game=JumperState(
                jump_count=jnp.zeros((), i32),
                jump_delta=jnp.zeros((), i32),
                jump_time=jnp.zeros((), i32),
                has_support=jnp.asarray(False),
                facing_right=jnp.asarray(True),
                wall_theme=wall_theme,
            ),
        )

        # maze skeleton (jumper.cpp:242-256)
        maze_dim = dim // MAZE_SCALE
        g, mgrid, _, _, _ = mazegen.generate_maze_no_dead_ends(
            s.rand_gen, jnp.asarray(maze_dim, i32), maze_dim
        )
        adim = maze_dim + 2

        gx = jnp.arange(dim)[None, :]
        gy = jnp.arange(dim)[:, None]
        mx = gx // MAZE_SCALE + 1
        my = gy // MAZE_SCALE + 1
        mobj = mgrid[jnp.clip(my * adim + mx, 0, mgrid.shape[0] - 1)]
        prob = jnp.where(mobj == WALL_OBJ, 0.8, 0.2)
        g, rolls = rng.draw_n(g, A)
        r01 = rolls.astype(f32) * jnp.float32(2.0**-32)
        grid = jnp.where(r01.reshape(dim, dim) < prob, WALL_OBJ, SPACE)

        # 2 CA iterations (roomgen.cpp:21-36); OOB counts as WALL
        for _ in range(2):
            grid = roomgen.ca_update(grid, WALL_OBJ, SPACE, dim)

        # border (jumper.cpp:262-271)
        border = (
            (gx == 0) | (gx == dim - 1) | (gy == 0) | (gy == dim - 1)
        )
        grid = jnp.where(border, CAVEWALL, grid)

        # biggest room (roomgen.cpp:126-145)
        best_room = roomgen.best_room_mask(grid, SPACE, dim)
        grid = jnp.where(best_room, SPACE, CAVEWALL)

        # goal: choose_one(best_room cells ascending) (jumper.cpp:288)
        flat_room = best_room.reshape(-1)
        nroom = jnp.maximum(jnp.sum(flat_room).astype(i32), 1)
        g, r = rng.randn(g, nroom)
        ranks = jnp.cumsum(flat_room.astype(i32)) - 1
        goal_cell = jnp.argmax(flat_room & (ranks == r))

        # agent: random space-on-ground cell (jumper.cpp:292-304)
        def on_ground(grid):
            below = jnp.concatenate(
                [jnp.full((1, dim), CAVEWALL, i32), grid[:-1]]
            )
            above = jnp.concatenate([grid[1:], jnp.full((1, dim), CAVEWALL, i32)])
            return (
                (grid == SPACE)
                & (above == SPACE)
                & ((below == CAVEWALL) | (below == CAVEWALL))
            )

        ground = on_ground(grid).reshape(-1)
        nground = jnp.maximum(jnp.sum(ground).astype(i32), 1)
        g, ra = rng.randn(g, nground)
        granks = jnp.cumsum(ground.astype(i32)) - 1
        agent_cell = jnp.argmax(ground & (granks == ra))

        # exact BFS path agent -> goal (roomgen.cpp:71-124)
        path_mask = roomgen.bfs_path_mask(grid, SPACE, agent_cell, goal_cell, dim)

        if self.options.distribution_mode != MEMORY_MODE:
            wide = roomgen.expand_mask(
                path_mask, (grid == SPACE).reshape(-1), 4, dim
            )
            grid = jnp.where(wide.reshape(dim, dim), SPACE, CAVEWALL)

        # goal entity (jumper.cpp:325)
        f = default_fields(
            (goal_cell % dim).astype(f32) + 0.5,
            (goal_cell // dim).astype(f32) + 0.5,
            0.0, 0.0, 0.5, 0.5, GOAL,
        )
        s = s.replace(ents=s.ents.push(f))

        # spikes (jumper.cpp:326-337): the sweep MUTATES the grid as it
        # scans — a spike placed at x makes x+1/x+2 ineligible (SPIKE is
        # not SPACE), and the rand01 is drawn only for cells eligible at
        # that moment — so the pass must be sequential, not vectorized
        spike_prob = 0.0 if self.options.distribution_mode == MEMORY_MODE else 0.2

        def spike_body(carry, cell):
            g, grid = carry
            x = cell % dim
            y = cell // dim

            def gob(xx, yy):
                inb = (xx >= 0) & (xx < dim) & (yy >= 0) & (yy < dim)
                return jnp.where(
                    inb,
                    grid[jnp.clip(yy, 0, dim - 1), jnp.clip(xx, 0, dim - 1)],
                    CAVEWALL,
                )

            def sog(xx):
                # is_space_on_ground (jumper.cpp:183-190); below-the-floor
                # out-of-bounds reads satisfy the ground test either way
                return (
                    (gob(xx, y) == SPACE)
                    & (gob(xx, y + 1) == SPACE)
                    & ((gob(xx, y - 1) == CAVEWALL) | (y == 0))
                )

            elig = sog(x) & sog(x - 1) & sog(x + 1)
            g2, roll = rng.rand01(g)
            g = tree_where(elig, g2, g)
            place = elig & (roll < spike_prob)
            grid = grid.at[y, x].set(jnp.where(place, SPIKE, grid[y, x]))
            return (g, grid), None

        (g, grid), _ = jax.lax.scan(
            spike_body, (g, grid), jnp.arange(dim * dim, dtype=i32)
        )

        # anti-long-wall fixes (jumper.cpp:339-351): sequential, mutating
        def wall_body(carry, cell):
            g, grid = carry
            x = cell % dim
            y = cell // dim

            def gob(xx, yy):
                inb = (xx >= 0) & (xx < dim) & (yy >= 0) & (yy < dim)
                return jnp.where(
                    inb,
                    grid[jnp.clip(yy, 0, dim - 1), jnp.clip(xx, 0, dim - 1)],
                    CAVEWALL,
                )

            def is_lw(yy):
                return (gob(x, yy) == CAVEWALL) & (gob(x + 1, yy) == SPACE)

            def is_rw(yy):
                return (gob(x, yy) == CAVEWALL) & (gob(x - 1, yy) == SPACE)

            lw = is_lw(y) & is_lw(y + 1) & is_lw(y + 2)
            g2, r1 = rng.randn(g, 3)
            g = tree_where(lw, g2, g)
            yy1 = jnp.clip(y + r1, 0, dim - 1)
            grid = grid.at[yy1, x].set(jnp.where(lw, SPACE, grid[yy1, x]))

            rw = is_rw(y) & is_rw(y + 1) & is_rw(y + 2)
            g2, r2 = rng.randn(g, 3)
            g = tree_where(rw, g2, g)
            yy2 = jnp.clip(y + r2, 0, dim - 1)
            grid = grid.at[yy2, x].set(jnp.where(rw, SPACE, grid[yy2, x]))
            return (g, grid), None

        (g, grid), _ = jax.lax.scan(
            wall_body, (g, grid), jnp.arange(A)
        )

        # agent placement (jumper.cpp:353-355)
        s = s.replace(
            ents=s.ents.set_fields(
                0,
                x=(agent_cell % dim).astype(f32) + 0.5,
                y=(agent_cell // dim).astype(f32) + 0.4,
                rx=0.254,
                ry=0.4,
            )
        )

        # spike entities (ascending cell order, jumper.cpp:357-365)
        spikes = grid == SPIKE
        grid = jnp.where(spikes, SPACE, grid)
        recs, dos = [], []
        flat_sp = spikes.reshape(-1)
        spranks = jnp.cumsum(flat_sp.astype(i32)) - 1
        for k in range(self.ENT_CAP - 2):
            cell = jnp.argmax(flat_sp & (spranks == k))
            do = k < jnp.sum(flat_sp)
            sf = default_fields(
                (cell % dim).astype(f32) + 0.5,
                (cell // dim).astype(f32) + 0.4,
                0.0, 0.0, 0.23, 0.4, SPIKE,
            )
            recs.append(sf)
            dos.append(do)
        s = s.replace(
            ents=s.ents.push_many(
                {k2: jnp.stack([r[k2] for r in recs]) for k2 in recs[0]},
                jnp.stack(dos),
            )
        )

        # top-wall texturing (jumper.cpp:367-374)
        above = jnp.concatenate([grid[1:], jnp.full((1, dim), CAVEWALL, i32)])
        top_wall = (grid == CAVEWALL) & (above == SPACE)
        grid = jnp.where(top_wall, CAVEWALL_TOP, grid)

        return s.replace(grid=grid, rand_gen=g)

    # -- per-step -----------------------------------------------------------

    def game_step(self, s: BasicState, d):
        s, d = self.game_step_base(s, d)

        refl = jnp.where(
            s.action_vx > 0,
            False,
            jnp.where(s.action_vx < 0, True, s.ents.is_reflected[0]),
        )
        s = s.replace(ents=s.ents.set_fields(0, is_reflected=refl))

        # movement trail (jumper.cpp:432-436)
        e = s.ents
        moving = jnp.abs(e.vx[0]) + jnp.abs(e.vy[0]) > 0.05
        tf = default_fields(
            e.x[0], e.y[0] - e.ry[0] * 0.5, 0.0, 0.01, 0.3, 0.2, TRAIL
        )
        tf["expire_time"] = 8
        tf["alpha"] = 0.5
        s = s.replace(decor=s.decor.push(tf, do=moving))

        # gravity applied post-move (jumper.cpp:438-440)
        vy = jnp.where(e.vy[0] > -2, e.vy[0] - 0.15, e.vy[0])
        s = s.replace(ents=s.ents.set_fields(0, vy=vy))
        return s, d
