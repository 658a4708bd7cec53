"""Miner (BoulderDash): dig dirt, collect diamonds (+1), exit when all
collected (+10); falling boulders kill.  Reference: procgen/src/games/miner.cpp.

The cell-automata gravity sweep is order-exact: cells process in ascending
(y, x) order split around the agent's row (objects at/below the agent move
before the agent, those above move after — miner.cpp:246-249), as one
``lax.scan`` over cells whose body is the full move_cell dispatch, including
the C++ operator-precedence quirk that lets boulders cascade within a sweep.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import rng
from ..core.constants import EASY_MODE, HARD_MODE, MEMORY_MODE, PLAYER, SPACE
from ..core.entities import default_fields
from ..core.game import BasicAbstractGame, BasicState, tree_where
from .registry import register

i32 = jnp.int32
f32 = jnp.float32

COMPLETION_BONUS = 10.0
DIAMOND_REWARD = 1.0

BOULDER = 1
DIAMOND = 2
MOVING_BOULDER = 3
MOVING_DIAMOND = 4
ENEMY = 5
EXIT = 6
DIRT = 9
MUD = 11
DEAD_PLAYER = 12
OOB_WALL = 10


def _stationary(t):
    return jnp.where(
        t == MOVING_DIAMOND, DIAMOND, jnp.where(t == MOVING_BOULDER, BOULDER, t)
    )


def _moving(t):
    return jnp.where(
        t == DIAMOND, MOVING_DIAMOND, jnp.where(t == BOULDER, MOVING_BOULDER, t)
    )


def _is_moving(t):
    return (t == MOVING_BOULDER) | (t == MOVING_DIAMOND)


def _is_round(t):
    return (
        (t == BOULDER) | (t == MOVING_BOULDER) | (t == DIAMOND) | (t == MOVING_DIAMOND)
    )


@struct.dataclass
class MinerState:
    diamonds_remaining: jnp.ndarray
    died: jnp.ndarray


@register("miner")
class Miner(BasicAbstractGame):
    name = "miner"
    ENT_CAP = 2  # agent + exit
    ENT_Z_LEVELS = (-1, 0, 1)  # exit renders under the grid (render_z=-1)
    DISPATCH_VECTORIZED = True  # handlers commute (exit bonus, enemy death)
    MAX_STEP_DRAWS = 4
    MAX_SUB_STEPS = 1  # grid_step

    def __init__(self, options):
        super().__init__(options)
        self.mixrate = 0.5
        self.maxspeed = 0.5
        self.has_useful_vel_info = False
        self.out_of_bounds_object = OOB_WALL
        self.visibility = 8.0
        self.grid_step = True
        self.center_agent = options.distribution_mode == MEMORY_MODE

        mode = options.distribution_mode
        if mode == EASY_MODE:
            dim = 10
        elif mode == HARD_MODE:
            dim = 20
        elif mode == MEMORY_MODE:
            dim = 35
        else:
            raise ValueError(f"miner does not support distribution_mode {mode}")
        self.world_dim = dim
        self.WORLD_DIM_MAX = (dim, dim)

    def background_names(self):
        from ..render.assets import CAVES

        return CAVES

    def asset_for_type(self, type_):
        # miner.cpp:47-66
        return {
            PLAYER: ["misc_assets/robot_greenDrive1.png"],
            DEAD_PLAYER: ["misc_assets/fire_1.png"],
            BOULDER: ["misc_assets/elementStone007.png"],
            DIAMOND: ["misc_assets/gemBlue.png"],
            EXIT: ["misc_assets/window.png"],
            DIRT: ["misc_assets/dirt.png"],
            MUD: ["misc_assets/mud.png"],
            OOB_WALL: ["misc_assets/tile_bricksGrey.png"],
        }.get(type_, [])

    def game_init_state(self):
        return MinerState(
            diamonds_remaining=jnp.asarray(-1, i32), died=jnp.asarray(False)
        )

    def choose_world_dim(self, s):
        d = jnp.asarray(self.world_dim, i32)
        return s.replace(main_width=d, main_height=d)

    # -- physics hooks ------------------------------------------------------

    def is_blocked(self, s, src_type, target_type, is_horizontal):
        b = super().is_blocked(s, src_type, target_type, is_horizontal)
        return b | (
            (src_type == PLAYER)
            & (
                (target_type == BOULDER)
                | (target_type == MOVING_BOULDER)
                | (target_type == OOB_WALL)
            )
        )

    def will_reflect(self, src_type, target_type):
        return (src_type == ENEMY) & (
            (target_type == BOULDER)
            | (target_type == DIAMOND)
            | (target_type == MOVING_BOULDER)
            | (target_type == MOVING_DIAMOND)
            | (target_type == self.out_of_bounds_object)
        )

    def set_action_xy(self, s, move_action):
        s = super().set_action_xy(s, move_action)
        return s.replace(action_vy=jnp.where(s.action_vx != 0, 0.0, s.action_vy))

    def handle_agent_collision_vec(self, s, d, hit):
        # miner.cpp:84-95
        e = s.ents
        enemy = jnp.any(hit & (e.type == ENEMY))
        exit_done = jnp.any(hit & (e.type == EXIT)) & (
            s.game.diamonds_remaining == 0
        )
        return s.replace(
            done=s.done | enemy | exit_done,
            reward=s.reward + jnp.where(exit_done, f32(COMPLETION_BONUS), 0.0),
            level_complete=s.level_complete | exit_done,
        ), d

    def image_for_type(self, s, type_):
        out = jnp.abs(type_)
        out = jnp.where(type_ == MOVING_BOULDER, BOULDER, out)
        out = jnp.where(type_ == MOVING_DIAMOND, DIAMOND, out)
        return out

    def should_draw_entity_mask(self, s):
        m = jnp.ones((self.ENT_CAP,), bool)
        return m.at[0].set(~s.game.died)

    # -- reset --------------------------------------------------------------

    def game_reset(self, s: BasicState) -> BasicState:
        s = self.game_reset_base(s)
        dim = self.world_dim
        area = dim * dim

        s = s.replace(
            ents=s.ents.set_fields(0, rx=0.5, ry=0.5),
            game=MinerState(
                diamonds_remaining=jnp.asarray(-1, i32), died=jnp.asarray(False)
            ),
        )

        num_diamonds = int(12 / 400.0 * area)
        num_boulders = int(80 / 400.0 * area)
        num_mud = int(12 / 400.0 * area)
        k = num_diamonds + num_boulders + num_mud + 1

        # simple_choose(main_area, k): rejection-sampled distinct cells
        # (randgen.cpp:70-88)
        def pick(carry, _):
            g, taken = carry
            g, v = rng.randn(g, area)

            def cond(c):
                return taken[c[1]]

            def body(c):
                return rng.randn(c[0], area)

            g, v = jax.lax.while_loop(cond, body, (g, v))
            taken = taken.at[v].set(True)
            return (g, taken), v

        (g, _), picks = jax.lax.scan(
            pick, (s.rand_gen, jnp.zeros((area,), bool)), None, length=k
        )
        s = s.replace(rand_gen=g)

        agent_cell = picks[0]
        ax = agent_cell % dim
        ay = agent_cell // dim
        s = s.replace(
            ents=s.ents.set_fields(
                0, x=ax.astype(f32) + 0.5, y=ay.astype(f32) + 0.5
            )
        )

        # all DIRT, then scatter diamonds/boulders/mud (miner.cpp:168-188)
        grid = jnp.full((dim, dim), DIRT, i32)
        vals = jnp.concatenate(
            [
                jnp.full((num_diamonds,), DIAMOND, i32),
                jnp.full((num_boulders,), BOULDER, i32),
                jnp.full((num_mud,), MUD, i32),
            ]
        )
        cells = picks[1:]
        grid = grid.at[cells // dim, cells % dim].set(vals)

        stale_dirt = grid == DIRT  # dirt_cells snapshot (miner.cpp:190)

        grid = grid.at[ay, ax].set(SPACE)
        # clear boulders in the agent's 3x3 neighbourhood (miner.cpp:196-203)
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                ox = ax + di
                oy = ay + dj
                inb = (ox >= 0) & (ox < dim) & (oy >= 0) & (oy < dim)
                oxc = jnp.clip(ox, 0, dim - 1)
                oyc = jnp.clip(oy, 0, dim - 1)
                hit = inb & (grid[oyc, oxc] == BOULDER)
                grid = grid.at[oyc, oxc].set(jnp.where(hit, DIRT, grid[oyc, oxc]))

        # exit: random stale-dirt cell whose above is DIRT or out-of-bounds
        # (checked against the *updated* grid, miner.cpp:205-218)
        above = jnp.concatenate([grid[1:], jnp.full((1, dim), OOB_WALL, i32)])
        cand = stale_dirt & ((above == DIRT) | (above == OOB_WALL))
        cand_flat = cand.reshape(-1)
        count = jnp.sum(cand_flat).astype(i32)
        g, r = rng.randn(s.rand_gen, count)
        s = s.replace(rand_gen=g)
        ranks = jnp.cumsum(cand_flat.astype(i32)) - 1
        exit_cell = jnp.argmax(cand_flat & (ranks == r))
        ex = exit_cell % dim
        ey = exit_cell // dim
        grid = grid.at[ey, ex].set(SPACE)
        f = default_fields(
            ex.astype(f32) + 0.5, ey.astype(f32) + 0.5, 0.0, 0.0, 0.5, 0.5, EXIT
        )
        f["render_z"] = -1
        return s.replace(grid=grid, ents=s.ents.push(f))

    # -- CA gravity sweep ---------------------------------------------------

    def _move_cells(self, s: BasicState, carry, y_lo, y_hi):
        """move_cell over cells with y in [y_lo, y_hi), ascending (y, x)
        (miner.cpp:296-346).  carry = (grid, has_moved, died)."""
        dim = self.world_dim
        agent_idx = self.get_agent_index(s)

        def body(carry, cell):
            grid, has_moved, died = carry
            y = cell // dim
            x = cell % dim
            in_band = (y >= y_lo) & (y < y_hi)

            def gobj(idx):
                inb = (idx >= 0) & (idx < dim * dim)
                idxc = jnp.clip(idx, 0, dim * dim - 1)
                return jnp.where(
                    inb, grid[idxc // dim, idxc % dim], OOB_WALL
                )

            def setg(grid, idx, v, do):
                idxc = jnp.clip(idx, 0, dim * dim - 1)
                cur = grid[idxc // dim, idxc % dim]
                return grid.at[idxc // dim, idxc % dim].set(
                    jnp.where(do, v, cur)
                )

            idx = cell
            obj = gobj(idx)
            stat = _stationary(obj)
            moved = has_moved[idx]
            # C++ precedence quirk: boulders ignore has_moved (miner.cpp:307)
            active = in_band & (
                (stat == BOULDER) | ((stat == DIAMOND) & ~moved)
            )

            below = idx - dim
            below_obj = gobj(below)
            agent_below = agent_idx == below

            def is_free(i2):
                return (gobj(i2) == SPACE) & (agent_idx != i2)

            # 1) fall
            fall = active & (below_obj == SPACE) & ~agent_below
            two_below = gobj(below - dim)
            fall_type = jnp.where(two_below == SPACE, _moving(obj), stat)
            # 2) crush the agent
            crush = active & agent_below & _is_moving(obj)
            # 3) roll left / 4) roll right
            roll_base = active & ~fall & ~crush & _is_round(below_obj)
            roll_l = roll_base & (x > 0) & is_free(idx - 1) & is_free(idx - dim - 1)
            roll_r = (
                roll_base
                & ~roll_l
                & (x < dim - 1)
                & is_free(idx + 1)
                & is_free(idx - dim + 1)
            )
            # 5) settle
            settle = active & ~fall & ~crush & ~roll_l & ~roll_r

            grid = setg(grid, idx, SPACE, fall | roll_l | roll_r)
            grid = setg(grid, below, fall_type, fall)
            grid = setg(grid, below, DEAD_PLAYER, crush)
            grid = setg(grid, idx - 1, stat, roll_l)
            grid = setg(grid, idx + 1, stat, roll_r)
            grid = setg(grid, idx, stat, settle)

            has_moved = has_moved.at[jnp.clip(below, 0, dim * dim - 1)].set(
                has_moved[jnp.clip(below, 0, dim * dim - 1)] | fall
            )
            has_moved = has_moved.at[jnp.clip(idx - 1, 0, dim * dim - 1)].set(
                has_moved[jnp.clip(idx - 1, 0, dim * dim - 1)] | roll_l
            )
            has_moved = has_moved.at[jnp.clip(idx + 1, 0, dim * dim - 1)].set(
                has_moved[jnp.clip(idx + 1, 0, dim * dim - 1)] | roll_r
            )
            died = died | crush
            return (grid, has_moved, died), None

        carry, _ = jax.lax.scan(body, carry, jnp.arange(dim * dim))
        return carry

    def game_step(self, s: BasicState, d):
        dim = self.world_dim
        has_moved = jnp.zeros((dim * dim,), bool)
        agent_y = s.ents.y[0]

        # phase 1: cells with y <= agent.y (miner.cpp:246-250)
        y_hi1 = jnp.floor(agent_y).astype(i32) + 1  # y <= agent->y over ints
        (grid, has_moved, died1) = self._move_cells(
            s, (s.grid, has_moved, s.game.died), 0, y_hi1
        )
        s = s.replace(grid=grid, game=s.game.replace(died=died1))

        pre_agent = {
            k: getattr(s.ents, k)[0] for k in ("x", "y", "vx", "vy")
        }
        s, d = self.game_step_base(s, d)
        died = s.game.died

        # C++ returns right after the base step when died (miner.cpp:253-256):
        # the agent was erased, so undo its movement and stop here.
        s_dead = s.replace(
            ents=s.ents.set_fields(0, **pre_agent),
            done=jnp.asarray(True),
        )

        # live path continues:
        refl = jnp.where(
            s.action_vx > 0,
            False,
            jnp.where(s.action_vx < 0, True, s.ents.is_reflected[0]),
        )
        s = s.replace(ents=s.ents.set_fields(0, is_reflected=refl))

        s, has_moved = self._handle_push2(s, has_moved)

        ix = s.ents.x[0].astype(i32)
        iy = s.ents.y[0].astype(i32)
        agent_obj = _stationary(self.get_obj(s, ix, iy))
        got_diamond = agent_obj == DIAMOND
        digs = (agent_obj == DIRT) | (agent_obj == MUD) | got_diamond
        s = s.replace(
            reward=s.reward + jnp.where(got_diamond, f32(DIAMOND_REWARD), 0.0),
            grid=jnp.where(digs, self.set_obj(s, ix, iy, SPACE).grid, s.grid),
        )

        # phase 2: cells with y > agent.y (miner.cpp:267-271)
        y_lo2 = jnp.floor(s.ents.y[0]).astype(i32) + 1
        (grid, has_moved, died2) = self._move_cells(
            s, (s.grid, has_moved, s.game.died), y_lo2, dim
        )
        s = s.replace(grid=grid, game=s.game.replace(died=died2))

        remaining = jnp.sum(
            (_stationary(s.grid) == DIAMOND)
            & (jnp.arange(dim)[None, :] < s.main_width)
            & (jnp.arange(dim)[:, None] < s.main_height)
        ).astype(i32)
        s = s.replace(game=s.game.replace(diamonds_remaining=remaining))

        s = tree_where(died, s_dead, s)
        return s, d

    def _handle_push2(self, s: BasicState, has_moved):
        """miner.cpp:272-287, exact if/else-if structure."""
        dim = self.world_dim
        agent_idx = self.get_agent_index(s)
        agentx = agent_idx % dim
        e = s.ents

        def gobj(grid, idx):
            inb = (idx >= 0) & (idx < dim * dim)
            idxc = jnp.clip(idx, 0, dim * dim - 1)
            return jnp.where(inb, grid[idxc // dim, idxc % dim], OOB_WALL)

        push_r = (
            (s.action_vx == 1)
            & (e.vx[0] == 0)
            & (agentx < dim - 2)
            & (gobj(s.grid, agent_idx + 1) == BOULDER)
            & (gobj(s.grid, agent_idx + 2) == SPACE)
        )
        push_l = (
            ~push_r
            & (s.action_vx == -1)
            & (e.vx[0] == 0)
            & (agentx > 1)
            & (gobj(s.grid, agent_idx - 1) == BOULDER)
            & (gobj(s.grid, agent_idx - 2) == SPACE)
        )

        def apply(grid, idx, v, do):
            idxc = jnp.clip(idx, 0, dim * dim - 1)
            return grid.at[idxc // dim, idxc % dim].set(
                jnp.where(do, v, grid[idxc // dim, idxc % dim])
            )

        grid = s.grid
        grid = apply(grid, agent_idx + 1, SPACE, push_r)
        grid = apply(grid, agent_idx + 2, BOULDER, push_r)
        grid = apply(grid, agent_idx - 1, SPACE, push_l)
        grid = apply(grid, agent_idx - 2, BOULDER, push_l)
        t2r = jnp.clip(agent_idx + 2, 0, dim * dim - 1)
        t2l = jnp.clip(agent_idx - 2, 0, dim * dim - 1)
        has_moved = has_moved.at[t2r].set(has_moved[t2r] | push_r)
        has_moved = has_moved.at[t2l].set(has_moved[t2l] | push_l)
        dx = jnp.where(push_r, 1.0, jnp.where(push_l, -1.0, 0.0))
        return (
            s.replace(
                grid=grid, ents=e.set_fields(0, x=e.x[0] + dx)
            ),
            has_moved,
        )

    # -- latent state (miner.cpp:368-449) ------------------------------------

    def latent_info(self, s: BasicState):
        e = s.ents
        exit_slot = jnp.argmax(e.active & (e.type == EXIT))
        return {
            "grid_size": jnp.stack([s.main_width, s.main_height]),
            "grid": s.grid.reshape(-1),
            "agent_pos": jnp.stack(
                [e.x[0].astype(i32), e.y[0].astype(i32)]
            ),
            "exit_pos": jnp.stack(
                [e.x[exit_slot].astype(i32), e.y[exit_slot].astype(i32)]
            ),
        }

    def set_latent_state(self, s: BasicState, latent) -> BasicState:
        """game_set_state (miner.cpp:423-449): overwrite grid, agent and exit
        positions from a latent-state dict."""
        grid = jnp.asarray(latent["grid"], i32).reshape(
            self.world_dim, self.world_dim
        )
        died = jnp.any(grid == DEAD_PLAYER)
        ax, ay = latent["agent_pos"]
        e = s.ents
        e = e.set_fields_where(
            0, ~died, x=jnp.asarray(ax, f32) + 0.5, y=jnp.asarray(ay, f32) + 0.5
        )
        exit_slot = jnp.argmax(e.active & (e.type == EXIT))
        ex, ey = latent["exit_pos"]
        e = e.set_fields(
            exit_slot, x=jnp.asarray(ex, f32) + 0.5, y=jnp.asarray(ey, f32) + 0.5
        )
        return s.replace(grid=grid, ents=e, game=s.game.replace(died=died))
