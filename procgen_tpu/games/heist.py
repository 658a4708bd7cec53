"""Heist: maze with 0-3 colored locks; collect keys, reach the gem (+10).

Reference: procgen/src/games/heist.cpp.  Doors are entities that block the
agent unless the matching key is held (is_blocked_ents, heist.cpp:66-71);
held keys render as a HUD key ring in absolute screen coords.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from ..core import rng
from ..core.constants import (
    AGENT_OBJ,
    DOOR_OBJ,
    EASY_MODE,
    EXIT_OBJ,
    HARD_MODE,
    KEY_OBJ,
    MEMORY_MODE,
    PLAYER,
    SPACE,
    WALL_OBJ,
)
from ..core.entities import default_fields
from ..core.game import BasicAbstractGame, BasicState, onehot_select, tree_where
from ..levelgen import maze as mazegen
from .registry import register

i32 = jnp.int32
f32 = jnp.float32

COMPLETION_BONUS = 10.0

LOCKED_DOOR = 1
KEY = 2
EXIT = 9
KEY_ON_RING = 11

PI = math.pi


@struct.dataclass
class HeistState:
    num_keys: jnp.ndarray
    has_keys: jnp.ndarray  # bool[3]


@register("heist")
class Heist(BasicAbstractGame):
    name = "heist"
    ENT_CAP = 12  # agent + <=3 keys + <=3 doors + exit + <=3 ring keys
    ARB_ROT_TYPES = {0: 8}  # agent faces diagonals (heist.cpp:208):
    # 45-degree facings land exactly on the 8 bucket centers
    MAX_STEP_DRAWS = 4
    MAX_SUB_STEPS = 6  # maxspeed .75 -> 4*|v| <= 4.2
    ENTITY_SCAN = True  # locked doors block (vectorised override below)

    def __init__(self, options):
        super().__init__(options)
        self.has_useful_vel_info = False
        self.out_of_bounds_object = WALL_OBJ
        self.visibility = 8.0
        self.maxspeed = 0.75  # set in choose_world_dim (heist.cpp:110)
        self.center_agent = options.distribution_mode == MEMORY_MODE

        mode = options.distribution_mode
        if mode == EASY_MODE:
            self.world_dim = 9
        elif mode == HARD_MODE:
            self.world_dim = 13
        elif mode == MEMORY_MODE:
            self.world_dim = 23
        else:
            raise ValueError(f"heist does not support distribution_mode {mode}")
        self.WORLD_DIM_MAX = (self.world_dim, self.world_dim)

    def background_names(self):
        from ..render.assets import TOPDOWN_BACKGROUNDS

        return TOPDOWN_BACKGROUNDS

    def asset_for_type(self, type_):
        # heist.cpp:44-60
        if type_ == WALL_OBJ:
            return ["kenney/Ground/Dirt/dirtCenter.png"]
        if type_ == EXIT:
            return ["misc_assets/gemYellow.png"]
        if type_ == PLAYER:
            return ["misc_assets/spaceAstronauts_008.png"]
        if type_ == KEY:
            return [
                "misc_assets/keyBlue.png",
                "misc_assets/keyGreen.png",
                "misc_assets/keyRed.png",
            ]
        if type_ == LOCKED_DOOR:
            return [
                "misc_assets/lock_blue.png",
                "misc_assets/lock_green.png",
                "misc_assets/lock_red.png",
            ]
        return []

    def use_block_asset(self, type_):
        return type_ in (WALL_OBJ, LOCKED_DOOR)

    def should_preserve_type_themes(self, type_):
        # heist.cpp:40-42
        return (type_ == KEY) | (type_ == LOCKED_DOOR)

    def game_init_state(self):
        return HeistState(
            num_keys=jnp.zeros((), i32), has_keys=jnp.zeros((3,), bool)
        )

    def choose_world_dim(self, s):
        d = jnp.asarray(self.world_dim, i32)
        return s.replace(main_width=d, main_height=d)

    # -- physics ------------------------------------------------------------

    def _entity_scan(self, s, rec, vx, vy, depth):
        """Locked doors block the agent (heist.cpp:66-71).  The sequential
        reverse scan converges to the lowest-slot overlapping locked door;
        at most one door can overlap (doors sit in distinct maze cells), so
        one vectorised push + grid resolution is exact."""
        e = s.ents
        horiz = vx != 0
        slots = jnp.arange(self.ENT_CAP)
        locked = ~self._key_held(s, e.image_theme)
        blocking = (
            e.active
            & (slots != 0)
            & ~e.will_erase
            & (e.type == LOCKED_DOOR)
            & locked
        )
        coll = (
            (jnp.abs(rec["x"] - e.x) < rec["rx"] + e.rx + (-0.001))
            & (jnp.abs(rec["y"] - e.y) < rec["ry"] + e.ry + (-0.001))
        )
        hit = blocking & coll & ~rec["will_erase"]
        any_hit = jnp.any(hit)
        src = jnp.argmax(hit)  # lowest slot = last processed in reverse scan

        def sign(v):
            return jnp.where(v > 0, 1.0, jnp.where(v < 0, -1.0, 0.0))

        # one-hot select, not e.x[src] gathers (SMEM-serialized on TPU)
        sx, sy, srx, sry = onehot_select(src, e.x, e.y, e.rx, e.ry)
        rsum = jnp.where(horiz, srx + rec["rx"], sry + rec["ry"])
        delx = rec["x"] - sx
        dely = rec["y"] - sy
        t_vx = jnp.where(
            horiz & any_hit, sx + sign(delx) * rsum - rec["x"], 0.0
        )
        t_vy = jnp.where(
            ~horiz & any_hit, sy + sign(dely) * rsum - rec["y"], 0.0
        )
        s2, rec2, _ = self._sub_step_rec(s, rec, t_vx, t_vy, self.PUSH_DEPTH,
                                         False)
        rec = tree_where(any_hit, rec2, rec)
        rec = dict(rec)
        rec["vx"] = jnp.where(any_hit & horiz, 0.0, rec["vx"])
        rec["vy"] = jnp.where(any_hit & ~horiz, 0.0, rec["vy"])
        return s, rec, any_hit

    @staticmethod
    def _key_held(s, theme):
        """has_keys[clip(theme, 0, 2)] as a static-index where-chain (a
        traced-index gather is SMEM-serialized on TPU)."""
        hk = s.game.has_keys
        t = jnp.clip(theme, 0, 2)
        return jnp.where(t == 0, hk[0], jnp.where(t == 1, hk[1], hk[2]))

    def should_draw_entity_mask(self, s):
        e = s.ents
        ring = e.type == KEY_ON_RING
        held = self._key_held(s, e.image_theme)
        return ~ring | held

    def handle_agent_collision(self, s, d, i):
        # heist.cpp:81-97 (note: EXIT *assigns* the reward)
        e = s.ents
        t, theme0 = onehot_select(i, e.type, e.image_theme)
        exit_ = t == EXIT
        key = t == KEY
        theme = jnp.clip(theme0, 0, 2)
        door_open = (t == LOCKED_DOOR) & self._key_held(s, theme)
        s = s.replace(
            done=s.done | exit_,
            reward=jnp.where(exit_, f32(COMPLETION_BONUS), s.reward),
            level_complete=s.level_complete | exit_,
            ents=e.set_fields_where(i, key | door_open, will_erase=True),
            game=s.game.replace(
                # one-hot update, not .at[theme] (traced-index scatter)
                has_keys=s.game.has_keys | (key & (jnp.arange(3) == theme))
            ),
        )
        return s, d

    # -- reset --------------------------------------------------------------

    def game_reset(self, s: BasicState) -> BasicState:
        s = self.game_reset_base(s)
        wd = self.world_dim
        mode = self.options.distribution_mode

        min_maze_dim = 5
        max_diff = (wd - min_maze_dim) // 2
        s, difficulty = self.randn(s, max_diff + 1)

        if mode == MEMORY_MODE:
            s, num_keys = self.randn(s, 4)
        else:
            s, extra = self.randn(s, 2)
            num_keys = difficulty + extra
        num_keys = jnp.minimum(num_keys, 3)

        maze_dim = difficulty * 2 + min_maze_dim
        # maze_scale = main_height / world_dim = 1 always (heist.cpp:143)
        s = s.replace(
            ents=s.ents.set_fields(0, rx=0.375, ry=0.375, x=-1.0, y=-1.0),
            game=HeistState(num_keys=num_keys, has_keys=jnp.zeros((3,), bool)),
        )

        g, mgrid, actual_doors = mazegen.generate_maze_with_doors(
            s.rand_gen, maze_dim, wd, num_keys
        )
        g, off_x = rng.randn(g, wd - maze_dim + 1)
        g, off_y = rng.randn(g, wd - maze_dim + 1)
        s = s.replace(
            rand_gen=g,
            game=s.game.replace(num_keys=actual_doors),
        )

        # world: WALL everywhere, SPACE where the maze is open; entities for
        # keys/doors/exit/agent in (x outer, y inner) cell order
        # (heist.cpp:155-186)
        array_dim = maze_dim + 2
        grid = jnp.full((wd, wd), WALL_OBJ, i32)
        gx = jnp.arange(wd)[None, :]
        gy = jnp.arange(wd)[:, None]
        mi = gx - off_x
        mj = gy - off_y
        inside = (mi >= 0) & (mi < maze_dim) & (mj >= 0) & (mj < maze_dim)
        mpos = (mj + 1) * array_dim + (mi + 1)
        mobj = jnp.where(
            inside, mgrid[jnp.clip(mpos, 0, mgrid.shape[0] - 1)], WALL_OBJ
        )
        grid = jnp.where(inside & (mobj != WALL_OBJ), SPACE, grid)
        s = s.replace(grid=grid)

        key_ar = self.aspect_ratios(KEY)
        exit_ar = self.aspect_ratios(EXIT)[0]

        def cell_body(k, carry):
            s, g = carry
            # iterate maze cells in C++ order: i (x) outer, j (y) inner
            mi_ = k // maze_dim  # hmm: k = i * maze_dim + j
            mj_ = k % maze_dim
            live = k < maze_dim * maze_dim
            mx = off_x + mi_
            my = off_y + mj_
            mp = jnp.clip((mj_ + 1) * array_dim + (mi_ + 1), 0, mgrid.shape[0] - 1)
            obj = jnp.where(live, mgrid[mp], WALL_OBJ)

            is_key = obj >= KEY_OBJ
            is_door = (obj >= DOOR_OBJ) & ~is_key
            is_exit = obj == EXIT_OBJ
            is_agent = obj == AGENT_OBJ

            # KEY: spawn_entity(.375, KEY, x, y, 1, 1) — reposition draws
            fields = default_fields(0.0, 0.0, 0.0, 0.0, 0.375, 0.375, KEY)
            g2, px = _rand_pos_if(g, is_key, 0.375, mx.astype(f32), mx.astype(f32) + 1)
            g2, py = _rand_pos_if(g2, is_key, 0.375, my.astype(f32), my.astype(f32) + 1)
            # reposition retries: keys sit in empty 1x1 cells; the agent is
            # parked at (-1,-1) during generation so no retries occur
            theme = jnp.clip(obj - KEY_OBJ - 1, 0, 2)
            fields["x"] = px
            fields["y"] = py
            fields["image_theme"] = theme
            fields["ry"] = 0.375 / key_ar[theme]  # match_aspect_ratio
            s = s.replace(ents=s.ents.push(fields, do=is_key))
            g = tree_where(is_key, g2, g)

            dfields = default_fields(
                mx.astype(f32) + 0.5, my.astype(f32) + 0.5, 0.0, 0.0, 0.5, 0.5,
                LOCKED_DOOR,
            )
            dfields["image_theme"] = jnp.clip(obj - DOOR_OBJ - 1, 0, 2)
            s = s.replace(ents=s.ents.push(dfields, do=is_door))

            efields = default_fields(0.0, 0.0, 0.0, 0.0, 0.375, 0.375, EXIT)
            g2, ex = _rand_pos_if(g, is_exit, 0.375, mx.astype(f32), mx.astype(f32) + 1)
            g2, ey = _rand_pos_if(g2, is_exit, 0.375, my.astype(f32), my.astype(f32) + 1)
            efields["x"] = ex
            efields["y"] = ey
            efields["ry"] = 0.375 / exit_ar
            s = s.replace(ents=s.ents.push(efields, do=is_exit))
            g = tree_where(is_exit, g2, g)

            s = s.replace(
                ents=s.ents.set_fields_where(
                    0, is_agent,
                    x=mx.astype(f32) + 0.5, y=my.astype(f32) + 0.5,
                )
            )
            return (s, g)

        wd2 = self.world_dim
        s, g = jax.lax.fori_loop(
            0, wd2 * wd2, cell_body, (s, s.rand_gen)
        )
        s = s.replace(rand_gen=g)

        # HUD key ring (heist.cpp:188-199)
        ring_key_r = 0.03
        for ki in range(3):
            f = default_fields(
                1 - ring_key_r * (2 * ki + 1.25), ring_key_r * 0.75, 0.0, 0.0,
                ring_key_r, ring_key_r, KEY_ON_RING,
            )
            f["image_theme"] = ki
            f["image_type"] = KEY
            f["rotation"] = PI / 2
            f["render_z"] = 1
            f["use_abs_coords"] = True
            f["ry"] = ring_key_r / key_ar[ki] if ki < len(key_ar) else ring_key_r
            s = s.replace(ents=s.ents.push(f, do=ki < actual_doors))
        return s

    def game_step(self, s: BasicState, d):
        s, d = self.game_step_base(s, d)
        # face_direction (heist.cpp:203; entity.cpp:84-88)
        rot = jnp.where(
            (s.action_vx != 0) | (s.action_vy != 0),
            -jnp.arctan2(s.action_vy, s.action_vx),
            s.ents.rotation[0],
        )
        return s.replace(ents=s.ents.set_fields(0, rotation=rot)), d


def _rand_pos_if(g, cond, r, lo, hi):
    """rand_pos drawing only under ``cond`` (cpp:1109-1117)."""
    need = ((hi - lo) > 2 * r) & cond
    g2, v = rng.rand01(g)
    g2 = tree_where(need, g2, g)
    pos = jnp.where((hi - lo) > 2 * r, (hi - lo - 2 * r) * v + r + lo, (hi + lo) / 2)
    return g2, pos