"""Dodgeball (Berzerk): touching walls kills; throw balls at enemies (+2
each); when all are dead, reach the exit door (+10).

Reference: procgen/src/games/dodgeball.cpp.  Recursive room splitting with
lava-wall entities; enemies fire when axis-aligned with the agent and
reflect off wall entities (non-agent entity scan).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from ..core import rng
from ..core.constants import (
    EASY_MODE,
    EXTREME_MODE,
    HARD_MODE,
    MEMORY_MODE,
    PLAYER,
)
from ..core.entities import default_fields
from ..core.game import BasicAbstractGame, BasicState, onehot_select, tree_where
from .registry import register

i32 = jnp.int32
f32 = jnp.float32

COMPLETION_BONUS = 10.0
ENEMY_REWARD = 2.0

LAVA_WALL = 1
PLAYER_BALL = 3
ENEMY = 4
DOOR = 5
ENEMY_BALL = 6
DOOR_OPEN = 7
DUST_CLOUD = 8
OOB_WALL = 10

NUM_ENEMY_THEMES = 7
ENEMY_VEL = 0.05
PI = math.pi
BALL_V_ROT = PI * 0.23
ROOM_CAP = 40


@struct.dataclass
class DodgeballState:
    last_fire_time: jnp.ndarray
    num_enemies: jnp.ndarray
    ball_r: jnp.ndarray
    ball_vscale: jnp.ndarray


@register("dodgeball")
class Dodgeball(BasicAbstractGame):
    name = "dodgeball"
    ENT_CAP = 72
    # balls spin continuously (BALL_V_ROT); the agent faces diagonals.
    # ENEMY (11 themes) is excluded: its bank alone is ~6MB of kernel
    # constants (breaks the Mosaic compile) for 45-degree facing only —
    # enemies keep the quarter-turn snap.
    ARB_ROT_TYPES = {0: 8, 3: 8, 4: 32, 6: 8}  # PLAYER/PLAYER_BALL/
    # ENEMY_BALL face 45-degree directions (8 exact buckets); ENEMY
    # face_direction is continuous (dodgeball.cpp:362,433) -> 32 buckets
    DECOR_CAP = 16  # dust clouds
    DECOR_TYPES = frozenset(range(54, 60)) | {DUST_CLOUD}
    DISPATCH_VECTORIZED = True
    ANY_COLLIDES_WITH_ENTITIES = True
    MAX_STEP_DRAWS = 96  # <=19 enemies x (3 choose_vel + 1 fire) draws
    MAX_SUB_STEPS = 5
    ONLY_AGENT_SMART = False
    SMART_VECTORIZABLE = True
    MAX_SMART = 24  # bound on simultaneous smart movers; worst-case rollouts: tests/test_env.py::test_max_smart_bound
    ENTITY_SCAN = False  # agent has no entity blocking
    ENTITY_SCAN_NONAGENT = True  # enemies reflect off lava-wall entities
    ENEMY_FIRE_DELAY = 50
    # walls/doors are entities, the grid is never written, and easy/hard
    # use a fixed full-world camera (memory mode centers the agent, which
    # static_prefix already excludes) — tests/test_static_frame.py
    STATIC_RENDER_PREFIX = True

    def __init__(self, options):
        super().__init__(options)
        self.mixrate = 0.5
        self.out_of_bounds_object = OOB_WALL
        mode = options.distribution_mode
        dim = 40 if mode == MEMORY_MODE else 20
        self.world_dim = dim
        self.WORLD_DIM_MAX = (dim, dim)
        self.center_agent = mode == MEMORY_MODE

        # per-mode scaling (dodgeball.cpp:276-313)
        if mode == EASY_MODE:
            self.num_iterations, self.thickness = 2, 0.6
            self.enemy_r, self._ball_r, self._ball_vscale = 1.0, 0.5, 0.5
            self._maxspeed, self.agent_r, self.exit_r = 0.75, 1.0, 1.5
            self.max_extra = 3
        elif mode == HARD_MODE:
            self.num_iterations, self.thickness = 4, 0.45
            self.enemy_r, self._ball_r, self._ball_vscale = 0.75, 0.375, 0.375
            self._maxspeed, self.agent_r, self.exit_r = 0.5, 0.75, 0.75
            self.max_extra = 3
        elif mode == EXTREME_MODE:
            self.num_iterations, self.thickness = 8, 0.3
            self.enemy_r, self._ball_r, self._ball_vscale = 0.5, 0.25, 0.25
            self._maxspeed, self.agent_r, self.exit_r = 0.25, 0.4, 0.75
            self.max_extra = 3
        elif mode == MEMORY_MODE:
            self.num_iterations, self.thickness = 16, 0.45
            self.enemy_r, self._ball_r, self._ball_vscale = 0.75, 0.375, 0.375
            self._maxspeed, self.agent_r, self.exit_r = 0.5, 0.75, 0.75
            self.max_extra = 16
        self.hard_min_dim = 4 * self.agent_r + 2 * self.thickness + 0.5
        self.min_dim = self.agent_r * 8 + 0.5

    def background_names(self):
        from ..render.assets import TOPDOWN_BACKGROUNDS

        return TOPDOWN_BACKGROUNDS

    def asset_for_type(self, type_):
        # dodgeball.cpp:50-90
        if type_ == PLAYER:
            return ["misc_assets/character12.png"]
        if type_ == PLAYER_BALL:
            return ["misc_assets/ball_soccer1.png"]
        if type_ == ENEMY:
            return [f"misc_assets/character{i}.png" for i in range(1, 12)]
        if type_ == DOOR:
            return ["misc_assets/blockRed.png"]
        if type_ == ENEMY_BALL:
            return ["misc_assets/ball_soccer2.png"]
        if type_ == DOOR_OPEN:
            return ["misc_assets/blockGreen.png"]
        if type_ in (LAVA_WALL, OOB_WALL):
            return ["misc_assets/tileStone_slope2.png"]
        if type_ == DUST_CLOUD:
            return [f"misc_assets/spaceEffect{i}.png" for i in range(1, 10)]
        return []

    def use_block_asset(self, type_):
        return type_ in (LAVA_WALL, DOOR, DOOR_OPEN)

    def entity_tile_ratio(self, s, e):
        # dodgeball.cpp:240-246: lava walls tile along their long axis
        return jnp.where(
            e.type == LAVA_WALL, jnp.where(e.rx > e.ry, 1.0, -1.0), 0.0
        )

    def game_init_state(self):
        return DodgeballState(
            last_fire_time=jnp.zeros((), i32),
            num_enemies=jnp.zeros((), i32),
            ball_r=jnp.asarray(self._ball_r, f32),
            ball_vscale=jnp.asarray(self._ball_vscale, f32),
        )

    def choose_world_dim(self, s):
        d = jnp.asarray(self.world_dim, i32)
        return s.replace(main_width=d, main_height=d)

    # -- physics ------------------------------------------------------------

    def will_reflect(self, src_type, target_type):
        return (src_type == ENEMY) & (
            (target_type == LAVA_WALL) | (target_type == self.out_of_bounds_object)
        )

    def _entity_scan(self, s, rec, vx, vy, depth):
        """Enemies reflect off lava-wall entities (the only pair relation).
        One vectorised reflection against the highest-slot overlapping wall
        (first processed in the C++ reverse scan); pure in s."""
        e = s.ents
        horiz = vx != 0
        slots = jnp.arange(self.ENT_CAP)
        refl_pair = self.will_reflect(rec["type"], e.type)
        coll = (
            (jnp.abs(rec["x"] - e.x) < rec["rx"] + e.rx + (-0.001))
            & (jnp.abs(rec["y"] - e.y) < rec["ry"] + e.ry + (-0.001))
            & e.active
            & ~e.will_erase
            & refl_pair
            & ~rec["will_erase"]
        )
        any_hit = jnp.any(coll)
        src = jnp.max(jnp.where(coll, slots, -1))
        si = jnp.maximum(src, 0)
        # one-hot matmul slot select, NOT e.x[si] gathers: under the slot
        # vmap a traced-index gather serializes through SMEM on TPU
        # (4 fields x 10 axis passes of [4096, cap] lookups dominated the
        # whole step: 129 of 141ms logic at 4096 envs)
        sx, sy, srx, sry = onehot_select(si, e.x, e.y, e.rx, e.ry)
        delx = sx - rec["x"]
        dely = sy - rec["y"]
        rsumx = srx + rec["rx"]
        rsumy = sry + rec["ry"]
        bx = rec["x"] + jnp.where(vx > 0, -2 * (rsumx - delx), 2 * (rsumx + delx))
        by = rec["y"] + jnp.where(vy > 0, -2 * (rsumy - dely), 2 * (rsumy + dely))
        rec = dict(rec)
        rec["x"] = jnp.where(any_hit & horiz, bx, rec["x"])
        rec["y"] = jnp.where(any_hit & ~horiz, by, rec["y"])
        rec["vx"] = jnp.where(any_hit & horiz, -rec["vx"], rec["vx"])
        rec["vy"] = jnp.where(any_hit & ~horiz, -rec["vy"], rec["vy"])
        return s, rec, jnp.asarray(False)

    def image_for_type(self, s, type_):
        door_img = jnp.where(s.game.num_enemies == 0, DOOR_OPEN, DOOR)
        return jnp.where(type_ == DOOR, door_img, jnp.abs(type_))

    # -- collisions ---------------------------------------------------------

    def handle_agent_collision_vec(self, s, d, hit):
        # dodgeball.cpp:105-121
        e = s.ents
        lethal = jnp.any(
            hit
            & ((e.type == ENEMY) | (e.type == ENEMY_BALL) | (e.type == LAVA_WALL))
        )
        exit_hit = jnp.any(hit & (e.type == DOOR)) & (s.game.num_enemies == 0)
        return s.replace(
            done=s.done | lethal | exit_hit,
            reward=s.reward + jnp.where(exit_hit, f32(COMPLETION_BONUS), 0.0),
            level_complete=s.level_complete | exit_hit,
        ), d

    def dispatch_entity_pairs(self, s, d):
        """Balls vs lava walls / enemies (dodgeball.cpp:123-152)."""
        e = s.ents
        is_pball = e.active & (e.type == PLAYER_BALL) & ~e.will_erase
        is_eball = e.active & (e.type == ENEMY_BALL) & ~e.will_erase
        is_wall = e.active & (e.type == LAVA_WALL) & ~e.will_erase
        is_enemy = e.active & (e.type == ENEMY) & ~e.will_erase
        dx = jnp.abs(e.x[:, None] - e.x[None, :])
        dy = jnp.abs(e.y[:, None] - e.y[None, :])
        overlap = (
            dx < e.rx[:, None] + e.rx[None, :] + e.collision_margin[:, None]
        ) & (dy < e.ry[:, None] + e.ry[None, :] + e.collision_margin[:, None])

        pball_wall = jnp.any(overlap & is_wall[:, None] & is_pball[None, :], axis=0)
        eball_wall = jnp.any(overlap & is_wall[:, None] & is_eball[None, :], axis=0)
        enemy_hits = jnp.sum(
            overlap & is_enemy[:, None] & is_pball[None, :], axis=1
        ).astype(f32)
        pball_enemy = jnp.any(overlap & is_enemy[:, None] & is_pball[None, :], axis=0)

        new_health = e.health - jnp.where(is_enemy, enemy_hits, 0.0)
        enemy_dies = is_enemy & (new_health <= 0) & (enemy_hits > 0)
        s = s.replace(
            reward=s.reward + jnp.sum(enemy_dies).astype(f32) * ENEMY_REWARD,
            ents=e.replace(
                health=new_health,
                will_erase=e.will_erase
                | enemy_dies
                | pball_wall
                | eball_wall
                | pball_enemy,
            ),
        )

        # dust clouds (step-themed, choose_step_random_theme: no draw)
        theme = s.step_rand_int % self.num_themes(DUST_CLOUD)

        f = default_fields(e.x, e.y, 0.0, 0.0, e.rx, e.rx, DUST_CLOUD)
        f["vrot"] = PI / 0.3
        f["grow_rate"] = 1.0 / 1.2
        f["expire_time"] = 4
        f["alpha_decay"] = 0.9
        f["image_theme"] = theme
        s = s.replace(decor=s.decor.push_many(f, enemy_dies))
        return s, d

    # -- reset --------------------------------------------------------------

    def game_reset(self, s: BasicState) -> BasicState:
        s = self.game_reset_base(s)
        s = s.replace(
            maxspeed=f32(self._maxspeed),
            ents=s.ents.set_fields(0, rx=self.agent_r, ry=self.agent_r),
            game=DodgeballState(
                last_fire_time=jnp.zeros((), i32),
                num_enemies=jnp.zeros((), i32),
                ball_r=jnp.asarray(self._ball_r, f32),
                ball_vscale=jnp.asarray(self._ball_vscale, f32),
            ),
        )
        g = s.rand_gen
        W = float(self.world_dim)

        # recursive room splitting (dodgeball.cpp:314-323, 170-243)
        rx_ = jnp.zeros((ROOM_CAP,), f32).at[0].set(0.0)
        ry_ = jnp.zeros((ROOM_CAP,), f32)
        rw_ = jnp.zeros((ROOM_CAP,), f32).at[0].set(W)
        rh_ = jnp.zeros((ROOM_CAP,), f32).at[0].set(W)
        alive = jnp.zeros((ROOM_CAP,), bool).at[0].set(True)
        count = jnp.asarray(1, i32)
        th = self.thickness

        wall_recs, wall_dos = [], []
        for _ in range(self.num_iterations):
            nalive = jnp.sum(alive).astype(i32)
            it_on = nalive > 0
            g2, ridx = rng.randn(g, jnp.maximum(nalive, 1))
            g = tree_where(it_on, g2, g)
            ranks = jnp.cumsum(alive.astype(i32)) - 1
            pick = jnp.argmax(alive & (ranks == ridx))
            alive = alive.at[pick].set(alive[pick] & ~it_on)
            room = (rx_[pick], ry_[pick], rw_[pick], rh_[pick])

            g2, s1 = rng.rand01(g)
            g2, s2_ = rng.rand01(g2)
            g2, gap0 = rng.randn(g2, 3)
            g = tree_where(it_on, g2, g)

            will_w = s1 < 0.5
            will_w = jnp.where(room[2] < self.min_dim, False, will_w)
            will_w = jnp.where(room[3] < self.min_dim, True, will_w)
            choice2 = s2_ < 0.5
            gap = 0.25 * (gap0 + 1).astype(f32)
            pct = 1 - gap
            rx0, ry0, rw0, rh0 = room

            # horizontal split (will_w False): wall along x center
            wy = jnp.where(choice2, ry0, ry0 + (1 - pct) * rh0)
            remy = jnp.where(choice2, ry0 + pct * rh0, ry0)
            wh = pct * rh0
            wall_h = default_fields(
                rx0 + rw0 / 2, wy + wh / 2, 0.0, 0.0, th, wh / 2, LAVA_WALL
            )
            wall_h["collides_with_entities"] = True
            # vertical split (will_w True)
            wx = jnp.where(choice2, rx0, rx0 + (1 - pct) * rw0)
            remx = jnp.where(choice2, rx0 + pct * rw0, rx0)
            ww = pct * rw0
            wall_v = default_fields(
                wx + ww / 2, ry0 + rh0 / 2, 0.0, 0.0, ww / 2, th, LAVA_WALL
            )
            wall_v["collides_with_entities"] = True
            wall = {
                k: jnp.where(will_w, wall_v[k], wall_h[k]) for k in wall_h
            }
            wall_recs.append(wall)
            wall_dos.append(it_on)

            nextw = rw0 / 2 - th
            nexth = rh0 / 2 - th
            new_rooms = [
                # !will_w: three rooms (cpp:205-209); will_w: (cpp:227-231)
                tree_where(
                    will_w,
                    (wx, ry0, ww, nexth),
                    (rx0, wy, nextw, wh),
                ),
                tree_where(
                    will_w,
                    (wx, ry0 + rh0 / 2 + th, ww, nexth),
                    (rx0 + rw0 / 2 + th, wy, nextw, wh),
                ),
                tree_where(
                    will_w,
                    (remx, ry0, rw0 - ww, rh0),
                    (rx0, remy, rw0, rh0 - wh),
                ),
            ]
            for nr in new_rooms:
                nx0, ny0, nw0, nh0 = nr
                keep = it_on & (
                    ((nw0 >= self.min_dim) | (nh0 >= self.min_dim))
                    & (nw0 >= self.hard_min_dim)
                    & (nh0 >= self.hard_min_dim)
                )
                slot = jnp.minimum(count, ROOM_CAP - 1)
                ok = keep & (count < ROOM_CAP)
                rx_ = rx_.at[slot].set(jnp.where(ok, nx0, rx_[slot]))
                ry_ = ry_.at[slot].set(jnp.where(ok, ny0, ry_[slot]))
                rw_ = rw_.at[slot].set(jnp.where(ok, nw0, rw_[slot]))
                rh_ = rh_.at[slot].set(jnp.where(ok, nh0, rh_[slot]))
                alive = alive.at[slot].set(jnp.where(ok, True, alive[slot]))
                count = count + ok.astype(i32)

        s = s.replace(
            ents=s.ents.push_many(
                {k: jnp.stack([r[k] for r in wall_recs]) for k in wall_recs[0]},
                jnp.stack(wall_dos),
            ),
            rand_gen=g,
        )

        # exit door on a random wall (dodgeball.cpp:325-339)
        s, wall_choice = self.randn(s, 4)
        er = self.exit_r
        dl2 = er  # doorlen / 2
        boxes = [
            (0.0, 0.0, W, 2 * er, dl2, er),
            (0.0, W - 2 * er, W, 2 * er, dl2, er),
            (0.0, 0.0, 2 * er, W, er, dl2),
            (W - 2 * er, 0.0, 2 * er, W, er, dl2),
        ]
        for ci, (bx, by, bw, bh, rrx, rry) in enumerate(boxes):
            do = wall_choice == ci
            fields = default_fields(0.0, 0.0, 0.0, 0.0, rrx, rry, DOOR)
            s2, fields2 = self.reposition(s, fields, bx, by, bw, bh, True)
            s = tree_where(do, s2.replace(ents=s2.ents.push(fields2)), s)

        # reposition_agent (cpp:341)
        e = s.ents

        def try_place(gg):
            gg, r1 = rng.rand01(gg)
            gg, r2 = rng.rand01(gg)
            ax = r1 * (W - 2 * e.rx[0]) + e.rx[0]
            ay = r2 * (W - 2 * e.ry[0]) + e.ry[0]
            return gg, ax, ay

        def coll(ax, ay):
            ov = (
                (jnp.abs(ax - e.x) < e.rx[0] + e.rx + e.collision_margin)
                & (jnp.abs(ay - e.y) < e.ry[0] + e.ry + e.collision_margin)
                & e.active
                & (e.type != PLAYER)
            )
            return jnp.any(ov)

        gg, ax, ay = try_place(s.rand_gen)
        gg, ax, ay, _ = jax.lax.while_loop(
            lambda c: coll(c[1], c[2]) & (c[3] < 100),
            lambda c: try_place(c[0]) + (c[3] + 1,),
            (gg, ax, ay, jnp.zeros((), i32)),
        )
        s = s.replace(rand_gen=gg, ents=s.ents.set_fields(0, x=ax, y=ay))

        # enemies (cpp:343-345)
        s, extra = self.randn(s, self.max_extra + 1)
        num_enemies = extra + 3
        max_enemies = self.max_extra + 3
        for i in range(max_enemies):
            do = i < num_enemies
            fields = default_fields(
                0.0, 0.0, 0.0, 0.0, self.enemy_r, self.enemy_r, ENEMY
            )
            s2, fields2 = self.reposition(s, fields, 0.0, 0.0, W, W, True)
            s = tree_where(do, s2.replace(ents=s2.ents.push(fields2)), s)

        # theme + per-enemy setup (cpp:347-363, forward order)
        s, enemy_theme = self.randn(s, NUM_ENEMY_THEMES)

        def setup(i, carry):
            s, g = carry
            e = s.ents
            is_en = (i < e.count) & (e.type[i] == ENEMY)
            g2, v0 = rng.randn(g, 2)
            vel = ENEMY_VEL * (v0 * 2 - 1).astype(f32)
            g2, axis0 = rng.randn(g2, 2)
            g2, sp0 = rng.randn(g2, 50)
            g = tree_where(is_en, g2, g)
            vx = jnp.where(axis0 == 0, vel, 0.0)
            vy = jnp.where(axis0 == 0, 0.0, vel)
            rot = jnp.where(
                (vx != 0) | (vy != 0), -jnp.arctan2(vy, vx), e.rotation[i]
            )
            s = s.replace(
                ents=e.set_fields_where(
                    i, is_en,
                    image_theme=enemy_theme, health=1.0, spawn_time=sp0 + 25,
                    fire_time=10, collides_with_entities=True, smart_step=True,
                    vx=vx, vy=vy, rotation=rot,
                )
            )
            return (s, g)

        s, g = jax.lax.fori_loop(0, self.ENT_CAP, setup, (s, s.rand_gen))
        s = s.replace(
            rand_gen=g,
            ents=s.ents.set_fields(0, rotation=-jnp.arctan2(0.0, 1.0)),
            game=s.game.replace(num_enemies=num_enemies),
        )
        return s

    # -- per-step -----------------------------------------------------------

    def game_step(self, s: BasicState, d):
        s, d = self.game_step_base(s, d)
        g = s.game

        vx = (s.last_move_action // 3 - 1).astype(f32)
        vy = (s.last_move_action % 3 - 1).astype(f32)
        rot = jnp.where(
            (vx != 0) | (vy != 0), -jnp.arctan2(vy, vx), s.ents.rotation[0]
        )
        s = s.replace(ents=s.ents.set_fields(0, rotation=rot))

        # player ball (dodgeball.cpp:389-396)
        fire = (s.special_action == 1) & (s.cur_time - g.last_fire_time >= 7)
        bf = default_fields(
            s.ents.x[0], s.ents.y[0], vx * g.ball_vscale, vy * g.ball_vscale,
            g.ball_r, g.ball_r, PLAYER_BALL,
        )
        bf["collides_with_entities"] = True
        bf["expire_time"] = 50
        bf["vrot"] = BALL_V_ROT
        s = s.replace(
            ents=s.ents.push(bf, do=fire),
            game=g.replace(
                last_fire_time=jnp.where(fire, s.cur_time, g.last_fire_time)
            ),
        )

        # enemy AI, reverse slot order with conditional draws
        # (dodgeball.cpp:398-443).  Vectorized: every per-slot read is of
        # pre-loop state (each C++ iteration writes only its own slot, the
        # loop bound is captured before any ball push, and pushed balls land
        # above it), so the sequential loop is reproduced exactly by (a) a
        # draw-offset prefix sum over descending slots feeding one batched
        # ``peek_at``, and (b) one ``push_many`` in the same descending
        # order.  Replaces a 72-iteration lax.scan whose per-iteration pool
        # updates dominated the step (153 ms logic @4096 envs).
        e = s.ents
        slots = jnp.arange(self.ENT_CAP)
        exists = slots < e.count
        is_en = exists & (e.type == ENEMY)

        redraw = is_en & (e.spawn_time == 0)
        can_fire = is_en & (s.cur_time - e.fire_time >= self.ENEMY_FIRE_DELAY)
        dxa = e.x - e.x[0]
        dya = e.y - e.y[0]
        bvelx = jnp.where(e.x < e.x[0], 1.0, -1.0)
        bvely = jnp.where(e.y < e.y[0], 1.0, -1.0)
        fire_v = can_fire & (jnp.abs(dxa) < 1)
        fire_h = can_fire & ~fire_v & (jnp.abs(dya) < 1)
        fired = fire_v | fire_h

        # per-slot draw layout (descending slots): [v0, axis0, sp0] if
        # redraw, then [ft0] if fired — counts are carry-independent
        cnt = 3 * redraw.astype(i32) + fired.astype(i32)
        cnt_rev = cnt[::-1]
        start = (jnp.cumsum(cnt_rev) - cnt_rev)[::-1]
        offs = jnp.stack(
            [start, start + 1, start + 2, start + 3 * redraw.astype(i32)]
        )
        words = d.peek_at(offs)
        d = d.advance(jnp.sum(cnt))
        v0 = (words[0] % 2).astype(i32)
        axis0 = (words[1] % 2).astype(i32)
        sp0 = (words[2] % 50).astype(i32)
        ft0 = (words[3] % 4).astype(i32)

        vel = ENEMY_VEL * (v0 * 2 - 1).astype(f32)
        nvx = jnp.where(redraw, jnp.where(axis0 == 0, vel, 0.0), e.vx)
        nvy = jnp.where(redraw, jnp.where(axis0 == 0, 0.0, vel), e.vy)
        nsp = jnp.where(
            redraw, sp0 + 25, jnp.where(is_en, e.spawn_time - 1, e.spawn_time)
        )
        nvx = jnp.where(fire_v, 0.0, jnp.where(fire_h, bvelx * ENEMY_VEL, nvx))
        nvy = jnp.where(fire_v, bvely * ENEMY_VEL, jnp.where(fire_h, 0.0, nvy))
        nrot = jnp.where(
            (nvx != 0) | (nvy != 0), -jnp.arctan2(nvy, nvx), e.rotation
        )
        nft = jnp.where(fired, s.cur_time + ft0, e.fire_time)

        # enemy balls, pushed in the C++ iteration (= descending slot) order
        rev = slots[::-1]
        ballf = default_fields(
            e.x[rev], e.y[rev],
            jnp.where(fire_v, 0.0, bvelx)[rev] * g.ball_vscale,
            jnp.where(fire_v, bvely, 0.0)[rev] * g.ball_vscale,
            g.ball_r, g.ball_r, ENEMY_BALL,
        )
        ballf["vrot"] = BALL_V_ROT
        ballf["expire_time"] = 50
        s = s.replace(ents=e.push_many(ballf, do=fired[rev]))

        # balls erase at borders (cpp:434-440); the C++ loop bound excludes
        # balls pushed this step, so the pre-push `exists` mask is exact
        is_ball = exists & ((e.type == PLAYER_BALL) | (e.type == ENEMY_BALL))
        W = s.main_width.astype(f32)
        oob = (
            (e.x < e.rx) | (e.x > W - e.rx) | (e.y < e.ry) | (e.y > W - e.ry)
        )
        e2 = s.ents
        s = s.replace(
            ents=e2.replace(
                vx=jnp.where(is_en, nvx, e2.vx),
                vy=jnp.where(is_en, nvy, e2.vy),
                spawn_time=jnp.where(is_en, nsp, e2.spawn_time),
                rotation=jnp.where(is_en, nrot, e2.rotation),
                fire_time=jnp.where(is_en, nft, e2.fire_time),
                will_erase=e2.will_erase | (is_ball & oob),
            )
        )

        e = s.ents
        num_enemies = jnp.sum(e.active & (e.type == ENEMY) & ~e.will_erase)
        s = s.replace(game=s.game.replace(num_enemies=num_enemies.astype(i32)))
        s = self.erase_if_needed(s)
        return s, d
