"""Plunder: shoot enemy-colored ships (+1); friendly hits and shots drain
the timer; 20 targets ⇒ +10.  Reference: procgen/src/games/plunder.cpp.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from ..core import rng
from ..core.constants import EASY_MODE, EXPLOSION, PLAYER
from ..core.entities import default_fields
from ..core.game import BasicAbstractGame, BasicState, tree_where
from .registry import register

i32 = jnp.int32
f32 = jnp.float32

COMPLETION_BONUS = 10.0
POSITIVE_REWARD = 1.0

PLAYER_BULLET = 1
TARGET_LEGEND = 2
TARGET_BACKGROUND = 3
PANEL = 6
SHIP = 7

PI = math.pi
NUM_SHIP_TYPES = 6


@struct.dataclass
class PlunderState:
    last_fire_time: jnp.ndarray
    lane_directions: jnp.ndarray  # bool[5]
    target_bools: jnp.ndarray  # bool[6]
    image_permutation: jnp.ndarray  # i32[6]
    lane_vels: jnp.ndarray  # f32[5]
    targets_hit: jnp.ndarray
    juice_left: jnp.ndarray
    min_agent_x: jnp.ndarray


@register("plunder")
class Plunder(BasicAbstractGame):
    name = "plunder"
    WORLD_DIM_MAX = (20, 20)
    ENT_CAP = 48
    # no mid-episode grid writes; bg is the only prefix layer; the render prefix is composed once per level
    # (tests/test_static_frame.py guards frame-vs-full equality)
    STATIC_RENDER_PREFIX = True
    DECOR_CAP = 24  # explosions
    DISPATCH_VECTORIZED = True
    ANY_COLLIDES_WITH_ENTITIES = True
    MAX_STEP_DRAWS = 8
    MAX_SUB_STEPS = 6  # maxspeed .85
    TARGET_QUOTA = 20
    SPAWN_PROB = 0.06

    def __init__(self, options):
        super().__init__(options)
        self.timeout = 4000
        self.mixrate = 0.5
        self.maxspeed = 0.85
        self.has_useful_vel_info = False
        self.center_agent = False
        self.r_scale = 1.5 if options.distribution_mode == EASY_MODE else 1.0

    def background_names(self):
        from ..render.assets import WATER_SURFACE_BACKGROUNDS

        return WATER_SURFACE_BACKGROUNDS

    def should_preserve_type_themes(self, type_):
        # plunder.cpp:83-85
        return type_ == SHIP

    def asset_for_type(self, type_):
        # plunder.cpp:50-64
        if type_ == SHIP:
            return [f"misc_assets/ship_{i}.png" for i in range(1, 7)]
        if type_ == PLAYER_BULLET:
            return ["misc_assets/cannonBall.png"]
        if type_ == PANEL:
            return ["misc_assets/panel_wood.png"]
        if type_ == TARGET_BACKGROUND:
            return ["misc_assets/target_red2.png"]
        return []

    def game_init_state(self):
        return PlunderState(
            last_fire_time=jnp.zeros((), i32),
            lane_directions=jnp.zeros((5,), bool),
            target_bools=jnp.zeros((6,), bool),
            image_permutation=jnp.arange(6, dtype=i32),
            lane_vels=jnp.zeros((5,), f32),
            targets_hit=jnp.zeros((), i32),
            juice_left=jnp.ones((), f32),
            min_agent_x=jnp.zeros((), f32),
        )

    def choose_world_dim(self, s):
        return s.replace(
            main_width=jnp.asarray(20, i32), main_height=jnp.asarray(20, i32)
        )

    def set_action_xy(self, s, move_action):
        return s.replace(
            action_vx=(move_action // 3 - 1).astype(f32),
            action_vy=f32(0.0),
            action_vrot=f32(0.0),
        )

    # -- collisions ---------------------------------------------------------

    def handle_agent_collision_vec(self, s, d, hit):
        return s, d  # no agent collision effects in plunder

    def dispatch_entity_pairs(self, s, d):
        """Bullet vs ship/panel (plunder.cpp:89-110) with the C++ dispatch
        loop's EXACT sequential semantics (basic-abstract-game.cpp:728-746):
        entities act in reverse slot order and the ``!will_erase`` guards
        are evaluated LIVE, so a bullet kills only the highest-slot live
        ship/panel it overlaps and a ship dies to only the first bullet
        that reaches it.  The joint-overlap shortcut this replaces
        double-credited one-bullet-two-ships volleys — caught by the
        adversarial recording tests/data/conformance_opts/plunder_volley.json
        at step 42."""
        e = s.ents
        cap = self.ENT_CAP
        slots = jnp.arange(cap)
        is_ship = e.active & (e.type == SHIP)
        is_panel = e.active & (e.type == PANEL)
        is_bullet = e.active & (e.type == PLAYER_BULLET)
        theme = jnp.clip(e.image_theme, 0, 5)
        is_target = s.game.target_bools[theme]

        dx = jnp.abs(e.x[:, None] - e.x[None, :])
        dy = jnp.abs(e.y[:, None] - e.y[None, :])
        overlap = (
            dx < e.rx[:, None] + e.rx[None, :] + e.collision_margin[:, None]
        ) & (dy < e.ry[:, None] + e.ry[None, :] + e.collision_margin[:, None])

        def body(carry, k):
            we, n_t, n_f = carry
            i = cap - 1 - k  # outer loop: reverse slot order (cpp:728)
            onehot_i = slots == i
            acts = jnp.any(onehot_i & is_bullet & ~we)
            qual = overlap[i] & (is_ship | is_panel) & ~we & ~onehot_i & acts
            anyq = jnp.any(qual)
            # inner loop descending: the first qualifying j is the highest
            jstar_h = (cap - 1 - jnp.argmax(qual[::-1])) == slots
            jh = jstar_h & anyq
            ship_kill = jnp.any(jh & is_ship)
            tgt_kill = jnp.any(jh & is_ship & is_target)
            we = we | (jh & is_ship)  # ship erased; panels survive
            we = we | (onehot_i & anyq)  # bullet erased on ship OR panel
            n_t = n_t + tgt_kill.astype(f32)
            n_f = n_f + (ship_kill & ~tgt_kill).astype(f32)
            return (we, n_t, n_f), jh & is_ship

        (we, n_t, n_f), boom_rows = jax.lax.scan(
            body,
            (e.will_erase, f32(0.0), f32(0.0)),
            jnp.arange(cap),
        )
        ship_hit = jnp.any(boom_rows, axis=0)  # ships killed this dispatch

        s = s.replace(
            reward=s.reward + n_t * POSITIVE_REWARD,
            game=s.game.replace(
                targets_hit=s.game.targets_hit + n_t.astype(i32),
                juice_left=s.game.juice_left + 0.1 * n_t - 0.1 * n_f,
            ),
            ents=e.replace(will_erase=we),
        )

        def push_boom(i, decor):
            bf = default_fields(
                e.x[i], e.y[i], e.vx[i] / 2, e.vy[i] / 2, 0.5 * e.rx[i],
                0.5 * e.rx[i], EXPLOSION,
            )
            return decor.push(bf, do=ship_hit[i])

        s = s.replace(decor=jax.lax.fori_loop(0, self.ENT_CAP, push_boom, s.decor))
        return s, d

    # -- rendering ----------------------------------------------------------

    def render_overlay(self, s, obs, sx, sy, res, unit, vis):
        # juice + progress bars (plunder.cpp:66-77)
        g = s.game
        w = s.main_width.astype(f32)
        juice = jnp.array([66, 245, 135], i32)
        prog = jnp.array([245, 66, 144], i32)
        for y0, length, col in (
            (0.25, w * g.juice_left, juice),
            (0.75, w * g.targets_hit.astype(f32) / self.TARGET_QUOTA, prog),
        ):
            in_x = (sx >= 0.25 * unit) & (sx < (0.25 + length) * unit)
            in_y = (sy >= y0 * unit) & (sy < (y0 + 0.5) * unit)
            mask = in_y[:, None] & in_x[None, :]
            obs = jnp.where(mask[:, :, None], col[None, None, :], obs)
        return obs

    # -- reset --------------------------------------------------------------

    def game_reset(self, s: BasicState) -> BasicState:
        s = self.game_reset_base(s)
        g = s.rand_gen
        r_scale = self.r_scale

        # image_permutation = choose_n([0..5], 6) (randgen.cpp:49-68)
        alive = jnp.ones((6,), bool)
        perm = jnp.zeros((6,), i32)
        for i in range(6):
            cnt = jnp.sum(alive).astype(i32)
            g, r = rng.randn(g, cnt)
            ranks = jnp.cumsum(alive.astype(i32)) - 1
            pick = jnp.argmax(alive & (ranks == r))
            perm = perm.at[i].set(pick)
            alive = alive.at[pick].set(False)

        target_bools = jnp.zeros((6,), bool).at[perm[0]].set(True)

        lane_dirs = jnp.zeros((5,), bool)
        lane_vels = jnp.zeros((5,), f32)
        for i in range(5):
            g, d01 = rng.rand01(g)
            lane_dirs = lane_dirs.at[i].set(d01 < 0.5)
            g, v01 = rng.rand01(g)
            lane_vels = lane_vels.at[i].set(0.15 + 0.1 * v01)

        s = s.replace(rand_gen=g)

        # panels (plunder.cpp:155-163)
        if self.options.distribution_mode == EASY_MODE:
            num_panels = jnp.zeros((), i32)
        else:
            s, num_panels = self.randn(s, 4)
        for i in range(3):
            do = i < num_panels
            fields = default_fields(0.0, 0.0, 0.0, 0.0, 1.2, 0.5, PANEL)
            s2, fields2 = self.reposition(
                s, fields, 0.0, 0.25 * 20.0, 20.0, 0.25 * 20.0, True
            )
            s = tree_where(do, s2.replace(ents=s2.ents.push(fields2)), s)

        # legend (plunder.cpp:165-173)
        legend_r = 2.0
        bgf = default_fields(legend_r, legend_r, 0.0, 0.0, legend_r, legend_r,
                             TARGET_BACKGROUND)
        s = s.replace(ents=s.ents.push(bgf))
        ship_ar = self.aspect_ratios(SHIP)
        lf = default_fields(
            legend_r, legend_r, 0.0, 0.0, r_scale * 1.5, r_scale * 1.5,
            TARGET_LEGEND,
        )
        lf["image_theme"] = perm[0]
        lf["image_type"] = SHIP
        lf["ry"] = (r_scale * 1.5) / ship_ar[jnp.clip(perm[0], 0, 5)]
        lf["rotation"] = PI / 2
        s = s.replace(ents=s.ents.push(lf))

        # agent (plunder.cpp:175-190)
        s, th0 = self.randn(s, 1)  # num_current_ship_types / 2 == 1
        agent_theme = perm[jnp.clip(th0 + 1, 0, 5)]
        ar = ship_ar[jnp.clip(agent_theme, 0, 5)]
        s = s.replace(
            ents=s.ents.set_fields(
                0,
                image_type=SHIP,
                rx=r_scale,
                rotation=-PI / 2,
                image_theme=agent_theme,
                ry=r_scale / ar,
            )
        )
        # reposition_agent (cpp:540-548): retry while colliding
        e = s.ents

        def try_place(gg):
            gg, r1 = rng.rand01(gg)
            gg, r2 = rng.rand01(gg)
            ax = r1 * (20.0 - 2 * e.rx[0]) + e.rx[0]
            ay = r2 * (20.0 - 2 * e.ry[0]) + e.ry[0]
            return gg, ax, ay

        def collides(ax, ay):
            ov = (
                (jnp.abs(ax - e.x) < e.rx[0] + e.rx + e.collision_margin)
                & (jnp.abs(ay - e.y) < e.ry[0] + e.ry + e.collision_margin)
                & e.active
                & (e.type != PLAYER)
            )
            return jnp.any(ov)

        gg, ax, ay = try_place(s.rand_gen)

        def cond(c):
            gg, ax, ay, cnt = c
            return collides(ax, ay) & (cnt < 100)

        def body(c):
            gg, ax, ay, cnt = c
            gg, ax, ay = try_place(gg)
            return (gg, ax, ay, cnt + 1)

        gg, ax, ay, _ = jax.lax.while_loop(
            cond, body, (gg, ax, ay, jnp.zeros((), i32))
        )
        min_agent_x = 2 * legend_r + e.rx[0]
        ax = jnp.maximum(ax, min_agent_x)
        s = s.replace(
            rand_gen=gg,
            ents=s.ents.set_fields(0, x=ax, y=1 + e.ry[0]),
            game=PlunderState(
                last_fire_time=jnp.zeros((), i32),
                lane_directions=lane_dirs,
                target_bools=target_bools,
                image_permutation=perm,
                lane_vels=lane_vels,
                targets_hit=jnp.zeros((), i32),
                juice_left=jnp.ones((), f32),
                min_agent_x=jnp.asarray(min_agent_x, f32),
            ),
        )
        return s

    # -- per-step -----------------------------------------------------------

    def game_step(self, s: BasicState, d):
        s, d = self.game_step_base(s, d)
        g = s.game
        s = s.replace(game=g.replace(juice_left=g.juice_left - 0.0015))

        # ship spawn (plunder.cpp:196-216)
        d, roll = d.rand01()
        spawn = roll < self.SPAWN_PROB
        d, lane = d.randn_if(spawn, 5)
        d, th0 = d.randn_if(spawn, 2)  # num_current_ship_types == 2
        g = s.game
        ent_r = self.r_scale
        ent_y = (lane.astype(f32) * 0.11 + 0.4) * (10.0 - ent_r) + 10.0
        moves_right = g.lane_directions[jnp.clip(lane, 0, 4)]
        ent_vx = g.lane_vels[jnp.clip(lane, 0, 4)] * jnp.where(moves_right, 1.0, -1.0)
        theme = g.image_permutation[jnp.clip(th0, 0, 5)]
        ar = self.aspect_ratios(SHIP)[jnp.clip(theme, 0, 5)]
        f = default_fields(
            jnp.where(moves_right, -ent_r, 20.0 + ent_r), ent_y, ent_vx, 0.0,
            ent_r, ent_r / ar, SHIP,
        )
        f["image_theme"] = theme
        f["is_reflected"] = ~moves_right
        # has_any_collision over BOTH pools — explosions block ship spawns
        # (plunder.cpp:212; see spawn_blocked)
        hit_existing = self.spawn_blocked(s, f["x"], ent_y, ent_r, f["ry"])
        s = s.replace(ents=s.ents.push(f, do=spawn & ~hit_existing))

        # fire (plunder.cpp:218-224)
        fire = (s.special_action == 1) & (s.cur_time - s.game.last_fire_time >= 3)
        bf = default_fields(
            s.ents.x[0], s.ents.y[0], 0.0, 1.0, 0.25, 0.25, PLAYER_BULLET
        )
        bf["collides_with_entities"] = True
        bf["expire_time"] = 50
        s = s.replace(
            ents=s.ents.push(bf, do=fire),
            game=s.game.replace(
                last_fire_time=jnp.where(fire, s.cur_time, s.game.last_fire_time),
                juice_left=s.game.juice_left - jnp.where(fire, 0.02, 0.0),
            ),
        )

        g = s.game
        out_of_juice = g.juice_left <= 0
        juice = jnp.minimum(g.juice_left, 1.0)
        complete = g.targets_hit >= self.TARGET_QUOTA
        s = s.replace(
            done=s.done | out_of_juice | complete,
            reward=s.reward + jnp.where(complete, f32(COMPLETION_BONUS), 0.0),
            level_complete=s.level_complete | complete,
            game=g.replace(juice_left=juice),
        )

        # keep clear of the legend (plunder.cpp:239-241)
        e = s.ents
        s = s.replace(
            ents=e.set_fields(0, x=jnp.maximum(e.x[0], g.min_agent_x))
        )
        return s, d
