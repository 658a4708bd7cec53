"""Leaper (Frogger): cross car lanes, then the log river; +10 at the finish
line.  Reference: procgen/src/games/leaper.cpp.

The reference pre-rolls world state at reset by simulating spawns for
``width/min_speed`` steps (leaper.cpp:176-180).  Entities leaving the world
are never erased during that warmup but can never influence it (spawn
collision checks happen at the opposite edge from where cars exit, and the
agent sits below every lane), so the warmup loop compacts them each
iteration to keep the pool bounded — behaviourally identical, statically
sized.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from ..core import rng
from ..core.constants import EASY_MODE, EXTREME_MODE, HARD_MODE, PLAYER
from ..core.entities import default_fields
from ..core.game import BasicAbstractGame, BasicState
from .registry import register

i32 = jnp.int32
f32 = jnp.float32

LOG = 1
ROAD = 2
WATER = 3
CAR = 4
FINISH_LINE = 5

MONSTER_RADIUS = 0.25
LOG_RADIUS = 0.45

GOAL_REWARD = 10.0

NSTEP = 5
FROG_ANIMATION_FRAMES = NSTEP
MAX_SPEED = 2 / (NSTEP - 1.0)
VEL_DECAY = MAX_SPEED / NSTEP

MAX_LANES = 6  # difficulty <= 4, +1 extra lane
PI = math.pi


@struct.dataclass
class LeaperState:
    bottom_road_y: jnp.ndarray
    road_lane_speeds: jnp.ndarray  # f32[MAX_LANES]
    num_road_lanes: jnp.ndarray
    bottom_water_y: jnp.ndarray
    water_lane_speeds: jnp.ndarray
    num_water_lanes: jnp.ndarray
    goal_y: jnp.ndarray


@register("leaper")
class Leaper(BasicAbstractGame):
    name = "leaper"
    ENT_CAP = 80
    # roads/water lanes are grid rows written only at reset; the render prefix is composed once per level
    # (tests/test_static_frame.py guards frame-vs-full equality)
    STATIC_RENDER_PREFIX = True
    DISPATCH_VECTORIZED = True  # handlers commute (car death, finish bonus)
    MAX_STEP_DRAWS = 32  # step_rand_int + 2 draws x 12 lanes worst case
    MAX_SUB_STEPS = 4  # |v| <= 0.5

    def __init__(self, options):
        super().__init__(options)
        self.maxspeed = MAX_SPEED
        self.timeout = 500
        self.center_agent = False  # forced at reset (leaper.cpp:126)

        mode = options.distribution_mode
        if mode == EASY_MODE:
            dim = 9
        elif mode == HARD_MODE:
            dim = 15
        else:
            dim = 20
        self.world_dim = dim
        self.WORLD_DIM_MAX = (dim, dim)

        # speed ranges (leaper.cpp:128-146)
        if mode == EASY_MODE:
            self.car_speed = (0.03, 0.12)
            self.log_speed = (0.025, 0.075)
        elif mode == EXTREME_MODE:
            self.car_speed = (0.1, 0.3)
            self.log_speed = (0.1, 0.2)
        else:
            self.car_speed = (0.05, 0.2)
            self.log_speed = (0.05, 0.1)
        self.warmup_steps = int(dim / min(self.car_speed[0], self.log_speed[0]))

    def background_names(self):
        from ..render.assets import TOPDOWN_BACKGROUNDS

        return TOPDOWN_BACKGROUNDS

    def asset_for_type(self, type_):
        # leaper.cpp:45-68
        if type_ == ROAD:
            return ["misc_assets/roadTile6b.png"]
        if type_ == WATER:
            return ["misc_assets/terrainTile6.png"]
        if type_ == CAR:
            return [
                "misc_assets/car_yellow_5.png",
                "misc_assets/car_black_1.png",
                "misc_assets/car_blue_2.png",
                "misc_assets/car_green_3.png",
                "misc_assets/car_red_4.png",
            ]
        if type_ == LOG:
            return ["misc_assets/elementWood044.png"]
        if type_ == PLAYER:
            return [
                "misc_assets/frog1.png",
                "misc_assets/frog2.png",
                "misc_assets/frog4.png",
                "misc_assets/frog6.png",
                "misc_assets/frog7.png",
            ]
        if type_ == FINISH_LINE:
            return ["misc_assets/finish2.png"]
        return []

    def use_block_asset(self, type_):
        return type_ in (WATER, ROAD)

    def should_preserve_type_themes(self, type_):
        # leaper.cpp:91-93
        return type_ == PLAYER

    def entity_tile_ratio(self, s, e):
        # leaper.cpp:67-76: finish line tiles horizontally
        return jnp.where(e.type == FINISH_LINE, 1.0, 0.0)

    def adjust_image_rect(self, img, x0, y0, w2, h2):
        # leaper.cpp:242-248: frog sprite extends 0.275*h above the hitbox
        p = img == PLAYER
        return (
            x0,
            jnp.where(p, y0 - 0.275 * h2, y0),
            w2,
            jnp.where(p, 1.55 * h2, h2),
        )

    def game_init_state(self):
        z = jnp.zeros((), i32)
        return LeaperState(
            bottom_road_y=z,
            road_lane_speeds=jnp.zeros((MAX_LANES,), f32),
            num_road_lanes=z,
            bottom_water_y=z,
            water_lane_speeds=jnp.zeros((MAX_LANES,), f32),
            num_water_lanes=z,
            goal_y=z,
        )

    def choose_world_dim(self, s):
        d = jnp.asarray(self.world_dim, i32)
        return s.replace(main_width=d, main_height=d)

    def handle_agent_collision_vec(self, s, d, hit):
        # leaper.cpp:79-87
        e = s.ents
        car = jnp.any(hit & (e.type == CAR))
        finish = (
            jnp.any(hit & (e.type == FINISH_LINE))
            & (e.vx[0] == 0)
            & (e.vy[0] == 0)
        )
        return s.replace(
            done=s.done | car | finish,
            reward=s.reward + jnp.where(finish, f32(GOAL_REWARD), 0.0),
            level_complete=s.level_complete | finish,
        ), d

    def update_agent_velocity(self, s):
        # discrete hops with linear decay (leaper.cpp:215-239)
        e = s.ents
        at_rest = (e.vx[0] == 0) & (e.vy[0] == 0)
        hop_x = at_rest & (s.action_vx != 0)
        hop_y = at_rest & ~hop_x & (s.action_vy != 0)
        vx = jnp.where(hop_x, s.maxspeed * s.action_vx, e.vx[0])
        vy = jnp.where(hop_y, s.maxspeed * s.action_vy, e.vy[0])
        theme = jnp.where(hop_x | hop_y, 1, e.image_theme[0])
        rot = e.rotation[0]
        rot = jnp.where(hop_x, jnp.where(vx > 0, 1.0, -1.0) * (PI / 2), rot)
        rot = jnp.where(hop_y, jnp.where(vy > 0, 0.0, PI), rot)

        def decay(v):
            vs = jnp.sign(v)
            mag = jnp.maximum(jnp.abs(v) - VEL_DECAY, 0.0)
            return mag * vs

        return s.replace(
            ents=e.set_fields(
                0, vx=decay(vx), vy=decay(vy), image_theme=theme, rotation=rot
            )
        )

    # -- spawning -----------------------------------------------------------

    def _spawn_entities(self, s: BasicState, d):
        """leaper.cpp:184-213, on the step-draw cursor."""
        g = s.game

        def try_spawn(s, d, lane, is_car):
            speeds = g.road_lane_speeds if is_car else g.water_lane_speeds
            nlanes = g.num_road_lanes if is_car else g.num_water_lanes
            base_y = g.bottom_road_y if is_car else g.bottom_water_y
            valid = lane < nlanes
            speed = speeds[lane]
            denom = 6.0 if is_car else 2.0
            d, roll = d.rand01_if(valid)
            hit = valid & (roll < jnp.abs(speed) / denom)
            r = MONSTER_RADIUS if is_car else LOG_RADIUS
            w = s.main_width.astype(f32)
            x = jnp.where(speed > 0, -r, w + r)
            y = base_y.astype(f32) + lane + 0.5
            if is_car:
                d, theme = d.randn_if(hit, self.num_themes(CAR))
                fields = default_fields(
                    x, y, speed, 0.0, 2 * MONSTER_RADIUS, MONSTER_RADIUS, CAR
                )
                fields["image_theme"] = theme
                fields["rotation"] = jnp.where(speed < 0, PI, 0.0)
            else:
                fields = default_fields(x, y, speed, 0.0, r, r, LOG)
            # has_any_collision(m) (leaper.cpp:197,210)
            e = s.ents
            overlap = (
                (jnp.abs(x - e.x) < r + e.rx)
                & (jnp.abs(y - e.y) < (MONSTER_RADIUS if is_car else r) + e.ry)
                & e.active
                & ~e.avoids_collisions
            )
            hit &= ~jnp.any(overlap)
            return s.replace(ents=s.ents.push(fields, do=hit)), d

        for lane in range(MAX_LANES):
            s, d = try_spawn(s, d, lane, True)
        for lane in range(MAX_LANES):
            s, d = try_spawn(s, d, lane, False)
        return s, d

    # -- reset --------------------------------------------------------------

    def game_reset(self, s: BasicState) -> BasicState:
        s = self.game_reset_base(s)
        mode = self.options.distribution_mode
        s = s.replace(ents=s.ents.set_fields(0, y=s.ents.ry[0]))

        def extra_space(s):
            if mode == EASY_MODE:
                return s, jnp.zeros((), i32)
            return self.randn(s, 2)

        s, ex1 = extra_space(s)
        bottom_road_y = ex1 + 1

        max_diff = 3 if mode == EASY_MODE else 4
        s, difficulty = self.randn(s, max_diff + 1)

        if mode == EASY_MODE:
            extra_lane_option = jnp.zeros((), i32)
        else:
            s, extra_lane_option = self.randn(s, 4)

        lo_c, hi_c = self.car_speed
        lo_l, hi_l = self.log_speed

        num_road = difficulty + (extra_lane_option == 2).astype(i32)
        road_speeds = jnp.zeros((MAX_LANES,), f32)
        grid = s.grid
        for lane in range(MAX_LANES):
            on = lane < num_road
            g2, sgn01 = rng.rand01(s.rand_gen)
            sgn = jnp.where(sgn01 < 0.5, 1.0, -1.0)
            g2, spd = rng.randrange(g2, lo_c, hi_c)
            s = s.replace(
                rand_gen=jax.tree_util.tree_map(
                    lambda a, b: jnp.where(on, a, b), g2, s.rand_gen
                )
            )
            road_speeds = road_speeds.at[lane].set(
                jnp.where(on, sgn * spd, 0.0)
            )
            row = bottom_road_y + lane
            gy = jnp.arange(self.world_dim)[:, None]
            grid = jnp.where(on & (gy == row), ROAD, grid)

        s, ex2 = extra_space(s)
        bottom_water_y = bottom_road_y + num_road + ex2 + 1

        num_water = difficulty + (extra_lane_option == 3).astype(i32)
        water_speeds = jnp.zeros((MAX_LANES,), f32)
        s, csgn01 = self.rand01(s)
        curr_sign = jnp.where(csgn01 < 0.5, 1.0, -1.0)
        for lane in range(MAX_LANES):
            on = lane < num_water
            g2, spd = rng.randrange(s.rand_gen, lo_l, hi_l)
            s = s.replace(
                rand_gen=jax.tree_util.tree_map(
                    lambda a, b: jnp.where(on, a, b), g2, s.rand_gen
                )
            )
            water_speeds = water_speeds.at[lane].set(
                jnp.where(on, curr_sign * spd, 0.0)
            )
            curr_sign = jnp.where(on, -curr_sign, curr_sign)
            row = bottom_water_y + lane
            gy = jnp.arange(self.world_dim)[:, None]
            grid = jnp.where(on & (gy == row), WATER, grid)

        goal_y = bottom_water_y + num_water + 1
        s = s.replace(
            grid=grid,
            game=LeaperState(
                bottom_road_y=bottom_road_y,
                road_lane_speeds=road_speeds,
                num_road_lanes=num_road,
                bottom_water_y=bottom_water_y,
                water_lane_speeds=water_speeds,
                num_water_lanes=num_water,
                goal_y=goal_y,
            ),
        )

        # warmup: pre-roll spawns (leaper.cpp:176-180); compacting
        # out-of-bounds entities is behaviour-preserving (module docstring)
        def warm(s, _):
            d, norm = rng.peek_block(s.rand_gen, self.MAX_STEP_DRAWS)
            s = s.replace(rand_gen=norm)
            s, d = self._spawn_entities(s, d)
            s = s.replace(rand_gen=rng.commit(s.rand_gen, d))
            s = self.step_entities(s)
            e = s.ents
            oob = self.is_out_of_bounds_mask(s)
            s = s.replace(ents=e.compact(~(e.auto_erase & oob)))
            return s, None

        s, _ = jax.lax.scan(warm, s, None, length=self.warmup_steps)

        w2 = self.world_dim / 2.0
        f = default_fields(
            w2, goal_y.astype(f32) - 0.5, 0.0, 0.0, w2, 0.5, FINISH_LINE
        )
        return s.replace(ents=s.ents.push(f))

    # -- per-step -----------------------------------------------------------

    def game_step(self, s: BasicState, d):
        # frog hop animation frames (leaper.cpp:250-252)
        th = s.ents.image_theme[0]
        th = jnp.where(th >= 1, (th + 1) % FROG_ANIMATION_FRAMES, th)
        s = s.replace(ents=s.ents.set_fields(0, image_theme=th))

        s, d = self.game_step_base(s, d)
        s, d = self._spawn_entities(s, d)

        # standing on a log? (leaper.cpp:258-268; last matching log wins)
        e = s.ents
        margin = -e.rx[0]
        on_log = (
            e.active
            & (e.type == LOG)
            & (jnp.abs(e.x[0] - e.x) < e.rx[0] + e.rx + margin)
            & (jnp.abs(e.y[0] - e.y) < e.ry[0] + e.ry + margin)
        )
        standing = jnp.any(on_log)
        last = jnp.max(jnp.where(on_log, jnp.arange(self.ENT_CAP), -1))
        log_vx = e.vx[jnp.maximum(last, 0)]

        cell = self.get_obj(s, e.x[0].astype(i32), e.y[0].astype(i32))
        drown = (
            (cell == WATER) & ~standing & (e.vx[0] == 0) & (e.vy[0] == 0)
        )
        s = s.replace(
            done=s.done | drown,
            ents=s.ents.set_fields(
                0, x=e.x[0] + jnp.where(standing, log_vx, 0.0)
            ),
        )
        s = s.replace(done=s.done | self.is_out_of_bounds_mask(s)[0])
        return s, d
