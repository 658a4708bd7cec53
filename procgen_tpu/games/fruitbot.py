"""Fruitbot: scrolling dodge — fruit +1, junk −4, finish line +10; key
bullets unlock gated doors.  Reference: procgen/src/games/fruitbot.cpp.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from ..core import rng
from ..core.constants import EASY_MODE, PLAYER, WALL_OBJ
from ..core.entities import default_fields
from ..core.game import BasicAbstractGame, BasicState, tree_where
from .registry import register

i32 = jnp.int32
f32 = jnp.float32

COMPLETION_BONUS = 10.0
POSITIVE_REWARD = 1.0
PENALTY = -4.0

BARRIER = 1
OUT_OF_BOUNDS_WALL = 2
PLAYER_BULLET = 3
BAD_OBJ = 4
GOOD_OBJ = 7
LOCKED_DOOR = 10
LOCK = 11
PRESENT = 12

KEY_DURATION = 8
DOOR_ASPECT_RATIO = 3.25
PI = math.pi

NUM_WALLS_HARD = 10
NUM_WALLS_EASY = 5


@struct.dataclass
class FruitbotState:
    last_fire_time: jnp.ndarray


@register("fruitbot")
class Fruitbot(BasicAbstractGame):
    name = "fruitbot"
    ENT_CAP = 112  # 2 walls/row x10 + door+lock + 20 presents + 38 objs + bullets
    DISPATCH_VECTORIZED = True
    ANY_COLLIDES_WITH_ENTITIES = True  # player bullets
    MAX_STEP_DRAWS = 4
    MAX_SUB_STEPS = 4  # |v| <= sqrt(.85^2+.2^2)

    def __init__(self, options):
        super().__init__(options)
        self.mixrate = 0.5
        self.maxspeed = 0.85
        self.bullet_vscale = 0.5
        self.bg_tile_ratio = -1
        self.out_of_bounds_object = OUT_OF_BOUNDS_WALL
        self.world_w = 10 if options.distribution_mode == EASY_MODE else 20
        self.WORLD_DIM_MAX = (self.world_w, 60)

    def background_names(self):
        from ..render.assets import TOPDOWN_BACKGROUNDS

        return TOPDOWN_BACKGROUNDS

    def asset_for_type(self, type_):
        # fruitbot.cpp:46-76
        if type_ == PLAYER:
            return ["misc_assets/robot_3Dblue.png"]
        if type_ in (BARRIER, OUT_OF_BOUNDS_WALL):
            return ["misc_assets/tileStone_slope.png"]
        if type_ == PLAYER_BULLET:
            return ["misc_assets/keyRed2.png"]
        if type_ == BAD_OBJ:
            return [f"misc_assets/food{i}.png" for i in range(1, 7)]
        if type_ == GOOD_OBJ:
            return [f"misc_assets/fruit{i}.png" for i in range(1, 7)]
        if type_ == LOCKED_DOOR:
            return ["misc_assets/fenceYellow.png"]
        if type_ == LOCK:
            return ["misc_assets/lockRed2.png"]
        if type_ == PRESENT:
            return [f"misc_assets/present{i}.png" for i in range(1, 4)]
        return []

    def use_block_asset(self, type_):
        return type_ in (BARRIER, LOCKED_DOOR, PRESENT)

    def entity_tile_ratio(self, s, e):
        # fruitbot.cpp:85-92
        return jnp.where(
            e.type == BARRIER,
            1.0,
            jnp.where(e.type == LOCKED_DOOR, DOOR_ASPECT_RATIO, 0.0),
        )

    def game_init_state(self):
        return FruitbotState(last_fire_time=jnp.zeros((), i32))

    def choose_world_dim(self, s):
        return s.replace(
            main_width=jnp.asarray(self.world_w, i32),
            main_height=jnp.asarray(60, i32),
        )

    # -- physics ------------------------------------------------------------

    def will_reflect(self, src_type, target_type):
        return (src_type == BAD_OBJ) & (
            (target_type == BARRIER) | (target_type == WALL_OBJ)
        )

    def is_blocked(self, s, src_type, target_type, is_horizontal):
        b = super().is_blocked(s, src_type, target_type, is_horizontal)
        return b | ((src_type == PLAYER) & (target_type == OUT_OF_BOUNDS_WALL))

    def set_action_xy(self, s, move_action):
        # forced upward scroll (fruitbot.cpp:157-161)
        return s.replace(
            action_vx=(move_action // 3 - 1).astype(f32),
            action_vy=f32(0.2),
            action_vrot=f32(0.0),
        )

    def camera(self, s):
        # fruitbot.cpp:139-143
        w = s.main_width.astype(f32)
        cx = w / 2.0
        cy = s.ents.y[0] + w / 2.0 - 2 * s.ents.ry[0]
        return cx, cy, w

    # -- collisions ---------------------------------------------------------

    def handle_agent_collision_vec(self, s, d, hit):
        # fruitbot.cpp:96-117
        e = s.ents
        deadly = jnp.any(hit & ((e.type == BARRIER) | (e.type == LOCKED_DOOR)))
        bad = hit & (e.type == BAD_OBJ)
        good = hit & (e.type == GOOD_OBJ)
        present = jnp.any(hit & (e.type == PRESENT))
        s = s.replace(
            done=s.done | deadly | present,
            reward=s.reward
            + jnp.sum(bad).astype(f32) * PENALTY
            + jnp.sum(good).astype(f32) * POSITIVE_REWARD
            + jnp.where(present, f32(COMPLETION_BONUS), 0.0),
            level_complete=s.level_complete | present,
            ents=e.replace(will_erase=e.will_erase | bad | good),
        )
        return s, d

    def dispatch_entity_pairs(self, s, d):
        """Bullet vs barrier/lock (fruitbot.cpp:119-137).  Bullets are rare
        (1 per 8 steps, expire in 8): per-bullet winner = highest-slot
        colliding target, matching the reverse inner scan."""
        e = s.ents
        slots = jnp.arange(self.ENT_CAP)
        is_bullet = e.active & (e.type == PLAYER_BULLET) & ~e.will_erase
        # pair matrix [bullet, target]
        dx = jnp.abs(e.x[:, None] - e.x[None, :])
        dy = jnp.abs(e.y[:, None] - e.y[None, :])
        overlap = (dx < e.rx[:, None] + e.rx[None, :] + e.collision_margin[:, None]) & (
            dy < e.ry[:, None] + e.ry[None, :] + e.collision_margin[:, None]
        )
        target_ok = (
            e.active[None, :]
            & ~e.will_erase[None, :]
            & ((e.type[None, :] == BARRIER) | (e.type[None, :] == LOCK))
            & (slots[None, :] != slots[:, None])
        )
        pair = overlap & is_bullet[:, None] & target_ok
        winner = jnp.max(
            jnp.where(pair, slots[None, :], -1), axis=1
        )  # highest slot processed first in the reverse scan
        has_hit = winner >= 0
        wtype = e.type[jnp.maximum(winner, 0)]
        bullet_erase = has_hit  # both barrier and lock erase the bullet
        lock_hit = has_hit & (wtype == LOCK)
        # erase the hit locks
        lock_slots = jnp.where(lock_hit, winner, self.ENT_CAP)  # OOB -> drop
        lock_erase = jnp.zeros((self.ENT_CAP,), bool).at[lock_slots].set(
            True, mode="drop"
        )
        # erase the door paired with each hit lock: |door.y - lock.y| < 1
        lock_y = e.y[jnp.maximum(winner, 0)]
        is_door = e.active & (e.type == LOCKED_DOOR)
        locks_hit_y = jnp.where(lock_hit, lock_y, jnp.inf)
        ddy = jnp.abs(e.y[:, None] - locks_hit_y[None, :])  # [door, bullet]
        door_die = is_door & jnp.any(ddy < 1, axis=1)
        s = s.replace(
            ents=e.replace(
                will_erase=e.will_erase | bullet_erase | lock_erase | door_die
            )
        )
        return s, d

    # -- reset --------------------------------------------------------------

    def _add_walls(self, s, d, ry, use_door, min_pct):
        """fruitbot.cpp:163-190."""
        rw = float(self.world_w)
        wall_ry = 0.3
        lock_rx = 0.25
        lock_ry = 0.45

        d, p01 = d.rand01()
        pct = min_pct + 0.2 * p01

        lock_pct_w = 2 * lock_rx / rw
        door_pct_w = (wall_ry * 2 * DOOR_ASPECT_RATIO) / rw
        num_doors = jnp.ceil(
            (pct + 0.1 - 2 * lock_pct_w) / door_pct_w
        )
        pct_door = 2 * lock_pct_w + door_pct_w * num_doors
        pct = jnp.where(use_door, pct_door, pct)

        gapw = pct * rw
        d, w01 = d.rand01_if(True)
        w1 = w01 * (rw - gapw)
        w2 = rw - w1 - gapw

        f1 = default_fields(w1 / 2, ry, 0.0, 0.0, w1 / 2, wall_ry, BARRIER)
        f2 = default_fields(rw - w2 / 2, ry, 0.0, 0.0, w2 / 2, wall_ry, BARRIER)
        s = s.replace(ents=s.ents.push(f1))
        s = s.replace(ents=s.ents.push(f2))

        d, right01 = d.randn_if(use_door, 2)
        is_on_right = right01
        lock_x = w1 + lock_rx + is_on_right * (gapw - 2 * lock_rx)
        door_x = w1 + gapw / 2 - (is_on_right * 2 - 1) * lock_rx
        df = default_fields(
            door_x, ry, 0.0, 0.0, gapw / 2 - lock_rx, wall_ry, LOCKED_DOOR
        )
        lf = default_fields(
            lock_x, ry - lock_ry + wall_ry, 0.0, 0.0, lock_rx, lock_ry, LOCK
        )
        s = s.replace(ents=s.ents.push(df, do=use_door))
        s = s.replace(ents=s.ents.push(lf, do=use_door))
        return s, d

    def game_reset(self, s: BasicState) -> BasicState:
        s = self.game_reset_base(s)
        easy = self.options.distribution_mode == EASY_MODE
        min_sep = 4
        num_walls = NUM_WALLS_EASY if easy else NUM_WALLS_HARD
        object_group_size = 2 if easy else 6
        buf_h = 4
        door_prob = 0.0 if easy else 0.125
        min_pct = 0.2 if easy else 0.1
        h = 60

        d, norm = rng.peek_block(s.rand_gen, rng.N)
        s = s.replace(rand_gen=norm)

        # partition(x, n): x draws of randn(n) (randgen.cpp:33-41)
        x_total = h - min_sep * num_walls - buf_h
        parts = jnp.zeros((num_walls,), i32)

        def part_body(carry, _):
            d_, parts = carry
            d_, k = d_.randn(num_walls)
            return (d_, parts.at[k].add(1)), None

        (d, parts), _ = jax.lax.scan(
            part_body, (d, parts), None, length=x_total
        )

        curr_h = jnp.zeros((), i32)
        for wi in range(num_walls):
            dy = min_sep + parts[wi]
            curr_h = curr_h + dy
            # `(dy > 5) && rand01() < door_prob` short-circuits: the roll is
            # drawn only for tall-enough gaps (fruitbot.cpp:224)
            d, droll = d.rand01_if(dy > 5)
            use_door = (dy > 5) & (droll < door_prob)
            s, d = self._add_walls(s, d, curr_h.astype(f32), use_door, min_pct)

        s = s.replace(
            ents=s.ents.set_fields(0, y=s.ents.ry[0], rotation=-PI / 2)
        )

        d, g0 = d.randn(10)
        num_good = g0 + 10
        d, b0 = d.randn(10)
        num_bad = b0 + 10

        # presents across the top row (fruitbot.cpp:216-219)
        for i in range(self.world_w):
            d, th = d.randn(self.num_themes(PRESENT))
            f = default_fields(i + 0.5, h - 0.5, 0.0, 0.0, 0.5, 0.5, PRESENT)
            f["image_theme"] = th
            s = s.replace(ents=s.ents.push(f))

        s = s.replace(rand_gen=rng.commit(s.rand_gen, d))

        # good/bad objects via spawn_entities (reposition draws, checked)
        for kind, num, cap in ((GOOD_OBJ, num_good, 19), (BAD_OBJ, num_bad, 19)):
            for i in range(cap):
                do = i < num
                fields = default_fields(0.0, 0.0, 0.0, 0.0, 0.5, 0.5, kind)
                s2, fields2 = self.reposition(
                    s, fields, 0.0, 0.0, float(self.world_w), float(h), True
                )
                s = tree_where(do, s2.replace(ents=s2.ents.push(fields2)), s)

        # themes + fit_aspect_ratio for all good/bad objects
        # (fruitbot.cpp:224-229): iterated in entity order
        def theme_body(i, carry):
            s, g = carry
            e = s.ents
            is_obj = (
                (i < e.count)
                & ((e.type[i] == GOOD_OBJ) | (e.type[i] == BAD_OBJ))
            )
            g2, th = rng.randn(g, object_group_size)
            g = tree_where(is_obj, g2, g)
            gtab = self.aspect_ratios(GOOD_OBJ)
            btab = self.aspect_ratios(BAD_OBJ)
            ar = jnp.where(
                e.type[i] == GOOD_OBJ,
                gtab[jnp.clip(th, 0, 5)],
                btab[jnp.clip(th, 0, 5)],
            )
            ry = jnp.where(ar > 1, e.rx[i] / ar, e.ry[i])
            rx = jnp.where(ar > 1, e.rx[i], e.ry[i] * ar)
            s = s.replace(
                ents=e.set_fields_where(
                    i, is_obj, image_theme=th, rx=rx, ry=ry
                )
            )
            return (s, g)

        s, g = jax.lax.fori_loop(
            0, self.ENT_CAP, theme_body, (s, s.rand_gen)
        )
        s = s.replace(rand_gen=g, game=FruitbotState(last_fire_time=jnp.zeros((), i32)))
        return s

    # -- per-step -----------------------------------------------------------

    def game_step(self, s: BasicState, d):
        s, d = self.game_step_base(s, d)

        fire = (s.special_action == 1) & (
            (s.cur_time - s.game.last_fire_time) >= KEY_DURATION
        )
        f = default_fields(
            s.ents.x[0], s.ents.y[0], 0.0, 1.0 * self.bullet_vscale, 0.25, 0.25,
            PLAYER_BULLET,
        )
        f["expire_time"] = KEY_DURATION
        f["collides_with_entities"] = True
        s = s.replace(
            ents=s.ents.push(f, do=fire),
            game=s.game.replace(
                last_fire_time=jnp.where(fire, s.cur_time, s.game.last_fire_time)
            ),
        )
        return s, d
