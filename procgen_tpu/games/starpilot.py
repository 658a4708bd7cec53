"""Starpilot: side-scrolling shooter; kills +1, survive to the finish ship
at t=500 for +10.  Reference: procgen/src/games/starpilot.cpp.

The entire spawn timeline is pre-rolled at reset into a sorted ``spawners``
entity pool (starpilot.cpp:226-344); each step the due spawners transfer
into the live pool — which serializes naturally as part of the state pytree.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import struct

from ..core import rng
from ..core.constants import EASY_MODE, EXPLOSION, EXTREME_MODE, HARD_MODE, PLAYER
from ..core.entities import Entities, default_fields
from ..core.game import BasicAbstractGame, BasicState, tree_where
from .registry import register

i32 = jnp.int32
f32 = jnp.float32

V_SCALE = 2.0 / 5.0
ENEMY_REWARD = 1.0
COMPLETION_BONUS = 10.0

BULLET_PLAYER = 1
BULLET2 = 2
BULLET3 = 3
FLYER = 4
METEOR = 5
CLOUD = 6
TURRET = 7
FAST_FLYER = 8
FINISH_LINE = 9

SHOOTER_WIN_TIME = 500
NUM_BASIC_OBJECTS = 9
NUM_SHIP_THEMES = 7
PI = math.pi

SPAWNER_CAP = 288  # <=46 groups x <=6 flyers


def _is_lethal(t):
    return (
        (t == FLYER) | (t == FAST_FLYER) | (t == BULLET2) | (t == BULLET3)
        | (t == TURRET) | (t == METEOR)
    )


def _is_destructible(t):
    return (t == FLYER) | (t == FAST_FLYER) | (t == TURRET) | (t == METEOR)


@struct.dataclass
class StarpilotState:
    spawners: Entities  # ascending spawn_time; cursor = number consumed
    spawn_cursor: jnp.ndarray


@register("starpilot")
class Starpilot(BasicAbstractGame):
    PALLAS_BG = "scroll"
    name = "starpilot"
    WORLD_DIM_MAX = (16, 16)
    ENT_CAP = 64
    DECOR_CAP = 32  # explosions
    DISPATCH_VECTORIZED = True
    ANY_COLLIDES_WITH_ENTITIES = True
    MAX_STEP_DRAWS = 8
    # enemy bullets aim at the agent (face_direction, starpilot.cpp:389)
    ARB_ROT_TYPES = (1, 2, 3)  # BULLET_PLAYER, BULLET2, BULLET3
    MAX_SUB_STEPS = 6

    def __init__(self, options):
        super().__init__(options)
        mode = options.distribution_mode
        if mode not in (EASY_MODE, HARD_MODE, EXTREME_MODE):
            raise ValueError(f"starpilot does not support mode {mode}")
        self.mode = mode

        # init_hps (starpilot.cpp:147-224)
        self.hp_vs = [1.0] * NUM_BASIC_OBJECTS
        self.hp_healths = [0.0] * NUM_BASIC_OBJECTS
        self.hp_weight = [1.0] * NUM_BASIC_OBJECTS
        self.hp_object_r = [0.5] * NUM_BASIC_OBJECTS
        default_bullet_r = 1 / 2.5
        if mode == EASY_MODE:
            for t in (METEOR, CLOUD, TURRET, FAST_FLYER):
                self.hp_weight[t] = 0.0
            self.hp_vs[FLYER] = 0.75
            self.hp_vs[BULLET2] = 1.25
            self.hp_healths[TURRET] = 5
            self.hp_healths[FLYER] = 2
            self.hp_healths[FAST_FLYER] = 1
            self.maxspeed = 0.75
        elif mode == HARD_MODE:
            self.hp_vs[BULLET2] = 2
            self.hp_healths[TURRET] = 5
            self.hp_healths[FLYER] = 2
            self.hp_healths[FAST_FLYER] = 1
            self.maxspeed = 0.75
        else:
            self.hp_vs[BULLET2] = 2
            self.hp_healths[TURRET] = 10
            self.hp_healths[FLYER] = 5
            self.hp_healths[FAST_FLYER] = 2
            self.maxspeed = 0.5
            default_bullet_r = 1 / 5
        self.hp_bullet_r = [default_bullet_r] * NUM_BASIC_OBJECTS
        self.hp_healths[METEOR] = 500
        self.hp_vs[FAST_FLYER] = 1.5
        self.hp_vs[BULLET_PLAYER] = 2
        self.hp_vs[BULLET3] = 2
        self.hp_object_r[TURRET] = 2.0
        self.hp_object_r[METEOR] = 2.0
        self.hp_object_r[CLOUD] = 2.0
        self.hp_weight[FLYER] = 3.0
        self.hp_slow_v = 0.5
        self.hp_max_group_size = 5
        self.hp_min_dt = 10
        self.hp_max_dt = 30
        self.hp_spawn_right_threshold = 0.9
        self.hp_weight[BULLET_PLAYER] = 0.0
        self.hp_weight[BULLET2] = 0.0
        self.hp_weight[BULLET3] = 0.0
        self.total_weight = sum(self.hp_weight[2:])

    def background_names(self):
        from ..render.assets import SPACE_BACKGROUNDS

        return SPACE_BACKGROUNDS

    def paint_background(self, s, res, sx, sy, bg_atlas):
        """Time-scrolled background tiling (starpilot.cpp:107-122).

        18 square tiles of side 3*res (bg_k=3, BG_RATIO=18), top edge at
        -res, scrolled left by cur_time * scale * hp_slow_v * 2 / char_dim
        pixels (char_dim=5, basic-abstract-game.cpp:24).  Sampled with the
        same separable one-hot matmuls as the standard pass.
        """
        bf16 = jnp.bfloat16
        pix = jnp.asarray(bg_atlas.pixels)  # [n, BH, BW, 3]
        BH, BW = bg_atlas.BH, bg_atlas.BW
        bi = jnp.clip(s.background_index, 0, pix.shape[0] - 1)
        img = jax.lax.dynamic_index_in_dim(pix, bi, keepdims=False).astype(bf16)

        scale = f32(res) / s.main_height.astype(f32)
        x_off = -s.cur_time.astype(f32) * scale * self.hp_slow_v * 2.0 / 5.0
        side = f32(3 * res)  # tile side = rect height * bg_k
        tx = sx - x_off
        fx = tx / side
        col_idx = jnp.clip(((fx - jnp.floor(fx)) * BW).astype(jnp.int32), 0, BW - 1)
        in_x = (tx >= 0) & (tx < 18.0 * side)
        row_idx = jnp.clip(
            ((sy + f32(res)) / side * BH).astype(jnp.int32), 0, BH - 1
        )

        R = (row_idx[:, None] == jnp.arange(BH)[None, :]).astype(bf16)
        C = (
            (col_idx[:, None] == jnp.arange(BW)[None, :]) & in_x[:, None]
        ).astype(bf16)
        # one-hot picks of integers <= 255: bf16 accumulation is exact
        e1 = jnp.einsum("ph,hwc->pwc", R, img, preferred_element_type=bf16)
        samp = jnp.einsum("qw,pwc->pqc", C, e1, preferred_element_type=bf16)
        return samp.astype(jnp.int32)

    def asset_for_type(self, type_):
        # starpilot.cpp:61-109
        if type_ == PLAYER:
            return ["misc_assets/playerShip2_blue.png"]
        if type_ == BULLET_PLAYER:
            return ["misc_assets/towerDefense_tile295.png"]
        if type_ == BULLET2:
            return ["misc_assets/towerDefense_tile296.png"]
        if type_ == BULLET3:
            return ["misc_assets/towerDefense_tile297.png"]
        if type_ in (FLYER, FAST_FLYER):
            return [f"misc_assets/spaceShips_00{i}.png" for i in range(1, 8)]
        if type_ == METEOR:
            return [
                "misc_assets/spaceMeteors_001.png",
                "misc_assets/spaceMeteors_002.png",
                "misc_assets/spaceMeteors_003.png",
                "misc_assets/spaceMeteors_004.png",
                "misc_assets/meteorGrey_big1.png",
                "misc_assets/meteorGrey_big2.png",
                "misc_assets/meteorGrey_big3.png",
                "misc_assets/meteorGrey_big4.png",
            ]
        if type_ == CLOUD:
            return [f"misc_assets/spaceEffect{i}.png" for i in range(1, 10)]
        if type_ == TURRET:
            return [
                "misc_assets/spaceStation_018.png",
                "misc_assets/spaceStation_019.png",
            ]
        if type_ == FINISH_LINE:
            return [f"misc_assets/spaceRockets_00{i}.png" for i in range(1, 5)]
        return []

    def game_init_state(self):
        return StarpilotState(
            spawners=Entities.zeros(SPAWNER_CAP),
            spawn_cursor=jnp.zeros((), i32),
        )

    def choose_world_dim(self, s):
        return s.replace(
            main_width=jnp.asarray(16, i32), main_height=jnp.asarray(16, i32)
        )

    # -- collisions ---------------------------------------------------------

    def handle_agent_collision_vec(self, s, d, hit):
        # starpilot.cpp:126-136
        e = s.ents
        finish = jnp.any(hit & (e.type == FINISH_LINE))
        lethal = jnp.any(hit & _is_lethal(e.type))
        return s.replace(
            done=s.done | finish | lethal,
            reward=s.reward + jnp.where(finish, f32(COMPLETION_BONUS), 0.0),
            level_complete=s.level_complete | finish,
        ), d

    def dispatch_entity_pairs(self, s, d):
        """Player bullets damage destructibles (starpilot.cpp:138-146)."""
        e = s.ents
        is_pb = e.active & (e.type == BULLET_PLAYER) & ~e.will_erase
        is_target = (
            e.active & ~e.will_erase & _is_destructible(e.type) & (e.type != CLOUD)
        )
        dx = jnp.abs(e.x[:, None] - e.x[None, :])
        dy = jnp.abs(e.y[:, None] - e.y[None, :])
        overlap = (
            dx < e.rx[:, None] + e.rx[None, :] + e.collision_margin[:, None]
        ) & (dy < e.ry[:, None] + e.ry[None, :] + e.collision_margin[:, None])
        pair = overlap & is_pb[:, None] & is_target[None, :]
        # a bullet erases on its FIRST dispatched pair (inner loop reverse:
        # highest target slot) and the will_erase guard blocks the rest —
        # each bullet damages exactly ONE target (starpilot.cpp:140,
        # basic-abstract-game.cpp:741)
        tgt = jnp.max(
            jnp.where(pair, jnp.arange(self.ENT_CAP)[None, :], -1), axis=1
        )
        pair_win = pair & (jnp.arange(self.ENT_CAP)[None, :] == tgt[:, None])
        bullet_hit = tgt >= 0
        hits = jnp.sum(pair_win, axis=0).astype(f32)
        s = s.replace(
            ents=e.replace(
                will_erase=e.will_erase | bullet_hit,
                health=e.health - jnp.where(is_target, hits, 0.0),
            )
        )

        ti = jnp.maximum(tgt, 0)
        f = default_fields(
            e.x, e.y, e.vx[ti], e.vy[ti], 0.5 * e.rx, 0.5 * e.rx, EXPLOSION
        )
        s = s.replace(decor=s.decor.push_many(f, bullet_hit))
        return s, d

    # -- reset --------------------------------------------------------------

    def game_reset(self, s: BasicState) -> BasicState:
        s = self.game_reset_base(s)
        g = s.rand_gen

        # add_spawners (starpilot.cpp:226-327) into a spawner pool
        spawners = Entities.zeros(SPAWNER_CAP)
        w = [jnp.asarray(x, f32) for x in self.hp_weight]
        flyer_nthemes = self.num_themes(FLYER)
        cloud_nthemes = self.num_themes(CLOUD)
        meteor_nthemes = self.num_themes(METEOR)
        turret_nthemes = self.num_themes(TURRET)
        turret_ar = self.aspect_ratios(TURRET)

        g, t0 = rng.randint(g, self.hp_min_dt, self.hp_max_dt)
        t = 1 + t0

        def group(carry, _):
            g, t, spawners = carry
            live = t <= SHOOTER_WIN_TIME

            g2, sw01 = rng.rand01(g)
            start_weight = sw01 * self.total_weight
            # weighted type selection (starpilot.cpp:233-247)
            cw = start_weight
            type_ = jnp.asarray(NUM_BASIC_OBJECTS - 1, i32)
            chosen = jnp.asarray(False)
            for tt in range(2, NUM_BASIC_OBJECTS):
                cw = cw - w[tt]
                hit = ~chosen & (cw <= 0)
                type_ = jnp.where(hit, tt, type_)
                chosen = chosen | hit

            is_flyer = (type_ == FLYER) | (type_ == FAST_FLYER)
            # group-size + flyer-theme draws happen only for flyers
            # (starpilot.cpp:252-255)
            g2b, gs0 = rng.randint(g2, 0, self.hp_max_group_size)
            g2b, fth = rng.randn(g2b, flyer_nthemes)
            g2 = tree_where(is_flyer, g2b, g2)
            group_size = jnp.where(is_flyer, gs0 + 1, 1)
            r_tab = jnp.asarray(self.hp_object_r, f32)
            r = r_tab[type_]
            g2, ypos = _rand_pos(g2, r, 16.0)

            # per-member draws (j < group_size)
            for j in range(6):
                jon = live & (j < group_size)
                g3, ft0 = rng.randint(g2, 10, 100)
                fire_time = ft0
                g3, th01 = rng.rand01(g3)
                theta = (th01 - 0.5) * (2 * PI / 4)
                g3, zro = rng.randint(g3, 0, 2)
                theta = jnp.where(zro == 1, 0.0, theta)
                vtab = jnp.asarray(self.hp_vs, f32)
                v_scale = vtab[type_]
                is_mc = (type_ == METEOR) | (type_ == CLOUD)
                is_turret = type_ == TURRET
                g3b, tft0 = rng.randint(g3, 20, 30)
                g3 = tree_where(is_turret, g3b, g3)
                theta = jnp.where(is_mc | is_turret, 0.0, theta)
                v_scale = jnp.where(is_mc | is_turret, self.hp_slow_v, v_scale)
                fire_time = jnp.where(
                    is_mc, -1, jnp.where(is_turret, tft0, fire_time)
                )
                v_scale = v_scale * V_SCALE
                vx = -jnp.cos(theta) * v_scale
                vy = jnp.sin(theta) * v_scale

                g3b, sr01 = rng.rand01(g3)
                can_left = self.mode != EASY_MODE
                g3 = tree_where(is_flyer, g3b, g3)
                spawn_right = ~(is_flyer & (sr01 > self.hp_spawn_right_threshold) & can_left)
                x_pos = jnp.where(spawn_right, 16.0 + r, -r)
                vx = jnp.where(spawn_right, vx, -vx)

                # themes (starpilot.cpp:303-315): one conditional raw draw,
                # modulus per type (choose_random_theme = randn(num_themes))
                g3b, xraw = rng.next_u32(g3)
                g3 = tree_where(is_mc | is_turret, g3b, g3)
                theme = jnp.where(
                    type_ == CLOUD, (xraw % cloud_nthemes).astype(i32),
                    jnp.where(
                        type_ == METEOR, (xraw % meteor_nthemes).astype(i32),
                        jnp.where(
                            is_turret, (xraw % turret_nthemes).astype(i32),
                            jnp.where(is_flyer, fth, 0),
                        ),
                    ),
                )

                f = default_fields(x_pos, ypos, vx, vy, r, r, type_)
                f["fire_time"] = fire_time
                f["spawn_time"] = t + j * 5
                f["health"] = jnp.asarray(self.hp_healths, f32)[type_]
                f["image_theme"] = theme
                f["render_z"] = jnp.where(type_ == CLOUD, 1, 0)
                f["rotation"] = jnp.where(
                    is_flyer, jnp.where(vx > 0, -1.0, 1.0) * PI / 2, 0.0
                )
                f["ry"] = jnp.where(
                    is_turret, r / turret_ar[jnp.clip(theme, 0, 1)], r
                )
                spawners = spawners.push(f, do=jon)
                g2 = tree_where(jon, g3, g2)

            g2, dt0 = rng.randint(g2, self.hp_min_dt, self.hp_max_dt)
            t_next = t + dt0
            g = tree_where(live, g2, g)
            t = jnp.where(live, t_next, t)
            return (g, t, spawners), None

        (g, t, spawners), _ = jax.lax.scan(
            group, (g, t, spawners), None, length=50
        )

        # sort ascending by spawn_time (C++ sorts descending and pops the
        # back, starpilot.cpp:28-30,346)
        key = jnp.where(spawners.active, spawners.spawn_time, 10**9)
        order = jnp.argsort(key, stable=True)
        upd = {
            k: getattr(spawners, k)[order]
            for k in spawners.__dataclass_fields__
            if k != "count"
        }
        spawners = spawners.replace(**upd)

        g, agent_theme = rng.randn(g, self.num_themes(PLAYER))
        s = s.replace(
            rand_gen=g,
            ents=s.ents.set_fields(
                0, rotation=PI / 2, image_theme=agent_theme
            ),
            game=StarpilotState(
                spawners=spawners, spawn_cursor=jnp.zeros((), i32)
            ),
        )
        return s

    # -- per-step -----------------------------------------------------------

    def game_step(self, s: BasicState, d):
        s, d = self.game_step_base(s, d)
        e = s.ents
        gm = s.game

        # enemy fire + destruction (starpilot.cpp:366-392), vectorised
        slots = jnp.arange(self.ENT_CAP)
        nonplayer = e.active & (slots != 0)
        ft = e.fire_time
        turret_fires = (
            nonplayer
            & (e.type == TURRET)
            & (ft > 0)
            & ((s.cur_time - e.spawn_time) % jnp.maximum(ft, 1) == 0)
        )
        other_fires = (
            nonplayer
            & (e.type != TURRET)
            & (ft > 0)
            & (s.cur_time - e.spawn_time == ft)
        )
        fires = turret_fires | other_fires

        # reverse order pushes (C++ loop is reverse) — one batched push
        rev = slice(None, None, -1)
        btype = jnp.where(e.type == TURRET, BULLET3, BULLET2)
        br = jnp.asarray(self.hp_bullet_r, f32)[
            jnp.clip(e.type, 0, NUM_BASIC_OBJECTS - 1)
        ]
        bvx = e.x[0] - e.x
        bvy = e.y[0] - e.y
        norm = jnp.sqrt(bvx * bvx + bvy * bvy)
        vtab = jnp.asarray(self.hp_vs, f32)
        sc = vtab[btype] * V_SCALE / jnp.maximum(norm, 1e-6)
        f = default_fields(
            e.x[rev], e.y[rev], (bvx * sc)[rev], (bvy * sc)[rev],
            br[rev], br[rev], btype[rev],
        )
        f["rotation"] = (-jnp.arctan2(bvy * sc, bvx * sc) + (-PI / 2))[rev]
        s = s.replace(ents=s.ents.push_many(f, fires[rev]))

        e = s.ents
        dies = (
            e.active
            & (slots != 0)
            & (e.health <= 0)
            & _is_destructible(e.type)
            & ~e.will_erase
        )
        s = s.replace(
            reward=s.reward + jnp.sum(dies).astype(f32) * ENEMY_REWARD,
            ents=e.replace(will_erase=e.will_erase | dies),
        )

        rev = slice(None, None, -1)
        f = default_fields(
            e.x[rev], e.y[rev], e.vx[rev], e.vy[rev],
            0.5 * e.rx[rev], 0.5 * e.rx[rev], EXPLOSION,
        )
        s = s.replace(decor=s.decor.push_many(f, dies[rev]))

        # release due spawners (starpilot.cpp:394-397)
        sp = s.game.spawners

        def release(carry):
            s, cursor = carry
            f = {
                k: getattr(sp, k)[jnp.clip(cursor, 0, SPAWNER_CAP - 1)]
                for k in sp.__dataclass_fields__
                if k != "count"
            }
            s = s.replace(ents=s.ents.push(f))
            return (s, cursor + 1)

        def rel_cond(carry):
            s, cursor = carry
            return (cursor < sp.count) & (
                sp.spawn_time[jnp.clip(cursor, 0, SPAWNER_CAP - 1)] == s.cur_time
            )

        s, cursor = jax.lax.while_loop(
            rel_cond, release, (s, s.game.spawn_cursor)
        )
        s = s.replace(game=s.game.replace(spawn_cursor=cursor))

        # player fire (starpilot.cpp:399-414)
        e = s.ents
        firing = s.special_action != 0
        theta = jnp.where(s.special_action == 2, PI, 0.0)
        v_scale = self.hp_vs[BULLET_PLAYER] * V_SCALE
        vx = jnp.cos(theta) * v_scale
        vy = jnp.sin(theta) * v_scale
        br = self.hp_bullet_r[PLAYER]
        pb = default_fields(
            e.x[0] + e.rx[0] * jnp.cos(theta), e.y[0], vx, vy, br, br,
            BULLET_PLAYER,
        )
        pb["collides_with_entities"] = True
        pb["rotation"] = -jnp.arctan2(vy, vx) - PI / 2
        s = s.replace(ents=s.ents.push(pb, do=firing))

        # finish line at t=500 (starpilot.cpp:416-424)
        at_end = s.cur_time == SHOOTER_WIN_TIME
        d, fth = d.randn_if(at_end, self.num_themes(FINISH_LINE))
        fin_ar = self.aspect_ratios(FINISH_LINE)[jnp.clip(fth, 0, 3)]
        rx = 8.0 * fin_ar  # match_aspect_ratio(match_width=False)
        ff = default_fields(
            16.0 + rx, 8.0, -self.hp_slow_v * V_SCALE, 0.0, rx, 8.0, FINISH_LINE
        )
        ff["image_theme"] = fth
        s = s.replace(ents=s.ents.push(ff, do=at_end))
        return s, d


def _rand_pos(g, r, mx):
    """rand_pos(r, max) on a bare stream (cpp:1109-1121)."""
    need = (mx - 0.0) > 2 * r
    g2, v = rng.rand01(g)
    g2 = tree_where(need, g2, g)
    pos = jnp.where(need, (mx - 2 * r) * v + r, mx / 2)
    return g2, pos
