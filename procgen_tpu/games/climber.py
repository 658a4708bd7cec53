"""Climber: vertical platformer; coins +1, all coins ⇒ +10; patrolling
enemies are lethal.  Reference: procgen/src/games/climber.cpp.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core import rng
from ..core.constants import EASY_MODE, PLAYER
from ..core.entities import default_fields
from ..core.game import BasicAbstractGame, BasicState
from .registry import register

i32 = jnp.int32
f32 = jnp.float32

COIN_REWARD = 1.0
COMPLETION_BONUS = 10.0

COIN = 1
ENEMY = 5
ENEMY1 = 6
ENEMY2 = 7
PLAYER_JUMP = 9
PLAYER_RIGHT1 = 12
PLAYER_RIGHT2 = 13
WALL_MID = 15
WALL_TOP = 16
ENEMY_BARRIER = 19

PATROL_RANGE = 4
NUM_WALL_THEMES = 4
GRAVITY = 0.2
AIR_CONTROL = 0.15


def _is_wall(t):
    return (t == WALL_MID) | (t == WALL_TOP)


@struct.dataclass
class ClimberState:
    has_support: jnp.ndarray
    facing_right: jnp.ndarray
    coin_quota: jnp.ndarray
    coins_collected: jnp.ndarray
    wall_theme: jnp.ndarray


@register("climber")
class Climber(BasicAbstractGame):
    name = "climber"
    ENT_CAP = 24  # <=10 platforms x (enemy + coin) + agent
    DISPATCH_VECTORIZED = True  # enemy death + coin count commute
    MAX_STEP_DRAWS = 4
    MAX_SUB_STEPS = 10  # vy can reach -2 (no max_jump clip when falling)
    ONLY_AGENT_SMART = False  # patrol enemies
    SMART_VECTORIZABLE = True
    MAX_SMART = 12  # bound on simultaneous smart movers; worst-case rollouts: tests/test_env.py::test_max_smart_bound

    def __init__(self, options):
        super().__init__(options)
        self.out_of_bounds_object = WALL_MID
        self.world_w = 16 if options.distribution_mode == EASY_MODE else 20
        self.WORLD_DIM_MAX = (self.world_w, 64)

    def background_names(self):
        from ..render.assets import PLATFORM_BACKGROUNDS

        return PLATFORM_BACKGROUNDS

    def asset_for_type(self, type_):
        # climber.cpp:50-90
        colors = ["Blue", "Green", "Grey", "Red"]
        if type_ == PLAYER:
            return [f"platformer/player{c}_stand.png" for c in colors]
        if type_ == PLAYER_JUMP:
            return [f"platformer/player{c}_walk4.png" for c in colors]
        if type_ == PLAYER_RIGHT1:
            return [f"platformer/player{c}_walk1.png" for c in colors]
        if type_ == PLAYER_RIGHT2:
            return [f"platformer/player{c}_walk2.png" for c in colors]
        if type_ == WALL_TOP:
            return [
                "platformer/tileBlue_05.png",
                "platformer/tileGreen_05.png",
                "platformer/tileYellow_06.png",
                "platformer/tileBrown_06.png",
            ]
        if type_ == WALL_MID:
            return [
                "platformer/tileBlue_08.png",
                "platformer/tileGreen_08.png",
                "platformer/tileYellow_09.png",
                "platformer/tileBrown_09.png",
            ]
        if type_ == ENEMY1:
            return ["platformer/enemySwimming_1.png"]
        if type_ == ENEMY2:
            return ["platformer/enemySwimming_2.png"]
        if type_ == COIN:
            return ["platformer/yellowCrystal.png"]
        return []

    def use_block_asset(self, type_):
        return _is_wall(type_) if isinstance(type_, int) else False

    def game_init_state(self):
        z = jnp.zeros((), i32)
        return ClimberState(
            has_support=jnp.asarray(False),
            facing_right=jnp.asarray(True),
            coin_quota=z,
            coins_collected=z,
            wall_theme=z,
        )

    def choose_world_dim(self, s):
        return s.replace(
            main_width=jnp.asarray(self.world_w, i32),
            main_height=jnp.asarray(64, i32),
        )

    # -- physics ------------------------------------------------------------

    def is_blocked(self, s, src_type, target_type, is_horizontal):
        b = super().is_blocked(s, src_type, target_type, is_horizontal)
        return b | ((src_type == PLAYER) & _is_wall(target_type))

    def will_reflect(self, src_type, target_type):
        return (src_type == ENEMY) & (
            _is_wall(target_type) | (target_type == ENEMY_BARRIER)
        )

    def _can_support(self, t):
        return _is_wall(t) | (t == self.out_of_bounds_object)

    def set_action_xy(self, s, move_action):
        # climber.cpp:236-257
        avx = (move_action // 3 - 1).astype(f32)
        avy = (move_action % 3 - 1).astype(f32)
        avy = jnp.maximum(avy, 0.0)
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
        avy = jnp.where(has_support & (avy == 1), 1.0, 0.0)
        return s.replace(
            action_vx=avx,
            action_vy=avy,
            action_vrot=f32(0.0),
            game=g.replace(facing_right=facing, has_support=has_support),
        )

    def update_agent_velocity(self, s):
        # climber.cpp:107-117
        g = s.game
        e = s.ents
        mixrate_x = jnp.where(g.has_support, s.mixrate, s.mixrate * AIR_CONTROL)
        vx = (1 - mixrate_x) * e.vx[0] + mixrate_x * s.maxspeed * s.action_vx
        vy = jnp.where(s.action_vy > 0, s.max_jump, e.vy[0])
        vy = jnp.where(~g.has_support & (vy > -2), vy - GRAVITY, vy)
        return s.replace(ents=e.set_fields(0, vx=vx, vy=vy))

    def handle_agent_collision_vec(self, s, d, hit):
        # climber.cpp:92-103
        e = s.ents
        enemy = jnp.any(hit & (e.type == ENEMY))
        coins = hit & (e.type == COIN)
        ncoins = jnp.sum(coins).astype(i32)
        return s.replace(
            done=s.done | enemy,
            reward=s.reward + ncoins.astype(f32) * COIN_REWARD,
            ents=e.replace(will_erase=e.will_erase | coins),
            game=s.game.replace(
                coins_collected=s.game.coins_collected + ncoins
            ),
        ), d

    # -- rendering ----------------------------------------------------------

    def theme_for_grid_obj(self, s, type_):
        return jnp.where(_is_wall(type_), s.game.wall_theme, 0)

    def image_for_type(self, s, type_):
        # climber.cpp:139-153
        e = s.ents
        sup = s.game.has_support
        standing = (jnp.abs(e.vx[0]) < 0.01) & (s.action_vx == 0) & sup
        walk = jnp.where(
            ((s.cur_time // 5) % 2 == 0) | ~sup, PLAYER_RIGHT1, PLAYER_RIGHT2
        )
        player_img = jnp.where(~sup, PLAYER_JUMP, jnp.where(standing, PLAYER, walk))
        out = jnp.abs(type_)
        out = jnp.where(type_ == PLAYER, player_img, out)
        out = jnp.where(type_ == ENEMY_BARRIER, -1, out)
        return out

    def camera(self, s):
        # climber.cpp:261-265
        w = s.main_width.astype(f32)
        cx = w / 2.0
        cy = s.ents.y[0] + w / 2.0 - 5 * s.ents.ry[0]
        return cx, cy, w

    # -- reset --------------------------------------------------------------

    def game_reset(self, s: BasicState) -> BasicState:
        s = self.game_reset_base(s)
        s = s.replace(
            maxspeed=f32(0.5),
            max_jump=f32(1.5),
            ents=s.ents.set_fields(0, rx=0.5, ry=0.5, x=1.5, y=1.5),
        )
        s = self.choose_random_theme(s, 0, PLAYER)
        s, wall_theme = self.randn(s, NUM_WALL_THEMES)
        s = s.replace(
            game=ClimberState(
                has_support=jnp.asarray(False),
                facing_right=jnp.asarray(True),
                coin_quota=jnp.zeros((), i32),
                coins_collected=jnp.zeros((), i32),
                wall_theme=wall_theme,
            )
        )

        # init_floor_and_walls (climber.cpp:155-160)
        w, h = self.world_w, 64
        s = self.fill_elem(s, 0, 0, w, 1, WALL_TOP)
        s = self.fill_elem(s, 0, 0, 1, h, WALL_MID)
        s = self.fill_elem(s, w - 1, 0, 1, h, WALL_MID)
        s = self.fill_elem(s, 0, h - 1, w, 1, WALL_MID)

        return self._generate_platforms(s)

    def _generate_platforms(self, s: BasicState) -> BasicState:
        """climber.cpp:169-228."""
        w = self.world_w
        d, norm = rng.peek_block(s.rand_gen, rng.N)
        s = s.replace(rand_gen=norm)

        d, difficulty = d.randn(3)
        min_p = difficulty * difficulty + 1
        max_p = (difficulty + 1) * (difficulty + 1) + 1
        d, np0 = d.randn(max_p - min_p + 1)
        num_platforms = np0 + min_p

        d, cx0 = d.randn(w - 4)
        curr_x = cx0 + 2
        curr_y = jnp.zeros((), i32)

        margin_x = 3
        enemy_prob = 0.2 if self.options.distribution_mode == EASY_MODE else 0.5
        max_dy = int(1.5 * 1.5 / (2 * GRAVITY))  # 5
        min_dy = 3

        coin_quota = jnp.zeros((), i32)
        recs, dos = [], []

        for i in range(10):  # num_platforms <= 10
            live = i < num_platforms

            d, dy0 = d.randn_if(live, max_dy - min_dy + 1)
            delta_y = dy0 + min_dy

            can_enemy = (curr_x >= margin_x) & (curr_x <= w - margin_x)
            # `can_spawn_enemy && rand01() < p` short-circuits: the roll is
            # only drawn when spawning is possible (climber.cpp:192)
            d, eroll = d.rand01_if(live & can_enemy)
            spawn_enemy = live & can_enemy & (eroll < enemy_prob)
            # g++ evaluates add_entity's arguments right-to-left, so the vx
            # direction randn precedes the y-offset randn (climber.cpp:193)
            d, edir = d.randn_if(spawn_enemy, 2)
            d, ey0 = d.randn_if(spawn_enemy, 2)
            ef = default_fields(
                curr_x.astype(f32) + 0.5,
                (curr_y + ey0 + 2).astype(f32) + 0.5,
                0.15 * (edir * 2 - 1).astype(f32),
                0.0, 0.5, 0.5, ENEMY,
            )
            ef["image_type"] = ENEMY1
            ef["smart_step"] = True
            ef["climber_spawn_x"] = curr_x.astype(f32) + 0.5
            ar = self.aspect_ratios(ENEMY1)[0]
            ef["ry"] = 0.5 / ar  # match_aspect_ratio
            recs.append(ef)
            dos.append(spawn_enemy)

            curr_y = jnp.where(live, curr_y + delta_y, curr_y)
            d, pl0 = d.randn_if(live, 10)
            plat_len = 2 + pl0

            d, vx0 = d.randn_if(live, 2)
            vx = vx0 * 2 - 1
            vx = jnp.where(curr_x < margin_x, 1, vx)
            vx = jnp.where(curr_x > w - margin_x, -1, vx)

            # platform cells until the border (climber.cpp:203-211)
            ncand = jnp.zeros((), i32)
            grid = s.grid
            cand_xs = []
            stopped = jnp.asarray(False)
            for j in range(11):  # plat_len <= 11
                nx = curr_x + (j + 1) * vx
                ok = (
                    live & (j < plat_len) & ~stopped
                    & (nx > 0) & (nx < w - 1)
                )
                stopped = stopped | ((j < plat_len) & ~(nx > 0) & live) | (
                    live & (j < plat_len) & ~(nx < w - 1)
                )
                cand_xs.append(jnp.where(ok, nx, -1))
                ncand = ncand + ok.astype(i32)
                yy = jnp.clip(curr_y, 0, 63)
                xx = jnp.clip(nx, 0, w - 1)
                grid = grid.at[yy, xx].set(
                    jnp.where(ok, WALL_TOP, grid[yy, xx])
                )
            s = s.replace(grid=grid)
            cand_xs = jnp.stack(cand_xs)  # [11]
            cand_ok = cand_xs >= 0

            # coin (climber.cpp:213-217): rand01 always drawn
            d, croll = d.rand01_if(live)
            place_coin = live & ((croll < 0.5) | (i == 9) | (i + 1 == num_platforms))
            d, ci = d.randn_if(place_coin, jnp.maximum(ncand, 1))
            ranks = jnp.cumsum(cand_ok.astype(i32)) - 1
            coin_x = cand_xs[jnp.argmax(cand_ok & (ranks == ci))]
            cf = default_fields(
                coin_x.astype(f32) + 0.5, curr_y.astype(f32) + 1.5,
                0.0, 0.0, 0.3, 0.3, COIN,
            )
            recs.append(cf)
            dos.append(place_coin)
            coin_quota = coin_quota + place_coin.astype(i32)

            # next_x = choose_one(candidates)
            d, ni = d.randn_if(live, jnp.maximum(ncand, 1))
            next_x = cand_xs[jnp.argmax(cand_ok & (ranks == ni))]
            curr_x = jnp.where(live, next_x, curr_x)

        s = s.replace(
            ents=s.ents.push_many(
                {k: jnp.stack([r[k] for r in recs]) for k in recs[0]},
                jnp.stack(dos),
            ),
            game=s.game.replace(coin_quota=coin_quota),
            rand_gen=rng.commit(s.rand_gen, d),
        )
        return s

    # -- per-step -----------------------------------------------------------

    def game_step(self, s: BasicState, d):
        s, d = self.game_step_base(s, d)

        refl = jnp.where(
            s.action_vx > 0,
            False,
            jnp.where(s.action_vx < 0, True, s.ents.is_reflected[0]),
        )
        s = s.replace(ents=s.ents.set_fields(0, is_reflected=refl))

        # enemy patrol + animation (climber.cpp:274-289)
        e = s.ents
        is_enemy = e.active & (e.type == ENEMY)
        vx = e.vx
        vx = jnp.where(
            is_enemy & (e.x > e.climber_spawn_x + PATROL_RANGE), -jnp.abs(vx), vx
        )
        vx = jnp.where(
            is_enemy & (e.x < e.climber_spawn_x - PATROL_RANGE), jnp.abs(vx), vx
        )
        img = jnp.where((s.cur_time // 5) % 2 == 0, ENEMY1, ENEMY2)
        s = s.replace(
            ents=e.replace(
                vx=vx,
                image_type=jnp.where(is_enemy, img, e.image_type),
                is_reflected=jnp.where(is_enemy, vx < 0, e.is_reflected),
            )
        )

        complete = s.game.coin_quota == s.game.coins_collected
        s = s.replace(
            done=s.done | complete,
            reward=s.reward + jnp.where(complete, f32(COMPLETION_BONUS), 0.0),
            level_complete=s.level_complete | complete,
        )
        return s, d
