"""CoinRun: run right to the coin (+10); saws/enemies/lava/chasms kill.

Reference: procgen/src/games/coinrun.cpp.  Platformer physics (gravity, air
control, jump, crate one-way support), section-based level generation with
pits/saws/walking enemies/crate piles, and patrol enemies reflecting off
walls and ENEMY_BARRIER markers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import rng
from ..core.constants import EASY_MODE, PLAYER, TRAIL
from ..core.entities import default_fields
from ..core.game import BasicAbstractGame, BasicState, tree_where
from .registry import register

i32 = jnp.int32
f32 = jnp.float32

GOAL_REWARD = 10.0

GOAL = 1
SAW = 2
SAW2 = 3
ENEMY = 5
ENEMY1 = 6
ENEMY2 = 7
PLAYER_JUMP = 9
PLAYER_RIGHT1 = 12
PLAYER_RIGHT2 = 13
WALL_MID = 15
WALL_TOP = 16
LAVA_MID = 17
LAVA_TOP = 18
ENEMY_BARRIER = 19
CRATE = 20

WALKING_ENEMIES = [
    "slimeBlock", "slimePurple", "slimeBlue", "slimeGreen", "mouse",
    "snail", "ladybug", "wormGreen", "wormPink",
]
PLAYER_THEME_COLORS = ["Beige", "Blue", "Green", "Pink", "Yellow"]
GROUND_THEMES = ["Dirt", "Grass", "Planet", "Sand", "Snow", "Stone"]

GRAVITY = 0.2
AIR_CONTROL = 0.15


def _is_wall(t):
    return (t == WALL_MID) | (t == WALL_TOP)


def _is_lava(t):
    return (t == LAVA_MID) | (t == LAVA_TOP)


@struct.dataclass
class CoinrunState:
    last_agent_y: jnp.ndarray
    wall_theme: jnp.ndarray
    has_support: jnp.ndarray
    facing_right: jnp.ndarray
    is_on_crate: jnp.ndarray


@register("coinrun")
class Coinrun(BasicAbstractGame):
    name = "coinrun"
    WORLD_DIM_MAX = (64, 64)
    ENT_CAP = 48
    DECOR_CAP = 96  # enemy trails (expire in 8 steps); overflow drops extras
    MAX_STEP_DRAWS = 8
    MAX_SUB_STEPS = 8  # |v| <= sqrt(.5^2+1.5^2)=1.58 -> 6 sub-steps
    ENTITY_SCAN = True  # crate landing (vectorised override below)
    DISPATCH_VECTORIZED = True  # handlers commute (death + goal/lava)
    ONLY_AGENT_SMART = False  # patrol enemies are smart_step
    SMART_VECTORIZABLE = True  # enemies only reflect off grid cells
    MAX_SMART = 16  # bound on simultaneous smart movers; worst-case rollouts: tests/test_env.py::test_max_smart_bound

    def __init__(self, options):
        super().__init__(options)
        self.visibility = 13.0
        self.mixrate = 0.2
        self.out_of_bounds_object = WALL_MID

    def background_names(self):
        from ..render.assets import PLATFORM_BACKGROUNDS

        return PLATFORM_BACKGROUNDS

    def asset_for_type(self, type_):
        # coinrun.cpp:75-127
        if type_ == PLAYER:
            return [f"kenney/Players/128x256/{c}/alien{c}_stand.png" for c in PLAYER_THEME_COLORS]
        if type_ == PLAYER_JUMP:
            return [f"kenney/Players/128x256/{c}/alien{c}_jump.png" for c in PLAYER_THEME_COLORS]
        if type_ == PLAYER_RIGHT1:
            return [f"kenney/Players/128x256/{c}/alien{c}_walk1.png" for c in PLAYER_THEME_COLORS]
        if type_ == PLAYER_RIGHT2:
            return [f"kenney/Players/128x256/{c}/alien{c}_walk2.png" for c in PLAYER_THEME_COLORS]
        if type_ == ENEMY1:
            return [f"kenney/Enemies/{e}.png" for e in WALKING_ENEMIES]
        if type_ == ENEMY2:
            return [f"kenney/Enemies/{e}_move.png" for e in WALKING_ENEMIES]
        if type_ == GOAL:
            return ["kenney/Items/coinGold.png"]
        if type_ == WALL_TOP:
            return [f"kenney/Ground/{g}/{g.lower()}Mid.png" for g in GROUND_THEMES]
        if type_ == WALL_MID:
            return [f"kenney/Ground/{g}/{g.lower()}Center.png" for g in GROUND_THEMES]
        if type_ == LAVA_TOP:
            return ["kenney/Tiles/lavaTop_low.png"]
        if type_ == LAVA_MID:
            return ["kenney/Tiles/lava.png"]
        if type_ == SAW:
            return ["kenney/Enemies/sawHalf.png"]
        if type_ == SAW2:
            return ["kenney/Enemies/sawHalf_move.png"]
        if type_ == CRATE:
            return [
                "kenney/Tiles/boxCrate.png",
                "kenney/Tiles/boxCrate_double.png",
                "kenney/Tiles/boxCrate_single.png",
                "kenney/Tiles/boxCrate_warning.png",
            ]
        return []

    def use_block_asset(self, type_):
        return type_ in (WALL_MID, WALL_TOP)

    def adjust_image_rect(self, img, x0, y0, w2, h2):
        # coinrun.cpp:64-70: player sprite extends 0.7415*h above the hitbox
        p = (img == PLAYER) | (img == PLAYER_JUMP) | (img == PLAYER_RIGHT1) | (
            img == PLAYER_RIGHT2
        )
        return (
            x0,
            jnp.where(p, y0 - 0.7415 * h2, y0),
            w2,
            jnp.where(p, 1.7415 * h2, h2),
        )

    def game_init_state(self):
        z = jnp.zeros(())
        return CoinrunState(
            last_agent_y=jnp.zeros((), f32),
            wall_theme=jnp.zeros((), i32),
            has_support=jnp.asarray(False),
            facing_right=jnp.asarray(True),
            is_on_crate=jnp.asarray(False),
        )

    def choose_world_dim(self, s):
        return s.replace(
            main_width=jnp.asarray(64, i32), main_height=jnp.asarray(64, i32)
        )

    # -- physics hooks ------------------------------------------------------

    def is_blocked(self, s, src_type, target_type, is_horizontal):
        b = super().is_blocked(s, src_type, target_type, is_horizontal)
        return b | ((src_type == PLAYER) & _is_wall(target_type))

    def will_reflect(self, src_type, target_type):
        return (src_type == ENEMY) & (
            _is_wall(target_type) | (target_type == ENEMY_BARRIER)
        )

    def _entity_scan(self, s, rec, vx, vy, depth):
        """Vectorised crate landing (coinrun.cpp:187-202).

        The only entity-entity interaction is the agent landing on crates
        while falling; sequential pushes against same-radius crates converge
        to the top of the tallest overlapping crate, so one vectorised pass
        (max over crate tops) plus one grid-resolution of the displacement is
        equivalent to the C++ push chain.
        """
        e = s.ents
        horiz = vx != 0
        slots = jnp.arange(self.ENT_CAP)
        valid = e.active & (slots != 0) & ~e.will_erase & (e.type == CRATE)
        coll = (
            (jnp.abs(rec["x"] - e.x) < rec["rx"] + e.rx + (-0.001))
            & (jnp.abs(rec["y"] - e.y) < rec["ry"] + e.ry + (-0.001))
        )
        landing = (
            valid
            & coll
            & ~horiz
            & (rec["vy"] < 0)
            & (s.action_vy >= 0)
            & (s.game.last_agent_y >= e.y + e.ry + rec["ry"])
            & ~rec["will_erase"]
        )
        any_hit = jnp.any(landing)
        top = jnp.max(jnp.where(landing, e.y + e.ry + rec["ry"], -jnp.inf))

        t_vy = jnp.where(any_hit, top - rec["y"], 0.0)
        # grid-resolution of the push displacement (push_obj -> sub_step)
        s2, rec2, _ = self._sub_step_rec(s, rec, 0.0, t_vy, self.PUSH_DEPTH,
                                         False)
        rec = tree_where(any_hit, rec2, rec)
        rec = dict(rec)
        rec["vy"] = jnp.where(any_hit, 0.0, rec["vy"])
        s = s.replace(
            game=s.game.replace(is_on_crate=s.game.is_on_crate | any_hit)
        )
        return s, rec, any_hit

    def _can_support(self, t):
        return _is_wall(t) | (t == self.out_of_bounds_object)

    def set_action_xy(self, s, move_action):
        # coinrun.cpp:452-476
        avx = (move_action // 3 - 1).astype(f32)
        avy = (move_action % 3 - 1).astype(f32)
        g = s.game
        facing = jnp.where(avx > 0, True, jnp.where(avx < 0, False, g.facing_right))
        e = s.ents
        b1 = self.get_obj_from_floats(
            s, e.x[0] - (e.rx[0] - 0.01), e.y[0] - (e.ry[0] + 0.01)
        )
        b2 = self.get_obj_from_floats(
            s, e.x[0] + (e.rx[0] - 0.01), e.y[0] - (e.ry[0] + 0.01)
        )
        has_support = (
            g.is_on_crate | self._can_support(b1) | self._can_support(b2)
        ) & (e.vy[0] == 0)
        avy = jnp.where((avy == 1) & ~has_support, 0.0, avy)
        return s.replace(
            action_vx=avx,
            action_vy=avy,
            action_vrot=f32(0.0),
            game=g.replace(
                facing_right=facing,
                has_support=has_support,
                is_on_crate=jnp.asarray(False),
            ),
        )

    def update_agent_velocity(self, s):
        # coinrun.cpp:160-177
        g = s.game
        e = s.ents
        mixrate_x = jnp.where(g.has_support, s.mixrate, s.mixrate * AIR_CONTROL)
        vx = (1 - mixrate_x) * e.vx[0] + mixrate_x * s.maxspeed * s.action_vx
        vx = jnp.where(jnp.abs(vx) < mixrate_x * s.maxspeed, 0.0, vx)
        vy = e.vy[0]
        vy = jnp.where(
            s.action_vy > 0,
            s.max_jump,
            jnp.where(g.has_support, vy + 0.2 * s.action_vy, vy),
        )
        apply_grav = ~(g.has_support & (s.action_vy > 0))
        vy_g = jnp.clip(vy - GRAVITY, -s.max_jump, s.max_jump)
        vy = jnp.where(apply_grav, vy_g, vy)
        return s.replace(ents=e.set_fields(0, vx=vx, vy=vy))

    # -- collision handlers -------------------------------------------------

    def handle_agent_collision_vec(self, s, d, hit):
        # coinrun.cpp:129-137
        e = s.ents
        deadly = jnp.any(hit & ((e.type == ENEMY) | (e.type == SAW)))
        return s.replace(done=s.done | deadly), d

    def handle_grid_collision(self, s, d, slot, type_, ix, iy):
        is_player = s.ents.type[slot] == PLAYER
        goal = is_player & (type_ == GOAL)
        lava = is_player & _is_lava(type_)
        return s.replace(
            reward=s.reward + jnp.where(goal, f32(GOAL_REWARD), 0.0),
            done=s.done | goal | lava,
            level_complete=s.level_complete | goal,
        ), d

    # -- rendering hooks ----------------------------------------------------

    def theme_for_grid_obj(self, s, type_):
        return jnp.where(_is_wall(type_), s.game.wall_theme, 0)

    def image_for_type(self, s, type_):
        # coinrun.cpp:222-234
        e = s.ents
        standing = (
            (jnp.abs(e.vx[0]) < 0.01) & (s.action_vx == 0) & s.game.has_support
        )
        walk_frame = jnp.where(
            ((s.cur_time // 5) % 2 == 0) | ~s.game.has_support,
            PLAYER_RIGHT1,
            PLAYER_RIGHT2,
        )
        player_img = jnp.where(standing, PLAYER, walk_frame)
        out = jnp.abs(type_)
        out = jnp.where(type_ == PLAYER, player_img, out)
        out = jnp.where(type_ == ENEMY_BARRIER, -1, out)
        return out

    # -- level generation ---------------------------------------------------

    def _fill_block_top(self, s, x, y, dx, dy, fill, top):
        s = self.fill_elem(s, x, y, dx, dy - 1, fill)
        return self.fill_elem(s, x, y + dy - 1, dx, 1, top)

    @staticmethod
    def _stack_records(recs: list[dict]) -> dict:
        return {k: jnp.stack([r[k] for r in recs]) for k in recs[0]}

    def _saw_record(self, x, y):
        return default_fields(
            jnp.asarray(x, f32) + 0.5, jnp.asarray(y, f32) + 0.5,
            0.0, 0.0, 0.5, 0.5, SAW,
        )

    def _enemy_record(self, d, x, y, do):
        d, dir_ = d.randn_if(do, 2)
        d, theme = d.randn_if(do, self.num_themes(ENEMY1))
        f = default_fields(
            jnp.asarray(x, f32) + 0.5, jnp.asarray(y, f32) + 0.5,
            0.15 * (dir_ * 2 - 1).astype(f32), 0.0, 0.5, 0.5, ENEMY,
        )
        f["smart_step"] = True
        f["image_type"] = ENEMY1
        f["render_z"] = 1
        f["image_theme"] = theme
        return d, f

    def _crate_record(self, d, x, y, do):
        d, theme = d.randn_if(do, self.num_themes(CRATE))
        f = default_fields(
            jnp.asarray(x, f32) + 0.5, jnp.asarray(y, f32) + 0.5,
            0.0, 0.0, 0.5, 0.5, CRATE,
        )
        f["image_theme"] = theme
        return d, f

    def game_reset(self, s: BasicState) -> BasicState:
        s = self.game_reset_base(s)
        s = s.replace(
            maxspeed=f32(0.5),
            max_jump=f32(1.5),
        )

        if self.options.distribution_mode == EASY_MODE:
            s = s.replace(
                ents=s.ents.set_fields(0, image_theme=0),
                background_index=jnp.zeros((), i32),
            )
            wall_theme = jnp.zeros((), i32)
        else:
            s = self.choose_random_theme(s, 0, PLAYER)
            s, wall_theme = self.randn(s, len(GROUND_THEMES))

        ay = 1 + 0.5787
        s = s.replace(
            ents=s.ents.set_fields(
                0, rx=0.5, ry=0.5787, x=1.5, y=ay
            ),
            game=CoinrunState(
                last_agent_y=jnp.asarray(ay, f32),
                wall_theme=wall_theme,
                has_support=jnp.asarray(False),
                facing_right=jnp.asarray(True),
                is_on_crate=jnp.asarray(False),
            ),
        )

        # init_floor_and_walls (coinrun.cpp:253-258)
        w, h = 64, 64
        s = self.fill_elem(s, 0, 0, w, 1, WALL_TOP)
        s = self.fill_elem(s, 0, 0, 1, h, WALL_MID)
        s = self.fill_elem(s, w - 1, 0, 1, h, WALL_MID)
        s = self.fill_elem(s, 0, h - 1, w, 1, WALL_MID)

        return self._generate_coin_to_the_right(s)

    def _generate_coin_to_the_right(self, s: BasicState) -> BasicState:
        """coinrun.cpp:265-414.

        Straight-line level generation draws from one pre-tempered 624-word
        block (~125 draws worst case) — cursor bumps instead of per-draw
        twists, keeping the traced program small.
        """
        opts = self.options
        d, norm = rng.peek_block(s.rand_gen, rng.N)
        s = s.replace(rand_gen=norm)
        d, dif0 = d.randn(3)
        dif = dif0 + 1
        d, ns0 = d.randn(dif)
        num_sections = ns0 + dif
        pit_threshold = dif
        d, danger_type = d.randn(3)

        allow_pit = (opts.debug_mode & (1 << 1)) == 0
        allow_crate = (opts.debug_mode & (1 << 2)) == 0
        allow_dy = (opts.debug_mode & (1 << 3)) == 0
        allow_monsters = opts.distribution_mode != EASY_MODE

        max_jump, gravity, maxspeed = 1.5, GRAVITY, 0.5
        max_dy = int(max_jump * max_jump / (2 * gravity) - 0.5)  # 5
        max_dx = int(maxspeed * 2 * max_jump / gravity - 0.5)  # 7

        w = 64
        curr_x = jnp.asarray(5, i32)
        curr_y = jnp.asarray(1, i32)
        ended = jnp.asarray(False)
        # entity records accumulate across sections; one batched push at the
        # end keeps C++ creation order with a single scatter per field
        all_recs: list = []
        all_dos: list = []

        for _section in range(5):  # num_sections <= 2*3-1 = 5
            live = (_section < num_sections) & ~ended
            hit_end = curr_x + 15 >= w
            ended = ended | (live & hit_end)
            live = live & ~hit_end

            d, dy0 = d.randn_if(live, 4)
            dy = dy0 + 1 + dif // 3
            if not allow_dy:
                dy = jnp.zeros((), i32)
            dy = jnp.minimum(dy, max_dy)

            mid_band = (curr_y >= 5) & (curr_y < 20)
            d, flip0 = d.randn_if(live & mid_band, 2)
            neg = (curr_y >= 20) | (mid_band & (flip0 == 1))
            dy = jnp.where(neg, -dy, dy)

            d, dx0 = d.randn_if(live, 2 * dif)
            dx = dx0 + 3 + dif // 3

            curr_y = jnp.where(live, jnp.maximum(curr_y + dy, 1), curr_y)

            pit_possible = live & allow_pit & (dx > 7) & (curr_y > 3)
            d, pitroll = d.randn_if(pit_possible, 20)
            use_pit = pit_possible & (pitroll >= pit_threshold)
            use_npit = live & ~use_pit

            # ---- pit branch (draws + fills masked by use_pit) ----
            d, x1_0 = d.randn_if(use_pit, 3)
            x1 = x1_0 + 1
            d, x2_0 = d.randn_if(use_pit, 3)
            x2 = x2_0 + 1
            pit_width = dx - x1 - x2
            clipped = pit_width > max_dx
            x2 = jnp.where(clipped, dx - x1 - max_dx, x2)
            pit_width = jnp.where(clipped, max_dx, pit_width)

            sp = self._fill_block_top(s, curr_x, 0, x1, curr_y, WALL_MID, WALL_TOP)
            sp = self._fill_block_top(
                sp, curr_x + dx - x2, 0, x2, curr_y, WALL_MID, WALL_TOP
            )
            s = s.replace(grid=jnp.where(use_pit, sp.grid, s.grid))

            d, lava0 = d.randn_if(use_pit, jnp.maximum(curr_y - 3, 1))
            lava_height = lava0 + 1
            sl = self._fill_block_top(
                s, curr_x + x1, 1, pit_width, lava_height, LAVA_MID, LAVA_TOP
            )
            s = s.replace(
                grid=jnp.where(use_pit & (danger_type == 0), sl.grid, s.grid)
            )

            for ei in range(7):  # pit_width <= max_dx = 7
                in_pit = use_pit & (ei < pit_width)
                px = (curr_x + x1 + ei).astype(f32)
                all_recs.append(self._saw_record(px, 1))
                all_dos.append(in_pit & (danger_type == 1))
                edo = in_pit & (danger_type == 2)
                d, erec = self._enemy_record(d, px, 1, edo)
                all_recs.append(erec)
                all_dos.append(edo)

            wide = use_pit & (pit_width > 4)
            d, d1 = d.randn_if(wide, 2)
            d, d2 = d.randn_if(wide, 2)
            x3 = jnp.where(pit_width == 5, 1 + d1, 2 + d1)
            w1 = jnp.where(
                (pit_width == 5) | (pit_width == 6),
                1 + d2,
                pit_width - x3 - (2 + d2),
            )
            sb_ = self._fill_block_top(
                s, curr_x + x1 + x3, curr_y - 1, w1, 1, WALL_MID, WALL_TOP
            )
            s = s.replace(grid=jnp.where(wide, sb_.grid, s.grid))

            # ---- non-pit branch (draws + fills masked by use_npit) ----
            sn = self._fill_block_top(s, curr_x, 0, dx, curr_y, WALL_MID, WALL_TOP)
            s = s.replace(grid=jnp.where(use_npit, sn.grid, s.grid))

            d, sawroll = d.randn_if(use_npit, 10)
            saw_here = use_npit & (sawroll < 2 * dif) & (dx > 3)
            d, ob1_0 = d.randn_if(saw_here, jnp.maximum(dx - 2, 1))
            ob1_x = jnp.where(saw_here, curr_x + ob1_0 + 1, -1)
            all_recs.append(self._saw_record(ob1_x.astype(f32), curr_y.astype(f32)))
            all_dos.append(saw_here)

            d, enroll = d.randn_if(use_npit, 10)
            enemy_here = (
                use_npit & (enroll < dif) & (dx > 3) & (max_dx >= 4) & allow_monsters
            )
            d, ob2_0 = d.randn_if(enemy_here, jnp.maximum(dx - 2, 1))
            ob2_x = jnp.where(enemy_here, curr_x + ob2_0 + 1, -1)
            d, erec = self._enemy_record(d, ob2_x.astype(f32), curr_y.astype(f32), enemy_here)
            all_recs.append(erec)
            all_dos.append(enemy_here)

            if allow_crate:
                for _ci in range(2):
                    d, cx0 = d.randn_if(use_npit, jnp.maximum(dx - 2, 1))
                    crate_x = curr_x + cx0 + 1
                    d, crroll = d.randn_if(use_npit, 2)
                    place = (
                        use_npit
                        & (crroll == 1)
                        & (ob1_x != crate_x)
                        & (ob2_x != crate_x)
                    )
                    d, pile0 = d.randn_if(place, 3)
                    pile = pile0 + 1
                    for j in range(3):
                        cdo = place & (j < pile)
                        d, crec = self._crate_record(
                            d, crate_x.astype(f32), (curr_y + j).astype(f32), cdo
                        )
                        all_recs.append(crec)
                        all_dos.append(cdo)

            # barriers (coinrun.cpp:398-404)
            pre = self.get_obj(s, curr_x - 1, curr_y)
            sb = self.set_obj(s, curr_x - 1, curr_y, ENEMY_BARRIER)
            s = s.replace(
                grid=jnp.where(live & ~_is_wall(pre), sb.grid, s.grid)
            )
            curr_x = jnp.where(live, curr_x + dx, curr_x)
            sb2 = self.set_obj(s, curr_x, curr_y, ENEMY_BARRIER)
            s = s.replace(grid=jnp.where(live, sb2.grid, s.grid))

        s = s.replace(
            ents=s.ents.push_many(
                self._stack_records(all_recs), jnp.stack(all_dos)
            )
        )

        # goal (coinrun.cpp:406-411)
        s = self.set_obj(s, curr_x, curr_y, GOAL)
        s = self._fill_block_top(s, curr_x, 0, 1, curr_y, WALL_MID, WALL_TOP)
        s = self.fill_elem(s, curr_x + 1, 0, w - curr_x - 1, 64, WALL_MID)
        s = s.replace(rand_gen=rng.commit(s.rand_gen, d))
        return s

    # -- per-step game logic ------------------------------------------------

    def game_step(self, s: BasicState, d):
        s, d = self.game_step_base(s, d)

        refl = jnp.where(
            s.action_vx > 0,
            False,
            jnp.where(s.action_vx < 0, True, s.ents.is_reflected[0]),
        )
        s = s.replace(ents=s.ents.set_fields(0, is_reflected=refl))

        # enemy trails + animation (coinrun.cpp:484-499)
        e = s.ents

        # trails push in reverse entity order (the C++ loop, coinrun.cpp:482)
        rev = slice(None, None, -1)
        is_enemy_slot = ((jnp.arange(self.ENT_CAP) < e.count)
                         & (e.type == ENEMY))[rev]
        tf = default_fields(
            e.x[rev], (e.y - e.ry * 0.5)[rev], 0.0, 0.01, 0.3, 0.2, TRAIL
        )
        tf["expire_time"] = 8
        tf["alpha"] = 0.5
        s = s.replace(decor=s.decor.push_many(tf, is_enemy_slot))

        enemy_img = jnp.where((s.cur_time // 5) % 2 == 0, ENEMY1, ENEMY2)
        is_enemy = e.active & (e.type == ENEMY)
        is_saw = e.active & (e.type == SAW)
        saw_img = jnp.where(s.cur_time % 2 == 0, SAW, SAW2)
        s = s.replace(
            ents=e.replace(
                image_type=jnp.where(
                    is_enemy, enemy_img, jnp.where(is_saw, saw_img, e.image_type)
                ),
                is_reflected=jnp.where(is_enemy, e.vx > 0, e.is_reflected),
            )
        )

        s = s.replace(game=s.game.replace(last_agent_y=s.ents.y[0]))
        return s, d
