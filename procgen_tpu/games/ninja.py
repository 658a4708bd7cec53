"""Ninja: platformer with charged jumps and throwing stars that detonate
bombs; reach the mushroom (+10).  Reference: procgen/src/games/ninja.cpp.

Throwing stars are smart entities whose wall hits both block them (the C++
zeroes their velocity inside is_blocked, ninja.cpp:139-152) and erase them
via the grid-collision handler the same step — the transient velocity zero
is unobservable, so only the blocking relation is modeled.
"""

from __future__ import annotations

import math

import jax.numpy as jnp
from flax import struct

from ..core import rng
from ..core.constants import EASY_MODE, EXPLOSION, PLAYER, SPACE
from ..core.entities import default_fields
from ..core.game import BasicAbstractGame, BasicState
from .registry import register

i32 = jnp.int32
f32 = jnp.float32

GOAL_REWARD = 10.0

GOAL = 1
BOMB = 6
THROWING_STAR = 7
PLAYER_JUMP = 9
PLAYER_RIGHT1 = 12
PLAYER_RIGHT2 = 13
FIRE = 14
WALL_MID = 20
NUM_WALL_THEMES = 3

GRAVITY = 0.2
AIR_CONTROL = 0.15
PI = math.pi


@struct.dataclass
class NinjaState:
    has_support: jnp.ndarray
    facing_right: jnp.ndarray
    last_fire_time: jnp.ndarray
    wall_theme: jnp.ndarray
    jump_charge: jnp.ndarray


@register("ninja")
class Ninja(BasicAbstractGame):
    name = "ninja"
    WORLD_DIM_MAX = (64, 64)
    ENT_CAP = 16  # agent + goal + <=5 stars + <=5 explosions
    MAX_STEP_DRAWS = 4
    MAX_SUB_STEPS = 10  # star speed 1 -> 4; agent vy can reach -2
    ONLY_AGENT_SMART = False  # stars are smart
    SMART_VECTORIZABLE = True
    MAX_SMART = 8  # bound on simultaneous smart movers; worst-case rollouts: tests/test_env.py::test_max_smart_bound
    GRID_HANDLER_AGENT_ONLY = False  # stars detonate bombs via grid handler
    DISPATCH_VECTORIZED = True  # exact winner-dedup forms below (the
    # unrolled sequential scan inlined 64 scatter+push handler bodies:
    # 52 of 65ms logic at 4096 envs)

    def __init__(self, options):
        super().__init__(options)
        self.out_of_bounds_object = WALL_MID
        easy = options.distribution_mode == EASY_MODE
        self.max_jump = 1.25 if easy else 1.5
        self.jump_charge_inc = 1.0 if easy else 0.25
        self.visibility = 10.0 if easy else 16.0

    def background_names(self):
        from ..render.assets import PLATFORM_BACKGROUNDS

        return PLATFORM_BACKGROUNDS

    def asset_for_type(self, type_):
        # ninja.cpp:45-75
        if type_ == WALL_MID:
            return [
                "misc_assets/tile_bricksGrey.png",
                "misc_assets/tile_bricksGrown.png",
                "misc_assets/tile_bricksRed.png",
            ]
        if type_ == GOAL:
            return [f"platformer/shroom{i}.png" for i in range(1, 7)]
        if type_ == PLAYER:
            return ["platformer/zombie_idle.png"]
        if type_ == PLAYER_JUMP:
            return ["platformer/zombie_jump.png"]
        if type_ == PLAYER_RIGHT1:
            return ["platformer/zombie_walk1.png"]
        if type_ == PLAYER_RIGHT2:
            return ["platformer/zombie_walk2.png"]
        if type_ == BOMB:
            return ["misc_assets/bomb.png"]
        if type_ == THROWING_STAR:
            return ["misc_assets/saw.png"]
        if type_ == FIRE:
            return ["misc_assets/bomb.png"]
        return []

    def use_block_asset(self, type_):
        return type_ == WALL_MID

    def game_init_state(self):
        return NinjaState(
            has_support=jnp.asarray(False),
            facing_right=jnp.asarray(True),
            last_fire_time=jnp.zeros((), i32),
            wall_theme=jnp.zeros((), i32),
            jump_charge=jnp.zeros((), f32),
        )

    def choose_world_dim(self, s):
        return s.replace(
            main_width=jnp.asarray(64, i32), main_height=jnp.asarray(64, i32)
        )

    # -- physics ------------------------------------------------------------

    def is_blocked(self, s, src_type, target_type, is_horizontal):
        b = super().is_blocked(s, src_type, target_type, is_horizontal)
        wall = target_type == WALL_MID
        return b | (
            wall & ((src_type == PLAYER) | (src_type == THROWING_STAR))
        )

    def _can_support(self, t):
        return (t == WALL_MID) | (t == self.out_of_bounds_object)

    def set_action_xy(self, s, move_action):
        # ninja.cpp:326-357
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
        charging = has_support & (avy == 1)
        charge = jnp.where(
            charging,
            jnp.minimum(g.jump_charge + self.jump_charge_inc, 1.0),
            g.jump_charge,
        )
        charge = jnp.where(~has_support, 0.0, charge)
        avy = jnp.where(charging, 1.0, 0.0)
        return s.replace(
            action_vx=avx,
            action_vy=avy,
            action_vrot=f32(0.0),
            game=g.replace(
                facing_right=facing, has_support=has_support, jump_charge=charge
            ),
        )

    def update_agent_velocity(self, s):
        # ninja.cpp:110-124
        g = s.game
        e = s.ents
        mixrate_x = jnp.where(g.has_support, s.mixrate, s.mixrate * AIR_CONTROL)
        vx = (1 - mixrate_x) * e.vx[0] + mixrate_x * s.maxspeed * s.action_vx
        release = (s.action_vy < 1) & (g.jump_charge > 0)
        vy = jnp.where(release, g.jump_charge * s.max_jump, e.vy[0])
        vy = jnp.where(~g.has_support & (vy > -2), vy - GRAVITY, vy)
        s = s.replace(
            game=g.replace(jump_charge=jnp.where(release, 0.0, g.jump_charge))
        )
        return s.replace(ents=e.set_fields(0, vx=vx, vy=vy))

    # -- collision handlers -------------------------------------------------

    def handle_agent_collision(self, s, d, i):
        # ninja.cpp:77-86
        t = s.ents.type[i]
        expl = t == EXPLOSION
        goal = t == GOAL
        return s.replace(
            done=s.done | expl | goal,
            reward=s.reward + jnp.where(goal, f32(GOAL_REWARD), 0.0),
            level_complete=s.level_complete | goal,
        ), d

    def handle_agent_collision_vec(self, s, d, hit):
        # effects commute: done/reward/level_complete only (ninja.cpp:77-86)
        e = s.ents
        expl = jnp.any(hit & (e.type == EXPLOSION))
        goal = jnp.any(hit & (e.type == GOAL))
        return s.replace(
            done=s.done | expl | goal,
            reward=s.reward + jnp.where(goal, f32(GOAL_REWARD), 0.0),
            level_complete=s.level_complete | goal,
        ), d

    def dispatch_grid_vec(self, s, d):
        """Vectorised reverse-slot grid dispatch (ninja.cpp:88-106).

        Sequential semantics reproduced exactly:
        * stars are processed in DESCENDING slot order; once a star booms a
          BOMB cell it becomes SPACE, so a later (lower-slot) star probing
          the same cell sees SPACE and does NOT boom -> per-cell winner =
          highest boomer slot (explosion dedup);
        * the agent is slot 0, processed LAST, so its FIRE/BOMB death check
          reads the post-boom grid;
        * explosions are pushed in iteration order: slot descending, probe
          cells in (dx, dy) order within a slot.
        """
        e = s.ents
        cap = self.ENT_CAP
        slots = jnp.arange(cap)
        live = (slots < e.count) & e.smart_step
        is_star = live & (e.type == THROWING_STAR)

        ix, iy, inr, gtype = self.probe_cells(s)  # [cap, 4]
        hit = inr & (gtype != SPACE)

        # star booms / sticks per (slot, cell) candidate
        boom_c = is_star[:, None] & hit & (gtype == BOMB)
        stick_c = is_star[:, None] & hit & (gtype == WALL_MID)

        # winner dedup: candidate (i, c) survives unless a HIGHER slot booms
        # the same cell.  [cap*4, cap*4] comparison per env (tiny: cap=16).
        fi = ix.reshape(-1)
        fy = iy.reshape(-1)
        fb = boom_c.reshape(-1)
        fslot = jnp.repeat(slots, ix.shape[1])
        same_cell = (fi[:, None] == fi[None, :]) & (fy[:, None] == fy[None, :])
        beaten = jnp.any(
            same_cell & fb[None, :] & (fslot[None, :] > fslot[:, None]), axis=1
        )
        win = fb & ~beaten  # [cap*4]

        # grid clears: one [H,W] mask via one-hot outer products (scatter-free)
        wmax, hmax = self.WORLD_DIM_MAX
        ohy = (fy[:, None] == jnp.arange(hmax)[None, :]).astype(f32)
        ohx = (fi[:, None] == jnp.arange(wmax)[None, :]).astype(f32)
        wf = win.astype(f32)
        clear = jnp.einsum("kh,kw->hw", ohy * wf[:, None], ohx) > 0.5
        new_grid = jnp.where(clear, SPACE, s.grid)

        # star erasure: stick on any probed wall, or won any boom
        erase = jnp.any(stick_c, axis=1) | jnp.any(
            win.reshape(cap, -1), axis=1
        )
        s = s.replace(
            grid=new_grid,
            ents=e.replace(will_erase=e.will_erase | erase),
        )

        # explosions pushed in (slot desc, cell) order
        order = jnp.arange(cap * ix.shape[1])[::-1].reshape(cap, -1)[:, ::-1].reshape(-1)
        f = default_fields(
            fi[order].astype(f32) + 0.5, fy[order].astype(f32) + 0.5,
            0.0, 0.0, 0.5, 0.5, EXPLOSION,
        )
        s = s.replace(ents=s.ents.push_many(f, win[order]))

        # agent (slot 0, last): dies on FIRE or BOMB in the POST-boom grid —
        # re-evaluate its probed cells against the boom winners
        cleared0 = jnp.any(
            win[None, :]
            & (fi[None, :] == ix[0][:, None])
            & (fy[None, :] == iy[0][:, None]),
            axis=1,
        )
        t0 = jnp.where(cleared0, SPACE, gtype[0])
        die = live[0] & (e.type[0] == PLAYER) & jnp.any(
            inr[0] & ((t0 == FIRE) | (t0 == BOMB))
        )
        s = s.replace(done=s.done | die)
        return s, d

    def handle_grid_collision(self, s, d, slot, type_, ix, iy):
        # ninja.cpp:88-106
        e = s.ents
        is_player = e.type[slot] == PLAYER
        is_star = e.type[slot] == THROWING_STAR
        die = is_player & ((type_ == FIRE) | (type_ == BOMB))
        boom = is_star & (type_ == BOMB)
        stick = is_star & (type_ == WALL_MID)
        s = s.replace(
            done=s.done | die,
            ents=e.set_fields_where(slot, boom | stick, will_erase=True),
        )
        sc = self.set_obj(s, ix, iy, SPACE)
        s = s.replace(grid=jnp.where(boom, sc.grid, s.grid))
        f = default_fields(
            ix.astype(f32) + 0.5, iy.astype(f32) + 0.5, 0.0, 0.0, 0.5, 0.5,
            EXPLOSION,
        )
        s = s.replace(ents=s.ents.push(f, do=boom))
        return s, d

    # -- rendering ----------------------------------------------------------

    def theme_for_grid_obj(self, s, type_):
        return jnp.where(type_ == WALL_MID, s.game.wall_theme, 0)

    def image_for_type(self, s, type_):
        e = s.ents
        sup = s.game.has_support
        standing = (jnp.abs(e.vx[0]) < 0.01) & (s.action_vx == 0) & sup
        walk = jnp.where(
            ((s.cur_time // 5) % 2 == 0) | ~sup, PLAYER_RIGHT1, PLAYER_RIGHT2
        )
        player_img = jnp.where(standing, PLAYER, walk)
        return jnp.where(type_ == PLAYER, player_img, jnp.abs(type_))

    def render_overlay(self, s, obs, sx, sy, res, unit, vis):
        # jump-charge bar (ninja.cpp:166-175): abs rect
        bar_h = 3 * s.game.jump_charge
        x0 = 0.25 * unit
        y0 = (vis - 0.5 - bar_h) * unit
        in_x = (sx >= x0) & (sx < x0 + 0.5 * unit)
        in_y = (sy >= y0) & (sy < y0 + bar_h * unit)
        mask = in_y[:, None] & in_x[None, :]
        color = jnp.array([66, 245, 135], i32)
        return jnp.where(mask[:, :, None], color[None, None, :], obs)

    # -- reset --------------------------------------------------------------

    def _fill_block_top(self, s, x, y, dx, dy, fill, top):
        # ninja.cpp:177-183: no-op when dy <= 0
        ok = dy > 0
        s2 = self.fill_elem(s, x, y, dx, dy - 1, fill)
        s2 = self.fill_elem(s2, x, y + dy - 1, dx, 1, top)
        return s.replace(grid=jnp.where(ok, s2.grid, s.grid))

    def game_reset(self, s: BasicState) -> BasicState:
        s = self.game_reset_base(s)
        s = s.replace(
            maxspeed=f32(0.5),
            max_jump=f32(self.max_jump),
            visibility=f32(self.visibility),
            ents=s.ents.set_fields(0, rx=0.5, ry=0.5, x=1.5, y=32.5),
            game=NinjaState(
                has_support=jnp.asarray(False),
                facing_right=jnp.asarray(True),
                last_fire_time=jnp.zeros((), i32),
                wall_theme=jnp.zeros((), i32),
                jump_charge=jnp.zeros((), f32),
            ),
        )

        d, norm = rng.peek_block(s.rand_gen, rng.N)
        s = s.replace(rand_gen=norm)

        d, dif0 = d.randn(3)
        difficulty = dif0 + 1
        d, wall_theme = d.randn(NUM_WALL_THEMES)
        s = s.replace(game=s.game.replace(wall_theme=wall_theme))

        # init_floor_and_walls (ninja.cpp:185-190)
        w, h = 64, 64
        s = self.fill_elem(s, 0, 0, w, 1, WALL_MID)
        s = self.fill_elem(s, 0, 0, 1, h, WALL_MID)
        s = self.fill_elem(s, w - 1, 0, 1, h, WALL_MID)
        s = self.fill_elem(s, 0, h - 1, w, 1, WALL_MID)

        s, d = self._generate(s, d, difficulty)
        return s.replace(rand_gen=rng.commit(s.rand_gen, d))

    def _generate(self, s, d, difficulty):
        """generate_coin_to_the_right (ninja.cpp:192-268)."""
        easy = self.options.distribution_mode == EASY_MODE
        min_gap = jnp.maximum(difficulty - 1 - (1 if easy else 0), 0)
        min_plat_w = 3 if easy else 1
        inc_dy = 2 if easy else 4

        bomb_prob = 0.25 * (difficulty.astype(f32) - 1)
        max_gap_inc = jnp.where(difficulty == 1, 1, 2)

        d, ns0 = d.randn(difficulty)
        num_sections = ns0 + difficulty  # <= 5
        start_x = 5
        curr_x = jnp.asarray(start_x, i32)
        curr_y = jnp.asarray(32, i32)
        min_y = curr_y
        w, h = 64, 64
        max_dy = int(1.5 * 1.5 / (2 * GRAVITY) - 0.5)  # 5 (uses hard max_jump)
        if easy:
            max_dy = int(1.25 * 1.25 / (2 * GRAVITY) - 0.5)  # 3

        s = self._fill_block_top(s, 0, 0, start_x, curr_y, WALL_MID, WALL_MID)
        s = self.fill_elem(s, 0, curr_y + 8, start_x, h - curr_y - 8, WALL_MID)

        for i in range(5):  # num_sections <= 2*3-1 = 5
            sec_live = i < num_sections
            prev_x = curr_x
            prev_y = curr_y
            d, ne0 = d.randn_if(sec_live, 2)
            num_edges = ne0 + 1
            max_y = jnp.asarray(-1, i32)
            last_edge_y = jnp.asarray(-1, i32)

            for j in range(2):  # num_edges <= 2
                live = sec_live & (j < num_edges)
                cx = prev_x + j
                live = live & (cx + 15 < w)
                curr_x = jnp.where(live, cx, curr_x)
                cy = prev_y

                d, dy0 = d.randn_if(live, inc_dy)
                dy = dy0 + 1 + difficulty // 3
                dy = jnp.minimum(dy, max_dy)
                high = cy >= h - 15
                mid = (cy >= 5) & ~high
                d, flip = d.rand01_if(live & mid)
                neg = high | (mid & (flip < 0.4))
                dy = jnp.where(neg, -dy, dy)
                cy = jnp.maximum(cy + dy, 3)
                cy = jnp.where(
                    jnp.abs(cy - last_edge_y) <= 1, last_edge_y + 2, cy
                )
                curr_y = jnp.where(live, cy, curr_y)

                d, dx0 = d.randn_if(live, 3)
                dx = min_plat_w + dx0

                sp = self._fill_block_top(
                    s, curr_x, curr_y - 1, dx, 1, WALL_MID, WALL_MID
                )
                s = s.replace(grid=jnp.where(live, sp.grid, s.grid))

                d, gap0 = d.randn_if(live, max_gap_inc + 1)
                curr_x = jnp.where(live, curr_x + dx + min_gap + gap0, curr_x)

                max_y = jnp.where(live, jnp.maximum(max_y, curr_y), max_y)
                min_y = jnp.where(live, jnp.minimum(min_y, curr_y), min_y)
                last_edge_y = jnp.where(live, curr_y, last_edge_y)

            d, broll = d.rand01_if(sec_live)
            place_bomb = sec_live & (broll < bomb_prob)
            d, bx0 = d.randn_if(place_bomb, jnp.maximum(curr_x - prev_x + 1, 1))
            sb = self.set_obj(s, bx0 + prev_x, max_y + 2, BOMB)
            s = s.replace(grid=jnp.where(place_bomb, sb.grid, s.grid))

            ceiling_start = max_y - 1 + 11
            sc = self._fill_block_top(
                s, prev_x, ceiling_start, curr_x - prev_x, h - ceiling_start,
                WALL_MID, WALL_MID,
            )
            s = s.replace(grid=jnp.where(sec_live, sc.grid, s.grid))

        # goal (ninja.cpp:253-266)
        d, gtheme = d.randn(self.num_themes(GOAL))
        f = default_fields(
            curr_x.astype(f32) + 0.5, curr_y.astype(f32) + 0.5, 0.0, 0.0,
            0.5, 0.5, GOAL,
        )
        f["image_theme"] = gtheme
        s = s.replace(ents=s.ents.push(f))

        s = self._fill_block_top(s, curr_x, curr_y - 1, 1, 1, WALL_MID, WALL_MID)
        s = self.fill_elem(s, curr_x, curr_y + 6, 1, h - curr_y - 6, WALL_MID)

        fire_y = jnp.maximum(min_y - 2, 1)
        s = self._fill_block_top(s, start_x, 0, w - start_x, fire_y, WALL_MID, WALL_MID)
        s = self.fill_elem(s, start_x, fire_y, w - start_x, 1, FIRE)
        s = self.fill_elem(s, curr_x + 1, 0, w - curr_x - 1, h, WALL_MID)
        return s, d

    # -- per-step -----------------------------------------------------------

    def game_step(self, s: BasicState, d):
        s, d = self.game_step_base(s, d)

        refl = jnp.where(
            s.action_vx > 0,
            False,
            jnp.where(s.action_vx < 0, True, s.ents.is_reflected[0]),
        )
        s = s.replace(ents=s.ents.set_fields(0, is_reflected=refl))

        # throwing stars (ninja.cpp:369-395)
        fire = (s.special_action > 0) & (
            (s.cur_time - s.game.last_fire_time) >= 3
        )
        theta = jnp.where(
            s.special_action == 2,
            PI / 4,
            jnp.where(
                s.special_action == 3,
                PI / 2,
                jnp.where(s.special_action == 4, -PI / 4, 0.0),
            ),
        )
        theta = jnp.where(refl, PI - theta, theta)
        f = default_fields(
            s.ents.x[0], s.ents.y[0], jnp.cos(theta), jnp.sin(theta),
            0.25, 0.25, THROWING_STAR,
        )
        f["collides_with_entities"] = True
        f["expire_time"] = 15
        f["smart_step"] = True
        s = s.replace(
            ents=s.ents.push(f, do=fire),
            game=s.game.replace(
                last_fire_time=jnp.where(fire, s.cur_time, s.game.last_fire_time)
            ),
        )
        return s, d
