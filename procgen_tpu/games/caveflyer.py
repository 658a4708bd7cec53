"""Caveflyer: Asteroids-style ship in a cave; reach the exit ship (+10),
shoot destructible targets (+3 each); obstacles/enemies lethal.

Reference: procgen/src/games/caveflyer.cpp.  Rotational thrust physics
(action_vrot + MAXVTHETA mixing in the base engine), cellular-automata
caves with best-room + path pruning.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.constants import (
    EASY_MODE,
    EXPLOSION,
    HARD_MODE,
    MEMORY_MODE,
    PLAYER,
    SPACE,
    WALL_OBJ,
)
from ..core.entities import default_fields
from ..core.game import BasicAbstractGame, BasicState, tree_where
from ..levelgen import room as roomgen
from .registry import register

i32 = jnp.int32
f32 = jnp.float32

GOAL_REWARD = 10.0
TARGET_REWARD = 3.0

GOAL = 1
OBSTACLE = 2
TARGET = 3
PLAYER_BULLET = 4
ENEMY = 5
CAVEWALL = 8
EXHAUST = 9

MARKER = 1003
PI = math.pi


@register("caveflyer")
class Caveflyer(BasicAbstractGame):
    name = "caveflyer"
    MAX_STEP_DRAWS = 4
    MAX_SUB_STEPS = 8
    ONLY_AGENT_SMART = False  # drifting enemies are smart
    SMART_VECTORIZABLE = True
    MAX_SMART = 24  # bound on simultaneous smart movers; worst-case rollouts: tests/test_env.py::test_max_smart_bound
    DISPATCH_VECTORIZED = True
    ANY_COLLIDES_WITH_ENTITIES = True
    DECOR_CAP = 32  # exhaust + explosions
    DECOR_TYPES = frozenset(range(54, 60)) | {EXHAUST}
    # ship, bullets, and exhaust rotate by arbitrary angles (caveflyer.cpp:267-296)
    ARB_ROT_TYPES = (0, 4, 9)  # PLAYER, PLAYER_BULLET, EXHAUST

    def __init__(self, options):
        super().__init__(options)
        self.mixrate = 0.9
        mode = options.distribution_mode
        if mode == EASY_MODE:
            dim = 30
        elif mode == HARD_MODE:
            dim = 40
        elif mode == MEMORY_MODE:
            dim = 60
        else:
            raise ValueError(f"caveflyer does not support mode {mode}")
        self.world_dim = dim
        self.WORLD_DIM_MAX = (dim, dim)
        # 3 * (free_cells // 80) objects; free cells bounded by the world area
        self.MAX_OBJS = 3 * (dim * dim // 80)
        self.ENT_CAP = self.MAX_OBJS + 16  # + agent, goal, bullets
        self.out_of_bounds_object = CAVEWALL  # steady-state value
        self.visibility = 10.0 if mode == EASY_MODE else 16.0

    def background_names(self):
        from ..render.assets import SPACE_BACKGROUNDS

        return SPACE_BACKGROUNDS

    def asset_for_type(self, type_):
        # caveflyer.cpp:36-55
        return {
            GOAL: ["misc_assets/ufoGreen2.png"],
            OBSTACLE: ["misc_assets/meteorBrown_big1.png"],
            TARGET: ["misc_assets/ufoRed2.png"],
            PLAYER_BULLET: ["misc_assets/laserBlue02.png"],
            ENEMY: ["misc_assets/enemyShipBlue4.png"],
            PLAYER: ["misc_assets/playerShip1_red.png"],
            CAVEWALL: ["misc_assets/groundA.png"],
            EXHAUST: ["misc_assets/towerDefense_tile295.png"],
        }.get(type_, [])

    def use_block_asset(self, type_):
        return type_ == CAVEWALL

    def choose_world_dim(self, s):
        d = jnp.asarray(self.world_dim, i32)
        return s.replace(main_width=d, main_height=d)

    # -- physics ------------------------------------------------------------

    def is_blocked(self, s, src_type, target_type, is_horizontal):
        b = super().is_blocked(s, src_type, target_type, is_horizontal)
        return b | ((src_type == PLAYER) & (target_type == CAVEWALL))

    def will_reflect(self, src_type, target_type):
        return (src_type == ENEMY) & (
            (target_type == CAVEWALL) | (target_type == self.out_of_bounds_object)
        )

    def update_agent_velocity(self, s):
        # caveflyer.cpp:72-79 (thrust, not mix-to-target)
        e = s.ents
        vx = e.vx[0] + s.mixrate * s.maxspeed * s.action_vx * 0.2
        vy = e.vy[0] + s.mixrate * s.maxspeed * s.action_vy * 0.2
        s = s.replace(ents=e.set_fields(0, vx=vx, vy=vy))
        return self.decay_agent_velocity(s)

    def set_action_xy(self, s, move_action):
        # caveflyer.cpp:268-289: rotate + thrust; exhaust puff when thrusting
        accel = (move_action % 3 - 1).astype(f32)
        accel = jnp.where(accel < 0, accel * 0.33, accel)
        e = s.ents
        theta = -e.rotation[0] + PI / 2
        puff = accel > 0
        xf = default_fields(
            e.x[0] - e.rx[0] * jnp.cos(theta),
            e.y[0] - e.ry[0] * jnp.sin(theta),
            0.0, 0.0, 0.5 * e.rx[0], 0.5 * e.rx[0], EXHAUST,
        )
        xf["expire_time"] = 4
        xf["rotation"] = -theta - PI / 2
        xf["grow_rate"] = 1.25
        xf["alpha_decay"] = 0.8
        s = s.replace(decor=s.decor.push(xf, do=puff))
        return s.replace(
            action_vy=accel * jnp.sin(theta),
            action_vx=accel * jnp.cos(theta),
            action_vrot=(move_action // 3 - 1).astype(f32),
        )

    # -- collisions ---------------------------------------------------------

    def handle_agent_collision_vec(self, s, d, hit):
        # caveflyer.cpp:57-70
        e = s.ents
        goal = jnp.any(hit & (e.type == GOAL))
        lethal = jnp.any(
            hit
            & ((e.type == OBSTACLE) | (e.type == ENEMY) | (e.type == TARGET))
        )
        return s.replace(
            done=s.done | goal | lethal,
            reward=s.reward + jnp.where(goal, f32(GOAL_REWARD), 0.0),
            level_complete=s.level_complete | goal,
        ), d

    def dispatch_entity_pairs(self, s, d):
        """Bullet interactions (caveflyer.cpp:96-122), vectorised.

        Per pair (src in {TARGET,OBSTACLE,ENEMY,GOAL}, bullet): targets lose
        1 health per overlapping bullet (no erase guard in C++); a bullet
        erases + explodes once (first pair wins via the will_erase guard).
        """
        e = s.ents
        slots = jnp.arange(self.ENT_CAP)
        is_bullet = e.active & (e.type == PLAYER_BULLET) & ~e.will_erase
        is_src = (
            e.active
            & ~e.will_erase
            & (
                (e.type == TARGET)
                | (e.type == OBSTACLE)
                | (e.type == ENEMY)
                | (e.type == GOAL)
            )
        )
        dx = jnp.abs(e.x[:, None] - e.x[None, :])
        dy = jnp.abs(e.y[:, None] - e.y[None, :])
        overlap = (
            dx < e.rx[:, None] + e.rx[None, :] + e.collision_margin[:, None]
        ) & (dy < e.ry[:, None] + e.ry[None, :] + e.collision_margin[:, None])
        pair = overlap & is_src[:, None] & is_bullet[None, :]

        # target damage: one per overlapping bullet
        nhits = jnp.sum(pair, axis=1).astype(f32)
        new_health = e.health - jnp.where(e.type == TARGET, nhits, 0.0)
        target_dies = (
            (e.type == TARGET) & (new_health <= 0) & ~e.will_erase & (nhits > 0)
        )
        s = s.replace(
            reward=s.reward + jnp.sum(target_dies).astype(f32) * TARGET_REWARD
        )

        # bullets: erased when hitting anything; explosion inherits the
        # highest-slot src's velocity (reverse-scan first pair)
        bullet_hit = jnp.any(pair, axis=0)
        src_win = jnp.max(jnp.where(pair, slots[:, None], -1), axis=0)
        sw = jnp.maximum(src_win, 0)

        ents = e.replace(
            health=new_health,
            will_erase=e.will_erase | target_dies | bullet_hit,
        )
        s = s.replace(ents=ents)

        # explosions (decor): one per dead target, one per erased bullet —
        # batched push with the sequential interleave (slot i: target boom
        # then bullet boom) preserved by stacking along a trailing pair axis
        def inter(a, b):
            return jnp.stack([a, b], axis=1).reshape(-1)

        bm = default_fields(
            inter(e.x, e.x), inter(e.y, e.y),
            inter(jnp.zeros_like(e.vx), e.vx[sw]),
            inter(jnp.zeros_like(e.vy), e.vy[sw]),
            inter(0.5 * e.rx, 0.5 * e.rx), inter(0.5 * e.rx, 0.5 * e.rx),
            EXPLOSION,
        )
        s = s.replace(decor=s.decor.push_many(bm, inter(target_dies, bullet_hit)))
        return s, d

    # -- reset --------------------------------------------------------------

    def game_reset(self, s: BasicState) -> BasicState:
        s = self.game_reset_base(s)
        dim = self.world_dim
        A = dim * dim
        g = s.rand_gen

        # random fill (caveflyer.cpp:139-147)
        g, rolls = rng.draw_n(g, A)
        r01 = rolls.astype(f32) * jnp.float32(2.0**-32)
        grid = jnp.where(r01.reshape(dim, dim) < 0.5, WALL_OBJ, SPACE)

        for _ in range(4):
            grid = roomgen.ca_update(grid, WALL_OBJ, SPACE, dim)

        best = roomgen.best_room_mask(grid, SPACE, dim)
        grid = jnp.where(best, SPACE, WALL_OBJ)

        # agent + goal cells: simple_choose(free, 2) over ascending free list
        flat_free = best.reshape(-1)
        nfree = jnp.maximum(jnp.sum(flat_free).astype(i32), 2)
        ranks = jnp.cumsum(flat_free.astype(i32)) - 1

        def pick2(carry, _):
            g, used = carry
            g, v = rng.randn(g, nfree)

            def body(c):
                g_, v_ = c
                return rng.randn(g_, nfree)

            g, v = jax.lax.while_loop(lambda c: used[c[1]], body, (g, v))
            used = used.at[v].set(True)
            return (g, used), v

        (g, _), picks = jax.lax.scan(
            pick2, (g, jnp.zeros((A,), bool)), None, length=2
        )
        agent_cell = jnp.argmax(flat_free & (ranks == picks[0]))
        goal_cell = jnp.argmax(flat_free & (ranks == picks[1]))

        s = s.replace(
            ents=s.ents.set_fields(
                0,
                x=(agent_cell % dim).astype(f32) + 0.5,
                y=(agent_cell // dim).astype(f32) + 0.5,
            )
        )
        gf = default_fields(
            (goal_cell % dim).astype(f32) + 0.5,
            (goal_cell // dim).astype(f32) + 0.5,
            0.0, 0.0, 0.5, 0.5, GOAL,
        )
        gf["collides_with_entities"] = True
        s = s.replace(ents=s.ents.push(gf))

        path = roomgen.bfs_path_mask(grid, SPACE, agent_cell, goal_cell, dim)

        if self.options.distribution_mode != MEMORY_MODE:
            wide = roomgen.expand_mask(path, (grid == SPACE).reshape(-1), 4, dim)
            grid = jnp.where(wide.reshape(dim, dim), SPACE, WALL_OBJ)

        # 4 CA iterations, re-carving the path each time (caveflyer.cpp:201-207)
        for _ in range(4):
            grid = roomgen.ca_update(grid, WALL_OBJ, SPACE, dim)
            grid = jnp.where(path.reshape(dim, dim), SPACE, grid)

        # path -> MARKER; WALL -> CAVEWALL; collect free cells
        grid = jnp.where(path.reshape(dim, dim), MARKER, grid)
        free2 = (grid == SPACE).reshape(-1)
        grid = jnp.where(grid == WALL_OBJ, CAVEWALL, grid)

        nfree2 = jnp.sum(free2).astype(i32)
        chunk = nfree2 // 80
        num_objs = 3 * chunk
        ranks2 = jnp.cumsum(free2.astype(i32)) - 1

        def pickN(carry, j):
            g, used = carry
            do = j < num_objs
            g2, v = rng.randn(g, jnp.maximum(nfree2, 1))
            g2, v, _, _ = jax.lax.while_loop(
                lambda c: c[2][c[1]] & c[3],
                lambda c: rng.randn(c[0], jnp.maximum(nfree2, 1)) + (c[2], c[3]),
                (g2, v, used, do),
            )
            g = tree_where(do, g2, g)
            used = used.at[v].set(used[v] | do)
            return (g, used), jnp.where(do, v, -1)

        (g, _), sel = jax.lax.scan(
            pickN, (g, jnp.zeros((A,), bool)), jnp.arange(self.MAX_OBJS)
        )

        # kinds occupy contiguous index blocks (obstacles, targets, enemies)
        # so three batched pushes preserve the C++ creation order
        recs = {k: ([], []) for k in ("o", "t", "e")}
        for i in range(self.MAX_OBJS):
            do = sel[i] >= 0
            cell = jnp.argmax(free2 & (ranks2 == sel[i]))
            cx = (cell % dim).astype(f32) + 0.5
            cy = (cell // dim).astype(f32) + 0.5
            kind_obstacle = do & (i < chunk)
            kind_target = do & (i >= chunk) & (i < 2 * chunk)
            kind_enemy = do & (i >= 2 * chunk)

            of = default_fields(cx, cy, 0.0, 0.0, 0.5, 0.5, OBSTACLE)
            of["collides_with_entities"] = True
            recs["o"][0].append(of)
            recs["o"][1].append(kind_obstacle)

            tf = default_fields(cx, cy, 0.0, 0.0, 0.5, 0.5, TARGET)
            tf["health"] = 5.0
            tf["collides_with_entities"] = True
            recs["t"][0].append(tf)
            recs["t"][1].append(kind_target)

            g2, v01 = rng.rand01(g)
            vel0 = 0.1 * v01 + 0.1
            g2, sgn0 = rng.randn(g2, 2)
            vel = vel0 * (sgn0 * 2 - 1).astype(f32)
            g2, axis01 = rng.rand01(g2)
            g = tree_where(kind_enemy, g2, g)
            ef = default_fields(cx, cy, 0.0, 0.0, 0.5, 0.5, ENEMY)
            ef["vx"] = jnp.where(axis01 < 0.5, vel, 0.0)
            ef["vy"] = jnp.where(axis01 < 0.5, 0.0, vel)
            ef["smart_step"] = True
            ef["collides_with_entities"] = True
            recs["e"][0].append(ef)
            recs["e"][1].append(kind_enemy)

        for kind in ("o", "t", "e"):
            rs, ds = recs[kind]
            s = s.replace(
                ents=s.ents.push_many(
                    {k: jnp.stack([r[k] for r in rs]) for k in rs[0]},
                    jnp.stack(ds),
                )
            )

        grid = jnp.where(grid == MARKER, SPACE, grid)
        s = s.replace(
            grid=grid,
            rand_gen=g,
            visibility=f32(self.visibility),
        )
        return s

    # -- per-step -----------------------------------------------------------

    def game_step(self, s: BasicState, d):
        s, d = self.game_step_base(s, d)
        e = s.ents

        # fire (caveflyer.cpp:293-301)
        fire = s.special_action == 1
        theta = -e.rotation[0] + PI / 2
        bf = default_fields(
            e.x[0], e.y[0], jnp.cos(theta), jnp.sin(theta), 0.1, 0.25,
            PLAYER_BULLET,
        )
        bf["expire_time"] = 10
        bf["rotation"] = e.rotation[0]
        s = s.replace(ents=s.ents.push(bf, do=fire))

        # enemies face their motion; bullets explode on cave walls
        # (caveflyer.cpp:303-327)
        e = s.ents
        is_enemy = e.active & (e.type == ENEMY)
        moving = (e.vx != 0) | (e.vy != 0)
        rot = jnp.where(
            is_enemy & moving,
            -jnp.arctan2(e.vy, e.vx) + (-PI / 2),
            e.rotation,
        )
        s = s.replace(ents=e.replace(rotation=rot))

        e = s.ents
        is_bullet = e.active & (e.type == PLAYER_BULLET)
        found_wall = jnp.zeros((self.ENT_CAP,), bool)
        for ci in (-1, 1):
            for cj in (-1, 1):
                px = e.x + e.rx * ci
                py = e.y + e.ry * cj
                neg = (px < 0) | (py < 0)
                xi = jnp.clip(jnp.floor(px).astype(i32), 0, self.world_dim - 1)
                yi = jnp.clip(jnp.floor(py).astype(i32), 0, self.world_dim - 1)
                inb = (
                    (jnp.floor(px).astype(i32) >= 0)
                    & (jnp.floor(px).astype(i32) < s.main_width)
                    & (jnp.floor(py).astype(i32) >= 0)
                    & (jnp.floor(py).astype(i32) < s.main_height)
                )
                t2 = jnp.where(
                    neg | ~inb, self.out_of_bounds_object, s.grid[yi, xi]
                )
                found_wall = found_wall | (t2 == CAVEWALL)
        boom = is_bullet & found_wall
        s = s.replace(ents=e.replace(will_erase=e.will_erase | boom))

        xf = default_fields(
            e.x, e.y, 0.0, 0.0, 0.5 * e.rx, 0.5 * e.rx, EXPLOSION
        )
        s = s.replace(decor=s.decor.push_many(xf, boom))

        # trailing erase_if_needed (caveflyer.cpp:329)
        s = self.erase_if_needed(s)
        return s, d
