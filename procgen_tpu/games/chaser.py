"""Chaser (Pac-Man): eat orbs (+0.04), large orbs make enemies vulnerable,
clear all orbs for +10.  Reference: procgen/src/games/chaser.cpp.

Enemy junction AI (greedy-Manhattan chase / flee with random tie-break from
step_rand_int, chaser.cpp:293-365) is fully vectorised per enemy slot; the
no-dead-end Kruskal maze comes from levelgen.maze.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

from ..core import rng
from ..core.constants import (
    EASY_MODE,
    EXTREME_MODE,
    HARD_MODE,
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

ORB_REWARD = 0.04
COMPLETION_BONUS = 10.0
ORB_DIM = 0.3

LARGE_ORB = 2
ENEMY_WEAK = 3
ENEMY_EGG = 4
MAZE_WALL = 5
ENEMY = 6
ENEMY2 = 7
ENEMY3 = 8

MARKER = 1001
ORB = 1002

EAT_TIMEOUT = 75
EGG_TIMEOUT = 50


@struct.dataclass
class ChaserState:
    eat_time: jnp.ndarray
    total_orbs: jnp.ndarray
    orbs_collected: jnp.ndarray


@register("chaser")
class Chaser(BasicAbstractGame):
    name = "chaser"
    ENT_CAP = 16
    MAX_STEP_DRAWS = 4
    MAX_SUB_STEPS = 4
    ONLY_AGENT_SMART = False  # enemies are smart
    SMART_VECTORIZABLE = True
    MAX_SMART = 8  # bound on simultaneous smart movers; worst-case rollouts: tests/test_env.py::test_max_smart_bound

    def __init__(self, options):
        super().__init__(options)
        self.mixrate = 1.0
        self.maxspeed = 0.5
        self.has_useful_vel_info = False
        self.center_agent = False  # forced at reset (chaser.cpp:161)

        mode = options.distribution_mode
        if mode == EASY_MODE:
            self.maze_dim, self.total_enemies, self.extra_orb_sign = 11, 3, 0
        elif mode == HARD_MODE:
            self.maze_dim, self.total_enemies, self.extra_orb_sign = 13, 3, -1
        elif mode == EXTREME_MODE:
            self.maze_dim, self.total_enemies, self.extra_orb_sign = 19, 5, 1
        else:
            raise ValueError(f"chaser does not support distribution_mode {mode}")
        self.WORLD_DIM_MAX = (self.maze_dim, self.maze_dim)

    def background_names(self):
        from ..render.assets import TOPDOWN_SIMPLE_BACKGROUNDS

        return TOPDOWN_SIMPLE_BACKGROUNDS

    def asset_for_type(self, type_):
        # chaser.cpp:54-72
        return {
            PLAYER: ["misc_assets/enemyFloating_1b.png"],
            ENEMY: ["misc_assets/enemyFlying_1.png"],
            ENEMY2: ["misc_assets/enemyFlying_2.png"],
            ENEMY3: ["misc_assets/enemyFlying_3.png"],
            LARGE_ORB: ["misc_assets/yellowCrystal.png"],
            ENEMY_WEAK: ["misc_assets/enemyWalking_1b.png"],
            ENEMY_EGG: ["misc_assets/enemySpikey_1b.png"],
            MAZE_WALL: ["misc_assets/tileStone_slope.png"],
        }.get(type_, [])

    def use_block_asset(self, type_):
        return type_ == MAZE_WALL

    def game_init_state(self):
        z = jnp.zeros((), i32)
        return ChaserState(eat_time=z, total_orbs=z, orbs_collected=z)

    def choose_world_dim(self, s):
        d = jnp.asarray(self.maze_dim, i32)
        return s.replace(main_width=d, main_height=d)

    # -- hooks --------------------------------------------------------------

    def _can_eat(self, s):
        return s.cur_time - s.game.eat_time < EAT_TIMEOUT

    def update_agent_velocity(self, s):
        # chaser.cpp:79-88
        e = s.ents
        vx = jnp.where(s.action_vx != 0, s.maxspeed * s.action_vx, e.vx[0])
        vy = jnp.where(s.action_vy != 0, s.maxspeed * s.action_vy, e.vy[0])
        vx = jnp.sign(vx) * s.maxspeed
        vy = jnp.sign(vy) * s.maxspeed
        return s.replace(ents=e.set_fields(0, vx=vx, vy=vy))

    def is_blocked(self, s, src_type, target_type, is_horizontal):
        return (target_type == MAZE_WALL) | super().is_blocked(
            s, src_type, target_type, is_horizontal
        )

    def image_for_type(self, s, type_):
        # chaser.cpp:100-112
        rem = (s.cur_time // 2) % 4
        rem = jnp.where(rem == 3, 1, rem)
        enemy_img = jnp.where(self._can_eat(s), ENEMY_WEAK, ENEMY + rem)
        return jnp.where(type_ == ENEMY, enemy_img, jnp.abs(type_))

    def grid_cell_colors(self, s, gtype, u, v):
        valid, r, g, b = super().grid_cell_colors(s, gtype, u, v)
        # small green orbs (chaser.cpp:114-120)
        is_orb = gtype == ORB
        central = (jnp.abs(u - 0.5) < ORB_DIM / 2) & (jnp.abs(v - 0.5) < ORB_DIM / 2)
        valid = jnp.where(is_orb, central, valid)
        r = jnp.where(is_orb, 0, r)
        g = jnp.where(is_orb, 255, g)
        b = jnp.where(is_orb, 0, b)
        return valid, r, g, b

    def grid_cell_inset(self, s, gtype):
        # small centered orb rect (chaser.cpp:114-120); see
        # BasicAbstractGame.grid_cell_inset for the inset model
        return jnp.where(gtype == ORB, ORB_DIM, 2.0).astype(jnp.float32)

    def handle_agent_collision(self, s, d, i):
        # chaser.cpp:122-137
        e = s.ents
        (t,) = onehot_select(i, e.type)
        large = t == LARGE_ORB
        enemy = t == ENEMY
        can_eat = self._can_eat(s)
        eat_enemy = enemy & can_eat
        die = enemy & ~can_eat
        s = s.replace(
            game=s.game.replace(
                eat_time=jnp.where(large, s.cur_time, s.game.eat_time)
            ),
            reward=s.reward + jnp.where(large, f32(ORB_REWARD), 0.0),
            ents=e.set_fields_where(i, large | eat_enemy, will_erase=True),
            done=s.done | die,
        )
        return s, d

    # -- reset --------------------------------------------------------------

    def _simple_choose_quadrant(self, g, cand_mask_cm, count, k_max: int, num):
        """simple_choose over a candidate list given in column-major order.

        Returns the selected flat ranks (within the candidate list).
        """
        def pick(carry, j):
            g, used = carry
            do = j < num
            g2, v = rng.randn(g, jnp.maximum(count, 1))

            def cond(c):
                return c[2][c[1]] & c[3]

            def body(c):
                g, v, used, do = c
                g, v = rng.randn(g, jnp.maximum(count, 1))
                return (g, v, used, do)

            g2, v, used, _ = jax.lax.while_loop(
                cond, body, (g2, v, used, do)
            )
            g = tree_where(do, g2, g)
            used = used.at[v].set(used[v] | do)
            return (g, used), jnp.where(do, v, -1)

        (g, _), sel = jax.lax.scan(
            pick,
            (g, jnp.zeros((cand_mask_cm.shape[0],), bool)),
            jnp.arange(k_max),
        )
        return g, sel

    def game_reset(self, s: BasicState) -> BasicState:
        dim = self.maze_dim
        s = self.game_reset_base(s)
        s = s.replace(
            ents=s.ents.set_fields(0, rx=0.5, ry=0.5),
            game=ChaserState(
                eat_time=jnp.asarray(-EAT_TIMEOUT, i32),
                total_orbs=jnp.zeros((), i32),
                orbs_collected=jnp.zeros((), i32),
            ),
        )

        g, mgrid, _, _, _ = mazegen.generate_maze_no_dead_ends(
            s.rand_gen, jnp.asarray(dim, i32), dim
        )
        g, extra_quad = rng.randn(g, 4)
        s = s.replace(rand_gen=g)

        # copy maze into the world: WALL_OBJ -> MAZE_WALL (chaser.cpp:185-200)
        adim = dim + 2
        gx = jnp.arange(dim)[None, :]
        gy = jnp.arange(dim)[:, None]
        mpos = (gy + 1) * adim + (gx + 1)
        world = mgrid[jnp.clip(mpos, 0, mgrid.shape[0] - 1)]
        world = jnp.where(world == WALL_OBJ, MAZE_WALL, world)
        s = s.replace(grid=world)

        space = world == SPACE

        # per-quadrant large orbs: candidates listed column-major (x outer)
        # to match the C++ push order (chaser.cpp:190-199)
        qx = (gx >= dim / 2.0).astype(i32) * 2
        qy = (gy >= dim / 2.0).astype(i32)
        quad = qx + qy  # [dim(y), dim(x)]
        space_cm = space.T.reshape(-1)  # column-major flat: x * dim + y
        quad_cm = quad.T.reshape(-1)
        cell_of_cm = (
            jnp.arange(dim * dim) % dim * dim + jnp.arange(dim * dim) // dim
        )  # cm position -> flat row-major cell idx (y*dim+x)

        g = s.rand_gen
        for qi in range(4):
            num_orbs = 1 + jnp.where(qi == extra_quad, self.extra_orb_sign, 0)
            cand = space_cm & (quad_cm == qi)
            count = jnp.sum(cand).astype(i32)
            ranks = jnp.cumsum(cand.astype(i32)) - 1

            g, sel = self._simple_choose_quadrant(
                g, cand, count, 2, num_orbs
            )
            for j in range(2):
                do = sel[j] >= 0
                pos_cm = jnp.argmax(cand & (ranks == sel[j]))
                cell = cell_of_cm[pos_cm]
                cy = cell // dim
                cx = cell % dim
                f = default_fields(
                    cx.astype(f32) + 0.5, cy.astype(f32) + 0.5, 0.0, 0.0,
                    0.4, 0.4, LARGE_ORB,
                )
                s = s.replace(ents=s.ents.push(f, do=do))
                s = s.replace(
                    grid=s.grid.at[cy, cx].set(
                        jnp.where(do, MARKER, s.grid[cy, cx])
                    )
                )
        s = s.replace(rand_gen=g)

        # agent + enemy eggs from remaining SPACE cells (row-major order)
        space2 = (s.grid == SPACE).reshape(-1)
        count2 = jnp.sum(space2).astype(i32)
        ranks2 = jnp.cumsum(space2.astype(i32)) - 1

        g, sel2 = self._simple_choose_quadrant(
            s.rand_gen, space2, count2, 1 + self.total_enemies,
            jnp.asarray(1 + self.total_enemies, i32),
        )
        s = s.replace(rand_gen=g)

        start_cell = jnp.argmax(space2 & (ranks2 == sel2[0]))
        s = s.replace(
            ents=s.ents.set_fields(
                0,
                x=(start_cell % dim).astype(f32) + 0.5,
                y=(start_cell // dim).astype(f32) + 0.5,
            )
        )
        for ei in range(self.total_enemies):
            cell = jnp.argmax(space2 & (ranks2 == sel2[ei + 1]))
            cy = cell // dim
            cx = cell % dim
            s = s.replace(
                grid=s.grid.at[cy, cx].set(MARKER)
            )
            f = default_fields(
                cx.astype(f32) + 0.5, cy.astype(f32) + 0.5, 0.0, 0.0, 0.5, 0.5,
                ENEMY_EGG,
            )
            f["health"] = float(EGG_TIMEOUT)
            s = s.replace(ents=s.ents.push(f))

        # all pre-marker SPACE cells become orbs — including the agent and
        # egg cells, whose MARKERs were set after free_cells was computed
        # (chaser.cpp:220-231 ordering quirk)
        world = s.grid
        world = jnp.where(space2.reshape(dim, dim), ORB, world)
        # orb MARKERs (set before free_cells) revert to SPACE
        world = jnp.where(world == MARKER, SPACE, world)
        s = s.replace(
            grid=world,
            game=s.game.replace(total_orbs=count2),
        )
        return s

    # -- per-step -----------------------------------------------------------

    def _free_cell_ranks(self, s):
        """free_cells = non-wall cells, flat ascending (chaser.cpp:233-243)."""
        free = (s.grid != MAZE_WALL).reshape(-1)
        return free, jnp.cumsum(free.astype(i32)) - 1, jnp.sum(free).astype(i32)

    def game_step(self, s: BasicState, d):
        s, d = self.game_step_base(s, d)
        dim = self.maze_dim
        e = s.ents

        num_enemies = jnp.sum(
            e.active & ((e.type == ENEMY_EGG) | (e.type == ENEMY))
        )

        can_eat = self._can_eat(s)
        vscale = jnp.where(can_eat, 0.25, 0.5)

        # eggs age; at 0 health they hatch (chaser.cpp:281-290)
        is_egg = e.active & (e.type == ENEMY_EGG)
        health = jnp.where(is_egg, e.health - 1, e.health)
        hatch = is_egg & (health == 0)
        s = s.replace(
            ents=e.replace(
                health=health, will_erase=e.will_erase | hatch
            )
        )

        # enemy junction AI (chaser.cpp:291-345), vectorised over slots
        e = s.ents
        ex = e.x - 0.5
        ey = e.y - 0.5
        is_enemy = e.active & (e.type == ENEMY)
        agent_idx = self.get_agent_index(s)
        ax_i = agent_idx % s.main_width
        ay_i = agent_idx // s.main_width
        junction = (
            jnp.abs(ex - jnp.round(ex)) + jnp.abs(ey - jnp.round(ey)) < 0.01
        )
        trigger = is_enemy & (((e.vx == 0) & (e.vy == 0)) | junction)
        cx = jnp.trunc(ex).astype(i32)
        cy = jnp.trunc(ey).astype(i32)
        px = jnp.trunc(ex - jnp.sign(e.vx)).astype(i32)
        py = jnp.trunc(ey - jnp.sign(e.vy)).astype(i32)
        prev_valid = (px >= 0) & (px < dim) & (py >= 0) & (py < dim)
        prev_idx = jnp.where(prev_valid, py * dim + px, -999)

        dist_scale = jnp.where(can_eat, -1, 1)
        be_aggressive = s.step_rand_int % 2 == 0

        offs = ((-1, 0), (0, -1), (0, 1), (1, 0))  # get_adjacent order
        valids, mds, nxs, nys = [], [], [], []
        for dx, dy in offs:
            nx = cx + dx
            ny = cy + dy
            inb = (nx >= 0) & (nx < dim) & (ny >= 0) & (ny < dim)
            nidx = ny * dim + nx
            nspace = (
                self.get_obj(s, nx, ny) != MAZE_WALL
            ) & inb & (nidx != prev_idx)
            md = (jnp.abs(nx - ax_i) + jnp.abs(ny - ay_i)) * dist_scale
            valids.append(nspace)
            mds.append(md)
            nxs.append(nx)
            nys.append(ny)
        valids = jnp.stack(valids)  # [4, cap]
        mds = jnp.stack(mds)
        nxs = jnp.stack(nxs)
        nys = jnp.stack(nys)

        min_md = jnp.min(jnp.where(valids, mds, 2 * dim), axis=0)
        cands = jnp.where(be_aggressive, valids & (mds == min_md), valids)
        counts = jnp.maximum(jnp.sum(cands, axis=0), 1)
        k = s.step_rand_int % counts
        cranks = jnp.cumsum(cands.astype(i32), axis=0) - 1
        sel = jnp.argmax(cands & (cranks == k), axis=0)
        sel_nx = jnp.take_along_axis(nxs, sel[None], 0)[0]
        sel_ny = jnp.take_along_axis(nys, sel[None], 0)[0]

        new_vx = (sel_nx.astype(f32) - ex) * vscale
        new_vy = (sel_ny.astype(f32) - ey) * vscale
        e = s.ents
        s = s.replace(
            ents=e.replace(
                vx=jnp.where(trigger, new_vx, e.vx),
                vy=jnp.where(trigger, new_vy, e.vy),
            )
        )

        # hatched eggs spawn smart enemies, highest slot first (reverse loop)
        rev = slice(None, None, -1)
        f = default_fields(e.x[rev], e.y[rev], 0.0, 0.0, 0.5, 0.5, ENEMY)
        f["smart_step"] = True
        s = s.replace(ents=s.ents.push_many(f, hatch[rev]))

        # respawn an egg when below quota (chaser.cpp:348-351)
        free, ranks, nfree = self._free_cell_ranks(s)
        spawn = num_enemies < self.total_enemies
        cell = jnp.argmax(free & (ranks == s.step_rand_int % jnp.maximum(nfree, 1)))
        f = default_fields(
            (cell % dim).astype(f32) + 0.5, (cell // dim).astype(f32) + 0.5,
            0.0, 0.0, 0.5, 0.5, ENEMY_EGG,
        )
        f["health"] = float(EGG_TIMEOUT)
        s = s.replace(ents=s.ents.push(f, do=spawn))

        # orb pickup + completion (chaser.cpp:353-365)
        aidx = self.get_agent_index(s)
        aty = aidx // s.main_width
        atx = aidx % s.main_width
        on_orb = self.get_obj(s, atx, aty) == ORB
        grid = s.grid.at[aty, atx].set(
            jnp.where(on_orb, SPACE, s.grid[jnp.clip(aty, 0, dim - 1), jnp.clip(atx, 0, dim - 1)])
        )
        collected = s.game.orbs_collected + on_orb.astype(i32)
        complete = collected == s.game.total_orbs
        s = s.replace(
            grid=grid,
            reward=s.reward
            + jnp.where(on_orb, f32(ORB_REWARD), 0.0)
            + jnp.where(complete, f32(COMPLETION_BONUS), 0.0),
            level_complete=s.level_complete | complete,
            done=s.done | complete,
            game=s.game.replace(orbs_collected=collected),
        )
        return s, d
