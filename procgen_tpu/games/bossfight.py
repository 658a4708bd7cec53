"""Bossfight: dodge boss attack patterns, shoot when shields drop; +1 per
round, +10 on the kill.  Reference: procgen/src/games/bossfight.cpp.

The boss lives in slot 1 and its shield in slot 2 (creation order after the
agent).  The rand_pct* values used by collision reflection are the ones
drawn on the *previous* step (the C++ dispatch runs inside the base step,
before this step's draws) — hence they live in game state, as serialized in
the reference.
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
BOSS = 2
SHIELDS = 3
ENEMY_BULLET = 4
LASER_TRAIL = 5
REFLECTED_BULLET = 6
BARRIER = 7

BOSS_R = 3.0
NUM_ATTACK_MODES = 4
NUM_LASER_THEMES = 3
PLAYER_BULLET_VEL = 1.0
BOTTOM_MARGIN = 6.0
BOSS_VEL_TIMEOUT = 20
BOSS_DAMAGED_TIMEOUT = 40
PI = math.pi

BOSS_SLOT = 1
SHIELD_SLOT = 2


@struct.dataclass
class BossfightState:
    attack_modes: jnp.ndarray  # i32[5]
    last_fire_time: jnp.ndarray
    time_to_swap: jnp.ndarray
    invulnerable_duration: jnp.ndarray
    num_rounds: jnp.ndarray
    round_num: jnp.ndarray
    round_health: jnp.ndarray
    curr_vel_timeout: jnp.ndarray
    attack_mode: jnp.ndarray
    player_laser_theme: jnp.ndarray
    boss_laser_theme: jnp.ndarray
    damaged_until_time: jnp.ndarray
    shields_are_up: jnp.ndarray
    boss_bullet_vel: jnp.ndarray
    rand_pct: jnp.ndarray
    rand_fire_pct: jnp.ndarray
    rand_pct_x: jnp.ndarray
    rand_pct_y: jnp.ndarray


@register("bossfight")
class Bossfight(BasicAbstractGame):
    name = "bossfight"
    WORLD_DIM_MAX = (20, 20)
    ENT_CAP = 72
    ARB_ROT_TYPES = {4: 16}  # enemy bullets spin by pi/8 steps
    # (vrot = pi/8, bossfight.cpp:262): 16 buckets are exact
    DECOR_CAP = 160  # laser trails (one per enemy bullet per step) + booms
    DECOR_TYPES = frozenset(range(54, 60)) | {LASER_TRAIL}
    DISPATCH_VECTORIZED = True
    ANY_COLLIDES_WITH_ENTITIES = True
    MAX_STEP_DRAWS = 8
    MAX_SUB_STEPS = 6  # maxspeed .85
    VULNERABLE_DURATION = 500
    # the arena never writes the grid and the camera is fixed (full-world
    # view, bossfight.cpp:202), so bg+grid+cell layers are per-level
    # constants — guarded by tests/test_static_frame.py
    STATIC_RENDER_PREFIX = True

    def __init__(self, options):
        super().__init__(options)
        self.timeout = 4000
        self.mixrate = 0.5
        self.maxspeed = 0.85
        self.center_agent = False
        self._boss_bullet_vel = 0.5 if options.distribution_mode == EASY_MODE else 0.75
        self.max_extra_invuln = 1 if options.distribution_mode == EASY_MODE else 3
        self.base_fire_prob = 0.1

    def background_names(self):
        from ..render.assets import SPACE_BACKGROUNDS

        return SPACE_BACKGROUNDS

    def asset_for_type(self, type_):
        # bossfight.cpp:77-108
        if type_ == PLAYER:
            return [
                "misc_assets/playerShip1_blue.png",
                "misc_assets/playerShip1_green.png",
                "misc_assets/playerShip2_orange.png",
                "misc_assets/playerShip3_red.png",
            ]
        if type_ == BOSS:
            return [
                "misc_assets/enemyShipBlack1.png",
                "misc_assets/enemyShipBlue2.png",
                "misc_assets/enemyShipGreen3.png",
                "misc_assets/enemyShipRed4.png",
            ]
        if type_ in (ENEMY_BULLET, PLAYER_BULLET):
            return [
                "misc_assets/laserGreen14.png",
                "misc_assets/laserRed11.png",
                "misc_assets/laserBlue09.png",
            ]
        if type_ == SHIELDS:
            return ["misc_assets/shield2.png"]
        if type_ == BARRIER:
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
        return []

    def game_init_state(self):
        z = jnp.zeros((), i32)
        zf = jnp.zeros((), f32)
        return BossfightState(
            attack_modes=jnp.zeros((5,), i32),
            last_fire_time=z, time_to_swap=z, invulnerable_duration=z,
            num_rounds=z, round_num=z, round_health=jnp.ones((), i32),
            curr_vel_timeout=z, attack_mode=z, player_laser_theme=z,
            boss_laser_theme=z, damaged_until_time=z,
            shields_are_up=jnp.asarray(False),
            boss_bullet_vel=jnp.asarray(self._boss_bullet_vel, f32),
            rand_pct=zf, rand_fire_pct=zf, rand_pct_x=zf, rand_pct_y=zf,
        )

    def choose_world_dim(self, s):
        return s.replace(
            main_width=jnp.asarray(20, i32), main_height=jnp.asarray(20, i32)
        )

    def should_draw_entity_mask(self, s):
        m = jnp.ones((self.ENT_CAP,), bool)
        return m.at[SHIELD_SLOT].set(s.game.shields_are_up)

    def handle_agent_collision_vec(self, s, d, hit):
        # bossfight.cpp:110-122
        e = s.ents
        lethal = jnp.any(
            hit
            & ((e.type == BOSS) | (e.type == BARRIER) | (e.type == ENEMY_BULLET))
        )
        return s.replace(done=s.done | lethal), d

    def _prepare_boss(self, s):
        """bossfight.cpp:196-203."""
        g = s.game
        mode = g.attack_modes[jnp.clip(g.round_num % jnp.maximum(g.num_rounds, 1), 0, 4)]
        s = s.replace(
            game=g.replace(
                shields_are_up=jnp.asarray(True),
                curr_vel_timeout=jnp.asarray(BOSS_VEL_TIMEOUT, i32),
                time_to_swap=g.invulnerable_duration,
                attack_mode=mode,
            ),
            ents=s.ents.set_fields(BOSS_SLOT, vx=0.0, vy=0.0),
        )
        return s

    def dispatch_entity_pairs(self, s, d):
        """Player bullets vs shields/boss; barriers vs bullets
        (bossfight.cpp:133-193).  Boss hits are resolved sequentially over
        bullet slots (round transitions are order-dependent)."""
        e = s.ents
        g = s.game
        slots = jnp.arange(self.ENT_CAP)
        is_pb = e.active & (e.type == PLAYER_BULLET) & ~e.will_erase
        dx = jnp.abs(e.x[:, None] - e.x[None, :])
        dy = jnp.abs(e.y[:, None] - e.y[None, :])
        overlap = (
            dx < e.rx[:, None] + e.rx[None, :] + e.collision_margin[:, None]
        ) & (dy < e.ry[:, None] + e.ry[None, :] + e.collision_margin[:, None])

        # shields reflect player bullets (uses last step's rand_pct)
        hit_shield = (
            is_pb
            & overlap[:, SHIELD_SLOT]
            & g.shields_are_up
            & e.active[SHIELD_SLOT]
        )
        theta = PI * (1.25 + 0.5 * g.rand_pct)
        s = s.replace(
            ents=e.replace(
                type=jnp.where(hit_shield, REFLECTED_BULLET, e.type),
                vy=jnp.where(hit_shield, PLAYER_BULLET_VEL * jnp.sin(theta) * 0.5, e.vy),
                vx=jnp.where(hit_shield, PLAYER_BULLET_VEL * jnp.cos(theta) * 0.5, e.vx),
                expire_time=jnp.where(hit_shield, 4, e.expire_time),
                life_time=jnp.where(hit_shield, 0, e.life_time),
                alpha_decay=jnp.where(hit_shield, 0.8, e.alpha_decay),
            )
        )

        # boss hits, reverse bullet order.  Round bookkeeping is sequential
        # (a crossing raises the shields, blocking later bullets this step —
        # so at most ONE crossing per step), but the scan only needs a
        # tiny scalar carry; the heavy per-slot state writes (bullet erase,
        # explosion push, boss prep) apply ONCE after it.
        e0 = s.ents
        g0 = s.game
        cand = (
            (jnp.arange(self.ENT_CAP) < e0.count)
            & (e0.type == PLAYER_BULLET)
            & ~e0.will_erase
            & overlap[:, BOSS_SLOT]
        )

        def boss_hit(carry, j):
            health, shields, crossed_any, killed_any = carry
            i = self.ENT_CAP - 1 - j  # reverse order
            hit = cand[i] & ~shields
            health = health - jnp.where(hit, 1.0, 0.0)
            crossed = hit & (
                health.astype(i32) % jnp.maximum(g0.round_health, 1) == 0
            )
            killed = crossed & (health == 0)
            shields = shields | (crossed & ~killed)  # new round blocks hits
            return (
                health,
                shields,
                crossed_any | crossed,
                killed_any | killed,
            ), hit

        (health, _, crossed_any, killed_any), hits_rev = jax.lax.scan(
            boss_hit,
            (
                e0.health[BOSS_SLOT],
                g0.shields_are_up,
                jnp.asarray(False),
                jnp.asarray(False),
            ),
            jnp.arange(self.ENT_CAP),
        )
        hit_mask = hits_rev[::-1]  # ys are in reverse slot order
        new_round = crossed_any & ~killed_any
        any_hit = jnp.any(hit_mask)
        s = s.replace(
            ents=e0.replace(
                health=e0.health.at[BOSS_SLOT].set(
                    jnp.where(any_hit, health, e0.health[BOSS_SLOT])
                ),
                will_erase=e0.will_erase | hit_mask,
            ),
            reward=s.reward
            + jnp.where(crossed_any, f32(POSITIVE_REWARD), 0.0)
            + jnp.where(killed_any, f32(COMPLETION_BONUS), 0.0),
            done=s.done | killed_any,
            level_complete=s.level_complete | killed_any,
            game=g0.replace(round_num=g0.round_num + new_round.astype(i32)),
        )
        prepped = self._prepare_boss(s)
        prepped = prepped.replace(
            game=prepped.game.replace(
                curr_vel_timeout=jnp.asarray(BOSS_DAMAGED_TIMEOUT, i32),
                damaged_until_time=s.cur_time + BOSS_DAMAGED_TIMEOUT,
            )
        )
        s = tree_where(new_round, prepped, s)
        # explosions inherit the boss velocity, pushed in reverse slot order
        e2 = s.ents
        rev = slice(None, None, -1)
        bx = default_fields(
            e2.x[rev], e2.y[rev],
            jnp.broadcast_to(e2.vx[BOSS_SLOT], (self.ENT_CAP,)),
            jnp.broadcast_to(e2.vy[BOSS_SLOT], (self.ENT_CAP,)),
            (0.5 * e2.rx)[rev], (0.5 * e2.rx)[rev], EXPLOSION,
        )
        s = s.replace(decor=s.decor.push_many(bx, hit_mask[rev]))

        # barriers erase bullets/trails; depleted barriers explode
        e = s.ents
        is_barrier = e.active & (e.type == BARRIER)
        is_bullet = e.active & (
            (e.type == ENEMY_BULLET) | (e.type == PLAYER_BULLET)
        )
        pair = overlap & is_barrier[:, None] & is_bullet[None, :]
        bullet_die = jnp.any(pair, axis=0)
        barrier_die = is_barrier & (e.health <= 0) & jnp.any(pair, axis=1)
        s = s.replace(
            ents=e.replace(will_erase=e.will_erase | bullet_die | barrier_die)
        )

        bf = default_fields(
            e.x, e.y, e.vx, e.vy, 0.5 * e.rx, 0.5 * e.rx, EXPLOSION
        )
        s = s.replace(decor=s.decor.push_many(bf, bullet_die | barrier_die))
        return s, d

    # -- reset --------------------------------------------------------------

    def game_reset(self, s: BasicState) -> BasicState:
        s = self.game_reset_base(s)
        g = s.rand_gen

        # boss + shields (bossfight.cpp:216-224): slots 1 and 2
        g, boss_theme = rng.randn(g, self.num_themes(BOSS))
        boss_ar = self.aspect_ratios(BOSS)[jnp.clip(boss_theme, 0, 3)]
        bf = default_fields(10.0, 10.0, 0.0, 0.0, BOSS_R, BOSS_R / boss_ar, BOSS)
        bf["image_theme"] = boss_theme
        s = s.replace(ents=s.ents.push(bf))
        sf = default_fields(
            10.0, 10.0, 0.0, 0.0, 1.2 * BOSS_R, 1.2 * BOSS_R / boss_ar, SHIELDS
        )
        s = s.replace(ents=s.ents.push(sf))

        g, rh0 = rng.randn(g, 9)
        round_health = rh0 + 1
        g, nr0 = rng.randn(g, 5)
        num_rounds = 1 + nr0
        g, inv0 = rng.randn(g, self.max_extra_invuln + 1)
        invuln = 2 + inv0

        s = s.replace(
            ents=s.ents.set_fields(
                BOSS_SLOT, health=(round_health * num_rounds).astype(f32)
            )
        )

        g, agent_theme = rng.randn(g, self.num_themes(PLAYER))
        g, pl_theme = rng.randn(g, NUM_LASER_THEMES)
        g, bl_theme = rng.randn(g, NUM_LASER_THEMES)

        modes = jnp.zeros((5,), i32)
        for i in range(5):
            on = i < num_rounds
            g2, m0 = rng.randn(g, NUM_ATTACK_MODES)
            g = tree_where(on, g2, g)
            modes = modes.at[i].set(jnp.where(on, m0, 0))

        s = s.replace(
            rand_gen=g,
            game=BossfightState(
                attack_modes=modes,
                last_fire_time=jnp.zeros((), i32),
                time_to_swap=jnp.zeros((), i32),
                invulnerable_duration=invuln,
                num_rounds=num_rounds,
                round_num=jnp.zeros((), i32),
                round_health=round_health,
                curr_vel_timeout=jnp.zeros((), i32),
                attack_mode=jnp.zeros((), i32),
                player_laser_theme=pl_theme,
                boss_laser_theme=bl_theme,
                damaged_until_time=jnp.zeros((), i32),
                shields_are_up=jnp.asarray(False),
                boss_bullet_vel=jnp.asarray(self._boss_bullet_vel, f32),
                rand_pct=jnp.zeros((), f32),
                rand_fire_pct=jnp.zeros((), f32),
                rand_pct_x=jnp.zeros((), f32),
                rand_pct_y=jnp.zeros((), f32),
            ),
        )
        s = self._prepare_boss(s)

        # agent (bossfight.cpp:240-244)
        agent_ar = self.aspect_ratios(PLAYER)[jnp.clip(agent_theme, 0, 3)]
        s = s.replace(
            ents=s.ents.set_fields(
                0, rx=0.75, ry=0.75 / agent_ar, image_theme=agent_theme
            )
        )
        e = s.ents

        def try_place(gg):
            gg, r1 = rng.rand01(gg)
            gg, r2 = rng.rand01(gg)
            ax = r1 * (20.0 - 2 * e.rx[0]) + e.rx[0]
            ay = r2 * (20.0 - 2 * e.ry[0]) + e.ry[0]
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
        s = s.replace(
            rand_gen=gg, ents=s.ents.set_fields(0, x=ax, y=e.ry[0])
        )

        g = s.rand_gen
        g, _right = rng.randbool(g)  # barriers_moves_right (unused: static barriers)

        # spawn_barriers (bossfight.cpp:328-346)
        g, nb0 = rng.randn(g, 3)
        num_barriers = nb0 + 1
        for i in range(3):
            do = i < num_barriers
            barrier_r = 0.6
            e = s.ents
            min_y = 2 * e.ry[0] + barrier_r + 0.5
            g2, y01 = rng.rand01(g)
            ent_y = y01 * (BOTTOM_MARGIN - min_y - barrier_r) + min_y
            g2, x01 = rng.rand01(g2)
            ent_x = x01 * (20.0 - 2 * barrier_r) + barrier_r
            g2, th0 = rng.randn(g2, self.num_themes(BARRIER))
            g = tree_where(do, g2, g)
            ar = self.aspect_ratios(BARRIER)[jnp.clip(th0, 0, 7)]
            f = default_fields(
                ent_x, ent_y, 0.0, 0.0, barrier_r, barrier_r / ar, BARRIER
            )
            f["image_theme"] = th0
            f["health"] = 3.0
            f["collides_with_entities"] = True
            # has_any_collision over BOTH pools — trails/booms block barrier
            # spawns (bossfight.cpp:342; see spawn_blocked)
            hit = self.spawn_blocked(s, ent_x, ent_y, barrier_r, barrier_r / ar)
            s = s.replace(ents=s.ents.push(f, do=do & ~hit))
        return s.replace(rand_gen=g)

    # -- per-step -----------------------------------------------------------

    def _boss_fire_many(self, s, recs, dos):
        return s.replace(
            ents=s.ents.push_many(
                {k: jnp.stack([r[k] for r in recs]) for k in recs[0]},
                jnp.stack(dos),
            )
        )

    def game_step(self, s: BasicState, d):
        s, d = self.game_step_base(s, d)
        e = s.ents
        # shields track the boss (bossfight.cpp:352-353)
        s = s.replace(
            ents=e.set_fields(SHIELD_SLOT, x=e.x[BOSS_SLOT], y=e.y[BOSS_SLOT])
        )

        d, rp = d.rand01()
        d, rfp = d.rand01()
        d, rpx = d.rand01()
        d, rpy = d.rand01()
        g = s.game
        s = s.replace(
            game=g.replace(
                rand_pct=rp, rand_fire_pct=rfp, rand_pct_x=rpx, rand_pct_y=rpy
            )
        )
        g = s.game

        # boss movement / shield swap timer (bossfight.cpp:360-381)
        timeout_hit = g.curr_vel_timeout <= 0
        e = s.ents
        dest_x = rpx * (20.0 - 2 * BOSS_R) + BOSS_R
        dest_y = rpy * (20.0 - 2 * BOSS_R - BOTTOM_MARGIN) + BOSS_R + BOTTOM_MARGIN
        nvx = (dest_x - e.x[BOSS_SLOT]) / BOSS_VEL_TIMEOUT
        nvy = (dest_y - e.y[BOSS_SLOT]) / BOSS_VEL_TIMEOUT
        s = s.replace(
            ents=e.set_fields_where(BOSS_SLOT, timeout_hit, vx=nvx, vy=nvy)
        )
        swap = timeout_hit & (g.time_to_swap <= 0)
        new_tts = jnp.where(
            timeout_hit,
            jnp.where(
                swap,
                jnp.where(
                    g.shields_are_up, self.VULNERABLE_DURATION,
                    g.invulnerable_duration,
                ),
                g.time_to_swap - 1,
            ),
            g.time_to_swap,
        )
        s = s.replace(
            game=g.replace(
                time_to_swap=new_tts,
                shields_are_up=jnp.where(swap, ~g.shields_are_up, g.shields_are_up),
                curr_vel_timeout=jnp.where(
                    timeout_hit, BOSS_VEL_TIMEOUT, g.curr_vel_timeout - 1
                ),
            )
        )
        g = s.game

        # player fire (bossfight.cpp:383-390)
        fire = (s.special_action == 1) & (s.cur_time - g.last_fire_time >= 3)
        pb = default_fields(
            s.ents.x[0], s.ents.y[0], 0.0, PLAYER_BULLET_VEL, 0.25, 0.25,
            PLAYER_BULLET,
        )
        pb["image_theme"] = g.player_laser_theme
        pb["collides_with_entities"] = True
        pb["expire_time"] = 25
        s = s.replace(
            ents=s.ents.push(pb, do=fire),
            game=g.replace(
                last_fire_time=jnp.where(fire, s.cur_time, g.last_fire_time)
            ),
        )
        g = s.game

        # attacks (bossfight.cpp:265-337, 392-398)
        e = s.ents
        bx0, by0 = e.x[BOSS_SLOT], e.y[BOSS_SLOT]
        damaged = g.damaged_until_time >= s.cur_time
        active = ~damaged & g.shields_are_up
        passive = ~damaged & ~g.shields_are_up
        bv = g.boss_bullet_vel
        t = s.cur_time

        def bullet_rec(theta, do_r=0.5):
            f = default_fields(
                bx0, by0, bv * jnp.cos(theta), bv * jnp.sin(theta), do_r, do_r,
                ENEMY_BULLET,
            )
            f["image_theme"] = g.boss_laser_theme
            f["expire_time"] = 50
            f["vrot"] = PI / 8
            return f

        recs, dos = [], []
        # passive: one aimed-down random bullet
        recs.append(bullet_rec(PI * (1 + g.rand_pct)))
        dos.append(passive & (g.rand_fire_pct < self.base_fire_prob))
        # mode 0: 5-bullet fan every 8
        m0 = active & (g.attack_mode == 0) & (t % 8 == 0)
        for i in range(5):
            recs.append(bullet_rec(PI * 1.5 + (i - 2) * PI / 8))
            dos.append(m0)
        # mode 1: rotating 4-bullet cross every 5
        k = jnp.abs(8 - ((t // 5) % 16))
        m1 = active & (g.attack_mode == 1) & (t % 5 == 0)
        for i in range(4):
            recs.append(bullet_rec(PI * (1.25 + 0.5 * k.astype(f32) / 8.0) + i * PI / 2))
            dos.append(m1)
        # mode 2: 8-bullet ring every 10 with random offset
        m2 = active & (g.attack_mode == 2) & (t % 10 == 0)
        for i in range(8):
            recs.append(bullet_rec(2 * PI / 8 * i + g.rand_pct * 2 * PI))
            dos.append(m2)
        # mode 3: aimed-down bullet every 4
        recs.append(bullet_rec(PI * (1 + g.rand_pct)))
        dos.append(active & (g.attack_mode == 3) & (t % 4 == 0))
        s = self._boss_fire_many(s, recs, dos)

        # damaged mode: explosions on the hull every 3 (bossfight.cpp:308-315)
        dmg = damaged & (t % 3 == 0)
        ex = default_fields(
            bx0 + (2 * g.rand_pct_x - 1) * e.rx[BOSS_SLOT],
            by0 + (2 * g.rand_pct_y - 1) * e.ry[BOSS_SLOT],
            0.0, 0.0, 0.75, 0.75, EXPLOSION,
        )
        s = s.replace(decor=s.decor.push(ex, do=dmg))

        # laser trails per enemy bullet (bossfight.cpp:400-414)
        e = s.ents

        # one batched push, highest slot first (the C++ loop runs in reverse)
        rev = slice(None, None, -1)
        is_eb = ((jnp.arange(self.ENT_CAP) < e.count)
                 & (e.type == ENEMY_BULLET))[rev]
        f = default_fields(
            e.x[rev], e.y[rev], e.vx[rev] * 0.5, e.vy[rev] * 0.5,
            e.rx[rev], e.ry[rev], LASER_TRAIL,
        )
        f["alpha_decay"] = 0.7
        f["image_type"] = ENEMY_BULLET
        f["image_theme"] = g.boss_laser_theme
        f["vrot"] = e.vrot[rev]
        f["rotation"] = e.rotation[rev]
        f["expire_time"] = 8
        s = s.replace(decor=s.decor.push_many(f, is_eb))
        return s, d
