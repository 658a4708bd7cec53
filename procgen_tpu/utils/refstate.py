"""Bidirectional bridge to reference-format serialized states (WriteBuffer).

The reference checkpoints an env as a raw little-endian byte stream
(game.cpp:196-304 -> basic-abstract-game.cpp:1178-1280 -> entity.cpp:90-177
-> per-game tails), with both mt19937 streams stored as libstdc++ textual
state (randgen.cpp:100-114: 624 words + position).  This module converts
that layout to and from the ``BasicState`` pytree:

- ``import_reference_state``: a state produced by the reference engine is
  dropped into the TPU runtime mid-episode and replayed bit-exactly
  (tests/test_refstate_bridge.py, all 16 games).
- ``export_reference_state``: a TPU state is serialized to reference bytes
  that the reference engine accepts via ``deserialize`` and replays
  bit-exactly (the mirror test, driven through tools/refharness
  ``--load-states``).

Every BasicAbstractGame layout field is generic; per-game serialize tails
(e.g. bossfight.cpp:415-441) are table-driven below for all 16 games.
Fields the TPU design derives on the fly (camera scalars unit/view_dim/
x_off/y_off — recomputed by prepare_for_drawing before any use,
basic-abstract-game.cpp:828-847 — and the asset RNG, reseeded before each
use, basic-abstract-game.cpp:103) are written as placeholders on export
and skipped on import; fields that exist only TPU-side (total_reward HUD
accumulator, step_draws, the static render-prefix frame) are
reconstructed on import.
"""

from __future__ import annotations

import struct

import jax.numpy as jnp
import numpy as np

from ..core.constants import SERIALIZE_VERSION
from ..core import rng as rnglib

i32 = jnp.int32
f32 = jnp.float32


class _Reader:
    def __init__(self, data: bytes):
        self.data = data
        self.off = 0

    def i(self) -> int:
        (v,) = struct.unpack_from("<i", self.data, self.off)
        self.off += 4
        return v

    def f(self) -> float:
        (v,) = struct.unpack_from("<f", self.data, self.off)
        self.off += 4
        return v

    def b(self) -> bool:
        return bool(self.i())

    def s(self) -> str:
        n = self.i()
        v = self.data[self.off : self.off + n].decode()
        self.off += n
        return v

    def vec_i(self) -> list[int]:
        n = self.i()
        out = list(struct.unpack_from(f"<{n}i", self.data, self.off))
        self.off += 4 * n
        return out

    def vec_f(self) -> list[float]:
        n = self.i()
        out = list(struct.unpack_from(f"<{n}f", self.data, self.off))
        self.off += 4 * n
        return out

    def vec_b(self) -> list[bool]:
        return [bool(v) for v in self.vec_i()]


class _Writer:
    """WriteBuffer mirror (buffer.h:84-133; int/float bodies as upstream —
    the fork stubs them for Cheerp, buffer.h:97-102)."""

    def __init__(self):
        self.buf = bytearray()

    def i(self, v) -> None:
        self.buf += struct.pack("<i", int(v))

    def f(self, v) -> None:
        self.buf += struct.pack("<f", float(v))

    def b(self, v) -> None:
        self.i(1 if v else 0)

    def s(self, v: str) -> None:
        raw = v.encode()
        self.i(len(raw))
        self.buf += raw

    def vec_i(self, vals) -> None:
        vals = [int(v) for v in vals]
        self.i(len(vals))
        self.buf += struct.pack(f"<{len(vals)}i", *vals)

    def vec_f(self, vals) -> None:
        vals = [float(v) for v in vals]
        self.i(len(vals))
        self.buf += struct.pack(f"<{len(vals)}f", *vals)

    def vec_b(self, vals) -> None:
        self.i(len(vals))
        for v in vals:
            self.b(v)

    def bytes(self) -> bytes:
        return bytes(self.buf)


def _read_randgen(r: _Reader):
    """RandGen::serialize: is_seeded + mt19937 stream text
    (randgen.cpp:100-114)."""
    is_seeded = bool(r.i())
    words = r.s().split()
    # libstdc++ mersenne_twister operator<<: 624 state words then _M_p
    assert len(words) == 625, f"unexpected mt19937 text length {len(words)}"
    mt = np.array([int(w) for w in words[:624]], np.uint32)
    pos = int(words[624])
    return rnglib.MTState(
        mt=jnp.asarray(mt),
        pos=jnp.asarray(pos, i32),
        is_seeded=jnp.asarray(is_seeded),
    )


def _write_randgen(w: _Writer, st) -> None:
    """Inverse of _read_randgen.  The TPU keeps pos < 624 (rng.normalize),
    which is a valid libstdc++ stream position — operator>> accepts any
    _M_p in [0, 624]."""
    w.i(1 if bool(np.asarray(st.is_seeded)) else 0)
    mt = np.asarray(st.mt, np.uint32)
    pos = int(np.asarray(st.pos))
    assert mt.shape == (624,) and 0 <= pos <= 624
    w.s(" ".join(str(int(x)) for x in mt) + " " + str(pos))


_FRESH_MT_TEXT = None


def _write_fresh_randgen(w: _Writer, seed: int) -> None:
    """A freshly seeded generator state, for streams the TPU build does not
    carry (asset_rand_gen: reseeded with fixed_asset_seed+type before every
    use, basic-abstract-game.cpp:103, so its position never matters)."""
    global _FRESH_MT_TEXT
    if _FRESH_MT_TEXT is None:
        from .host_mt import HostMT19937

        g = HostMT19937(seed)
        _FRESH_MT_TEXT = " ".join(str(int(x)) for x in g.mt) + " 624"
    w.i(1)
    w.s(_FRESH_MT_TEXT)


_ENTITY_FIELDS = [
    ("x", "f"), ("y", "f"), ("vx", "f"), ("vy", "f"), ("rx", "f"),
    ("ry", "f"), ("type", "i"), ("image_type", "i"), ("image_theme", "i"),
    ("render_z", "i"), ("will_erase", "b"), ("collides_with_entities", "b"),
    ("collision_margin", "f"), ("rotation", "f"), ("vrot", "f"),
    ("is_reflected", "b"), ("fire_time", "i"), ("spawn_time", "i"),
    ("life_time", "i"), ("expire_time", "i"), ("use_abs_coords", "b"),
    ("friction", "f"), ("smart_step", "b"), ("avoids_collisions", "b"),
    ("auto_erase", "b"), ("alpha", "f"), ("health", "f"), ("theta", "f"),
    ("grow_rate", "f"), ("alpha_decay", "f"), ("climber_spawn_x", "f"),
]


def _read_entity(r: _Reader) -> dict:
    out = {}
    for name, kind in _ENTITY_FIELDS:
        if kind == "f":
            out[name] = r.f()
        elif kind == "i":
            out[name] = r.i()
        else:
            out[name] = bool(r.i())
    return out


def _read_entities(r: _Reader) -> list[dict]:
    """BasicAbstractGame::read_entities (basic-abstract-game.cpp:1169)."""
    n = r.i()
    return [_read_entity(r) for _ in range(n)]


def _write_entities(w: _Writer, ents, idxs) -> None:
    """BasicAbstractGame::write_entities (basic-abstract-game.cpp:1161):
    count then each entity's 31 fields in entity.cpp:90-132 order.
    ``idxs`` selects and orders the SoA slots to write."""
    cols = {
        name: np.asarray(getattr(ents, name)) for name, _ in _ENTITY_FIELDS
    }
    w.i(len(idxs))
    for j in idxs:
        for name, kind in _ENTITY_FIELDS:
            v = cols[name][j]
            if kind == "f":
                w.f(v)
            elif kind == "i":
                w.i(v)
            else:
                w.b(bool(v))


def _entities_from_list(template_ents, ents_list, what="entities"):
    """Dense slots [0, n) from an ordered reference entity list."""
    cap = template_ents.cap
    n = len(ents_list)
    assert n <= cap, f"{what}: {n} entities > cap {cap}"
    upd = {}
    for fname, _ in _ENTITY_FIELDS:
        arr = getattr(template_ents, fname)
        vals = np.zeros((cap,), np.asarray(arr).dtype)
        for j, e in enumerate(ents_list):
            vals[j] = e[fname]
        upd[fname] = jnp.asarray(vals)
    return template_ents.replace(count=jnp.asarray(n, i32), **upd)


def _options_ints(game) -> list[int]:
    """The 12 GameOptions ints, serialize order (game.cpp:201-212)."""
    o = game.options
    return [
        int(o.paint_vel_info),
        int(o.use_generated_assets),
        int(o.use_monochrome_assets),
        int(o.restrict_themes),
        int(o.use_backgrounds),
        int(o.center_agent),
        int(o.debug_mode),
        int(o.distribution_mode),
        int(o.use_sequential_levels),
        int(getattr(o, "use_easy_jump", False)),
        int(getattr(o, "plain_assets", 0)),
        int(getattr(o, "physics_mode", 0)),
    ]


def import_reference_state(game, template, blob: bytes):
    """Parse one reference-serialized env into a fresh single-env state.

    ``template`` is any existing (unbatched) ``BasicState`` for this game —
    it provides the static shapes (grid padding, entity capacity) that the
    byte stream does not carry.
    """
    r = _Reader(blob)
    assert r.i() == SERIALIZE_VERSION
    name = r.s()
    assert name == game.name, (name, game.name)

    opts = [r.i() for _ in range(12)]  # GameOptions ints (game.cpp:201-212)
    del opts  # env construction already carries the options; draw-pattern
    # mismatches surface as replay divergence in the bridge test

    grid_step = r.i()
    assert bool(grid_step) == bool(game.grid_step)
    level_seed_low = r.i()
    level_seed_high = r.i()
    r.i()  # game_type
    r.i()  # game_n

    lsrg = _read_randgen(r)
    randg = _read_randgen(r)

    reward = r.f()
    done = bool(r.i())
    level_complete = bool(r.i())
    action = r.i()
    timeout = r.i()
    assert timeout == game.timeout, (timeout, game.timeout)
    current_level_seed = r.i()
    prev_level_seed = r.i()
    episodes_remaining = r.i()
    episode_done = bool(r.i())
    last_reward_timer = r.i()
    last_reward = r.f()
    r.i()  # default_action (static config)
    r.i()  # fixed_asset_seed (static config)
    cur_time = r.i()
    r.i()  # is_waiting_for_step (thread-pool bookkeeping; no TPU analogue)

    # ---- BasicAbstractGame (basic-abstract-game.cpp:1178-1225) ----------
    r.i()  # grid_size (redundant with grid header below)
    ents_list = _read_entities(r)
    r.i()  # use_procgen_background
    background_index = r.i()
    r.f()  # bg_tile_ratio (static config)
    bg_pct_x = r.f()
    r.f()  # char_dim (static config)
    last_move_action = r.i()
    move_action = r.i()
    special_action = r.i()
    mixrate = r.f()
    maxspeed = r.f()
    max_jump = r.f()
    action_vx = r.f()
    action_vy = r.f()
    action_vrot = r.f()
    r.f()  # center_x (derived per render)
    r.f()  # center_y
    r.i()  # random_agent_start (static config)
    r.i()  # has_useful_vel_info (static config)
    step_rand_int = r.i()
    _read_randgen(r)  # asset_rand_gen: assets are baked offline
    main_width = r.i()
    main_height = r.i()
    r.i()  # out_of_bounds_object (static config)
    for _ in range(6):
        r.f()  # unit, view_dim, x_off, y_off, visibility, min_visibility

    gw = r.i()
    gh = r.i()
    gdata = r.vec_i()
    assert len(gdata) == gw * gh

    # ---- assemble the pytree -------------------------------------------
    # The reference keeps decorative entities (trails/explosions/exhaust)
    # in the one entities vector; the TPU build stores them in the
    # render-only ``decor`` pool.  Split by the game's DECOR_TYPES —
    # relative order of the interactive entities is what collision
    # dispatch depends on, and both directions preserve it.
    s = template
    inter = [e for e in ents_list if e["type"] not in game.DECOR_TYPES]
    decs = [e for e in ents_list if e["type"] in game.DECOR_TYPES]
    ents = _entities_from_list(s.ents, inter)
    assert not decs or s.decor is not None, (
        f"{game.name}: reference state carries {len(decs)} decorative "
        "entities but the game declares DECOR_CAP=0"
    )
    decor = (
        _entities_from_list(s.decor, decs, what="decor")
        if s.decor is not None
        else None
    )

    grid_np = np.zeros(np.asarray(s.grid).shape, np.int32)
    grid_np[:gh, :gw] = np.asarray(gdata, np.int32).reshape(gh, gw)

    game.level_seed_low = level_seed_low
    game.level_seed_high = level_seed_high

    s = s.replace(
        level_seed_rand_gen=lsrg,
        rand_gen=rnglib.normalize(randg),
        current_level_seed=jnp.asarray(current_level_seed, i32),
        prev_level_seed=jnp.asarray(prev_level_seed, i32),
        episodes_remaining=jnp.asarray(episodes_remaining, i32),
        episode_done=jnp.asarray(episode_done),
        reward=jnp.asarray(reward, f32),
        done=jnp.asarray(done),
        level_complete=jnp.asarray(level_complete),
        action=jnp.asarray(action, i32),
        cur_time=jnp.asarray(cur_time, i32),
        last_reward_timer=jnp.asarray(last_reward_timer, i32),
        last_reward=jnp.asarray(last_reward, f32),
        total_reward=jnp.asarray(0.0, f32),  # HUD accumulator, TPU-only
        grid=jnp.asarray(grid_np),
        main_width=jnp.asarray(main_width, i32),
        main_height=jnp.asarray(main_height, i32),
        ents=ents,
        decor=decor,
        bg_pct_x=jnp.asarray(bg_pct_x, f32),
        background_index=jnp.asarray(background_index, i32),
        last_move_action=jnp.asarray(last_move_action, i32),
        move_action=jnp.asarray(move_action, i32),
        special_action=jnp.asarray(special_action, i32),
        mixrate=jnp.asarray(mixrate, f32),
        maxspeed=jnp.asarray(maxspeed, f32),
        max_jump=jnp.asarray(max_jump, f32),
        action_vx=jnp.asarray(action_vx, f32),
        action_vy=jnp.asarray(action_vy, f32),
        action_vrot=jnp.asarray(action_vrot, f32),
        step_rand_int=jnp.asarray(step_rand_int, i32),
        step_draws=jnp.asarray(0, i32),
    )

    # ---- per-game serialize tail ---------------------------------------
    imp, _exp = _GAME_TAILS[game.name]
    s = imp(game, s, r)
    assert r.off == len(blob), (r.off, len(blob))

    if game.static_prefix:
        from ..render.renderer import render_obs

        s = s.replace(frame=render_obs(game, s, 64, prefix_only=True))
    return s


def export_reference_state(game, s, env_idx: int = 0) -> bytes:
    """Serialize one (unbatched) TPU state to the reference byte layout —
    accepted by Game::deserialize (game.cpp:257-304) and replayable there.

    Camera scalars (center/unit/view_dim/x_off/y_off) are recomputed by the
    reference's prepare_for_drawing before any use, so placeholders are
    written for the derived ones and ``choose_center`` for the centers.
    """
    w = _Writer()
    w.i(SERIALIZE_VERSION)
    w.s(game.name)
    for v in _options_ints(game):
        w.i(v)

    w.i(1 if game.grid_step else 0)
    w.i(game.level_seed_low)
    w.i(game.level_seed_high)
    w.i(game.game_type)
    w.i(env_idx)  # game_n = env index in the batch (vecgame.cpp:365)

    _write_randgen(w, s.level_seed_rand_gen)
    _write_randgen(w, s.rand_gen)

    w.f(s.reward)
    w.i(1 if bool(np.asarray(s.done)) else 0)
    w.i(1 if bool(np.asarray(s.level_complete)) else 0)
    w.i(s.action)
    w.i(game.timeout)
    w.i(s.current_level_seed)
    w.i(s.prev_level_seed)
    w.i(s.episodes_remaining)
    w.b(np.asarray(s.episode_done))
    w.i(s.last_reward_timer)
    w.f(s.last_reward)
    w.i(game.default_action)
    w.i(np.int32(np.uint32(game.fixed_asset_seed & 0xFFFFFFFF)))
    w.i(s.cur_time)
    w.i(0)  # is_waiting_for_step

    # ---- BasicAbstractGame (basic-abstract-game.cpp:1178-1225) ----------
    mw = int(np.asarray(s.main_width))
    mh = int(np.asarray(s.main_height))
    w.i(mw * mh)  # grid_size
    count = int(np.asarray(s.ents.count))
    cols = {
        name: np.asarray(getattr(s.ents, name))
        for name, _ in _ENTITY_FIELDS
    }
    rows = [
        [cols[name][j] for name, _ in _ENTITY_FIELDS]
        for j in range(count)
    ]
    if s.decor is not None:
        dcols = {
            name: np.asarray(getattr(s.decor, name))
            for name, _ in _ENTITY_FIELDS
        }
        dcount = int(np.asarray(s.decor.count))
        rows += [
            [dcols[name][j] for name, _ in _ENTITY_FIELDS]
            for j in range(dcount)
        ]
    w.i(len(rows))
    for row in rows:
        for (name, kind), v in zip(_ENTITY_FIELDS, row):
            if kind == "f":
                w.f(v)
            elif kind == "i":
                w.i(v)
            else:
                w.b(bool(v))
    w.i(1 if game.options.use_generated_assets else 0)  # use_procgen_background
    w.i(s.background_index)
    w.f(game.bg_tile_ratio)
    w.f(s.bg_pct_x)
    w.f(game.char_dim)
    w.i(s.last_move_action)
    w.i(s.move_action)
    w.i(s.special_action)
    w.f(s.mixrate)
    w.f(s.maxspeed)
    w.f(s.max_jump)
    w.f(s.action_vx)
    w.f(s.action_vy)
    w.f(s.action_vrot)
    cx, cy = game.choose_center(s)
    w.f(np.asarray(cx))
    w.f(np.asarray(cy))
    w.b(game.random_agent_start)
    w.b(game.has_useful_vel_info)
    w.i(s.step_rand_int)
    _write_fresh_randgen(w, 0)  # asset_rand_gen (reseeded before use)
    w.i(mw)
    w.i(mh)
    w.i(game.out_of_bounds_object)
    for _ in range(4):
        w.f(0.0)  # unit, view_dim, x_off, y_off (prepare_for_drawing)
    w.f(np.asarray(s.visibility))
    w.f(game.min_visibility)

    # Grid::serialize (grid.h): w, h, then the flat vector
    w.i(mw)
    w.i(mh)
    grid = np.asarray(s.grid)[:mh, :mw]
    w.vec_i(grid.reshape(-1))

    _imp, exp = _GAME_TAILS[game.name]
    exp(game, s, w)
    return w.bytes()


# ---------------------------------------------------------------------------
# Per-game serialize tails.  Import parses + sets dynamic fields (statics
# are validated or skipped); export writes dynamic fields from the state
# and statics from the game config.  Reference cites are per game below.


def _gi(v) -> int:
    return int(np.asarray(v))


def _gf(v) -> float:
    return float(np.asarray(v))


# -- maze (maze.cpp serialize: maze_dim, world_dim) --------------------------
def _maze_imp(game, s, r):
    maze_dim = r.i()
    r.i()  # world_dim (static per mode)
    return s.replace(game=s.game.replace(maze_dim=jnp.asarray(maze_dim, i32)))


def _maze_exp(game, s, w):
    w.i(_gi(s.game.maze_dim))
    w.i(game.world_dim)


# -- miner (miner.cpp: diamonds_remaining) -----------------------------------
def _miner_imp(game, s, r):
    diamonds_remaining = r.i()
    return s.replace(
        game=s.game.replace(
            diamonds_remaining=jnp.asarray(diamonds_remaining, i32),
            died=jnp.asarray(False),
        )
    )


def _miner_exp(game, s, w):
    w.i(_gi(s.game.diamonds_remaining))


# -- bigfish (bigfish.cpp:108-112: fish_eaten, r_inc) ------------------------
def _bigfish_imp(game, s, r):
    fish_eaten = r.i()
    r_inc = r.f()
    return s.replace(
        game=s.game.replace(
            fish_eaten=jnp.asarray(fish_eaten, i32),
            r_inc=jnp.asarray(r_inc, f32),
        )
    )


def _bigfish_exp(game, s, w):
    w.i(_gi(s.game.fish_eaten))
    w.f(_gf(s.game.r_inc))


# -- caveflyer: no per-game tail (caveflyer.cpp has no serialize override) ---
def _none_imp(game, s, r):
    return s


def _none_exp(game, s, w):
    pass


# -- bossfight (bossfight.cpp:415-441) ---------------------------------------
def _bossfight_imp(game, s, r):
    g = s.game
    am = r.vec_i()
    attack_modes = np.zeros((5,), np.int32)
    attack_modes[: len(am)] = am
    last_fire_time = r.i()
    time_to_swap = r.i()
    invulnerable_duration = r.i()
    r.i()  # vulnerable_duration = 500 const (bossfight.cpp:223)
    num_rounds = r.i()
    round_num = r.i()
    round_health = r.i()
    r.i()  # boss_vel_timeout = 20 const (bossfight.cpp:29,218)
    curr_vel_timeout = r.i()
    attack_mode = r.i()
    player_laser_theme = r.i()
    boss_laser_theme = r.i()
    damaged_until_time = r.i()
    shields_are_up = r.b()
    r.b()  # barriers_moves_right (drawn, never read; bossfight.cpp:247)
    r.f()  # base_fire_prob = 0.1 const
    boss_bullet_vel = r.f()
    r.f()  # barrier_vel = 0.1 const
    r.f()  # barrier_spawn_prob = 0.025 const
    rand_pct = r.f()
    rand_fire_pct = r.f()
    rand_pct_x = r.f()
    rand_pct_y = r.f()
    return s.replace(
        game=g.replace(
            attack_modes=jnp.asarray(attack_modes),
            last_fire_time=jnp.asarray(last_fire_time, i32),
            time_to_swap=jnp.asarray(time_to_swap, i32),
            invulnerable_duration=jnp.asarray(invulnerable_duration, i32),
            num_rounds=jnp.asarray(num_rounds, i32),
            round_num=jnp.asarray(round_num, i32),
            round_health=jnp.asarray(round_health, i32),
            curr_vel_timeout=jnp.asarray(curr_vel_timeout, i32),
            attack_mode=jnp.asarray(attack_mode, i32),
            player_laser_theme=jnp.asarray(player_laser_theme, i32),
            boss_laser_theme=jnp.asarray(boss_laser_theme, i32),
            damaged_until_time=jnp.asarray(damaged_until_time, i32),
            shields_are_up=jnp.asarray(shields_are_up),
            boss_bullet_vel=jnp.asarray(boss_bullet_vel, f32),
            rand_pct=jnp.asarray(rand_pct, f32),
            rand_fire_pct=jnp.asarray(rand_fire_pct, f32),
            rand_pct_x=jnp.asarray(rand_pct_x, f32),
            rand_pct_y=jnp.asarray(rand_pct_y, f32),
        )
    )


def _bossfight_exp(game, s, w):
    g = s.game
    n_rounds = _gi(g.num_rounds)
    w.vec_i(np.asarray(g.attack_modes)[:n_rounds])
    w.i(_gi(g.last_fire_time))
    w.i(_gi(g.time_to_swap))
    w.i(_gi(g.invulnerable_duration))
    w.i(500)  # vulnerable_duration (bossfight.cpp:223)
    w.i(n_rounds)
    w.i(_gi(g.round_num))
    w.i(_gi(g.round_health))
    w.i(20)  # boss_vel_timeout (bossfight.cpp:29)
    w.i(_gi(g.curr_vel_timeout))
    w.i(_gi(g.attack_mode))
    w.i(_gi(g.player_laser_theme))
    w.i(_gi(g.boss_laser_theme))
    w.i(_gi(g.damaged_until_time))
    w.b(np.asarray(g.shields_are_up))
    w.b(False)  # barriers_moves_right: drawn but never read
    w.f(game.base_fire_prob)
    w.f(_gf(g.boss_bullet_vel))
    w.f(0.1)  # barrier_vel (bossfight.cpp:246)
    w.f(0.025)  # barrier_spawn_prob (bossfight.cpp:248)
    w.f(_gf(g.rand_pct))
    w.f(_gf(g.rand_fire_pct))
    w.f(_gf(g.rand_pct_x))
    w.f(_gf(g.rand_pct_y))


# -- chaser (chaser.cpp:388-398).  free_cells / is_space_vec are pure
# functions of the (wall-stable) grid: every non-MAZE_WALL cell, flat
# ascending (chaser.cpp:246-257) — the TPU build recomputes them on the
# fly, so import validates cheaply and export re-derives.
def _chaser_free_cells(game, s):
    from ..games.chaser import MAZE_WALL

    mw = _gi(s.main_width)
    mh = _gi(s.main_height)
    grid = np.asarray(s.grid)[:mh, :mw].reshape(-1)
    is_space = grid != MAZE_WALL
    return np.nonzero(is_space)[0], is_space


def _chaser_imp(game, s, r):
    free_cells = r.vec_i()
    is_space_vec = r.vec_b()
    r.i()  # eat_timeout = 75 const (chaser.cpp:43)
    r.i()  # egg_timeout = 50 const (chaser.cpp:44)
    eat_time = r.i()
    r.i()  # total_enemies (mode const, chaser.cpp:143-157)
    total_orbs = r.i()
    orbs_collected = r.i()
    maze_dim = r.i()
    assert maze_dim == game.maze_dim, (maze_dim, game.maze_dim)
    s = s.replace(
        game=s.game.replace(
            eat_time=jnp.asarray(eat_time, i32),
            total_orbs=jnp.asarray(total_orbs, i32),
            orbs_collected=jnp.asarray(orbs_collected, i32),
        )
    )
    want_free, want_space = _chaser_free_cells(game, s)
    assert list(want_free) == free_cells and list(want_space) == is_space_vec
    return s


def _chaser_exp(game, s, w):
    free_cells, is_space = _chaser_free_cells(game, s)
    w.vec_i(free_cells)
    w.vec_b(is_space)
    w.i(75)  # eat_timeout (chaser.cpp:43)
    w.i(50)  # egg_timeout (chaser.cpp:44)
    w.i(_gi(s.game.eat_time))
    w.i(game.total_enemies)
    w.i(_gi(s.game.total_orbs))
    w.i(_gi(s.game.orbs_collected))
    w.i(game.maze_dim)


# -- climber (climber.cpp:321-329) -------------------------------------------
def _climber_imp(game, s, r):
    has_support = r.b()
    facing_right = r.b()
    coin_quota = r.i()
    coins_collected = r.i()
    wall_theme = r.i()
    r.f()  # gravity = 0.2 const (climber.cpp:238)
    r.f()  # air_control = 0.15 const (climber.cpp:240)
    return s.replace(
        game=s.game.replace(
            has_support=jnp.asarray(has_support),
            facing_right=jnp.asarray(facing_right),
            coin_quota=jnp.asarray(coin_quota, i32),
            coins_collected=jnp.asarray(coins_collected, i32),
            wall_theme=jnp.asarray(wall_theme, i32),
        )
    )


def _climber_exp(game, s, w):
    g = s.game
    w.b(np.asarray(g.has_support))
    w.b(np.asarray(g.facing_right))
    w.i(_gi(g.coin_quota))
    w.i(_gi(g.coins_collected))
    w.i(_gi(g.wall_theme))
    w.f(0.2)  # gravity (climber.cpp:238)
    w.f(0.15)  # air_control (climber.cpp:240)


# -- coinrun (coinrun.cpp:506-514) -------------------------------------------
def _coinrun_imp(game, s, r):
    last_agent_y = r.f()
    wall_theme = r.i()
    has_support = r.b()
    facing_right = r.b()
    is_on_crate = r.b()
    r.f()  # gravity = 0.2 const (coinrun.cpp:419)
    r.f()  # air_control = 0.15 const (coinrun.cpp:421)
    return s.replace(
        game=s.game.replace(
            last_agent_y=jnp.asarray(last_agent_y, f32),
            wall_theme=jnp.asarray(wall_theme, i32),
            has_support=jnp.asarray(has_support),
            facing_right=jnp.asarray(facing_right),
            is_on_crate=jnp.asarray(is_on_crate),
        )
    )


def _coinrun_exp(game, s, w):
    g = s.game
    w.f(_gf(g.last_agent_y))
    w.i(_gi(g.wall_theme))
    w.b(np.asarray(g.has_support))
    w.b(np.asarray(g.facing_right))
    w.b(np.asarray(g.is_on_crate))
    w.f(0.2)
    w.f(0.15)


# -- dodgeball (dodgeball.cpp:448-456) ---------------------------------------
def _dodgeball_imp(game, s, r):
    r.f()  # min_dim   = agent_r*8 + .5 (dodgeball.cpp:316)
    r.f()  # hard_min_dim = 4*agent_r + 2*thickness + .5 (dodgeball.cpp:315)
    ball_vscale = r.f()
    ball_r = r.f()
    last_fire_time = r.i()
    num_enemies = r.i()
    r.i()  # enemy_fire_delay = 50 const (dodgeball.cpp:41)
    return s.replace(
        game=s.game.replace(
            ball_vscale=jnp.asarray(ball_vscale, f32),
            ball_r=jnp.asarray(ball_r, f32),
            last_fire_time=jnp.asarray(last_fire_time, i32),
            num_enemies=jnp.asarray(num_enemies, i32),
        )
    )


def _dodgeball_exp(game, s, w):
    g = s.game
    w.f(game.agent_r * 8 + 0.5)  # min_dim (dodgeball.cpp:316)
    w.f(4 * game.agent_r + 2 * game.thickness + 0.5)  # hard_min_dim (:315)
    w.f(_gf(g.ball_vscale))
    w.f(_gf(g.ball_r))
    w.i(_gi(g.last_fire_time))
    w.i(_gi(g.num_enemies))
    w.i(50)  # enemy_fire_delay (dodgeball.cpp:41)


# -- fruitbot (fruitbot.cpp:266-270) -----------------------------------------
def _fruitbot_imp(game, s, r):
    r.f()  # min_dim = 5 const (fruitbot.cpp:36)
    r.f()  # bullet_vscale = .5 const (fruitbot.cpp:37)
    last_fire_time = r.i()
    return s.replace(
        game=s.game.replace(
            last_fire_time=jnp.asarray(last_fire_time, i32)
        )
    )


def _fruitbot_exp(game, s, w):
    w.f(5.0)  # min_dim (fruitbot.cpp:36)
    w.f(game.bullet_vscale)
    w.i(_gi(s.game.last_fire_time))


# -- heist (heist.cpp:208-212) -----------------------------------------------
def _heist_imp(game, s, r):
    num_keys = r.i()
    world_dim = r.i()
    assert world_dim == game.world_dim, (world_dim, game.world_dim)
    has_keys = r.vec_b()
    assert len(has_keys) == num_keys
    hk = np.zeros((3,), bool)
    hk[:num_keys] = has_keys
    return s.replace(
        game=s.game.replace(
            num_keys=jnp.asarray(num_keys, i32),
            has_keys=jnp.asarray(hk),
        )
    )


def _heist_exp(game, s, w):
    g = s.game
    num_keys = _gi(g.num_keys)
    w.i(num_keys)
    w.i(game.world_dim)
    w.vec_b(np.asarray(g.has_keys)[:num_keys])


# -- jumper (jumper.cpp:440-448) ---------------------------------------------
def _jumper_imp(game, s, r):
    jump_count = r.i()
    jump_delta = r.i()
    jump_time = r.i()
    has_support = r.b()
    facing_right = r.b()
    wall_theme = r.i()
    r.f()  # compass_dim (mode const, jumper.cpp)
    return s.replace(
        game=s.game.replace(
            jump_count=jnp.asarray(jump_count, i32),
            jump_delta=jnp.asarray(jump_delta, i32),
            jump_time=jnp.asarray(jump_time, i32),
            has_support=jnp.asarray(has_support),
            facing_right=jnp.asarray(facing_right),
            wall_theme=jnp.asarray(wall_theme, i32),
        )
    )


def _jumper_exp(game, s, w):
    g = s.game
    w.i(_gi(g.jump_count))
    w.i(_gi(g.jump_delta))
    w.i(_gi(g.jump_time))
    w.b(np.asarray(g.has_support))
    w.b(np.asarray(g.facing_right))
    w.i(_gi(g.wall_theme))
    w.f(game.compass_dim)


# -- leaper (leaper.cpp serialize) -------------------------------------------
def _leaper_imp(game, s, r):
    g = s.game
    bottom_road_y = r.i()
    road_speeds = r.vec_f()
    bottom_water_y = r.i()
    water_speeds = r.vec_f()
    goal_y = r.i()
    cap = np.asarray(g.road_lane_speeds).shape[0]
    rs = np.zeros((cap,), np.float32)
    rs[: len(road_speeds)] = road_speeds
    ws = np.zeros((cap,), np.float32)
    ws[: len(water_speeds)] = water_speeds
    return s.replace(
        game=g.replace(
            bottom_road_y=jnp.asarray(bottom_road_y, i32),
            road_lane_speeds=jnp.asarray(rs),
            num_road_lanes=jnp.asarray(len(road_speeds), i32),
            bottom_water_y=jnp.asarray(bottom_water_y, i32),
            water_lane_speeds=jnp.asarray(ws),
            num_water_lanes=jnp.asarray(len(water_speeds), i32),
            goal_y=jnp.asarray(goal_y, i32),
        )
    )


def _leaper_exp(game, s, w):
    g = s.game
    w.i(_gi(g.bottom_road_y))
    w.vec_f(np.asarray(g.road_lane_speeds)[: _gi(g.num_road_lanes)])
    w.i(_gi(g.bottom_water_y))
    w.vec_f(np.asarray(g.water_lane_speeds)[: _gi(g.num_water_lanes)])
    w.i(_gi(g.goal_y))


# -- ninja (ninja.cpp:419-428) -----------------------------------------------
def _ninja_imp(game, s, r):
    has_support = r.b()
    facing_right = r.b()
    last_fire_time = r.i()
    wall_theme = r.i()
    r.f()  # gravity = 0.2 const (ninja.cpp:310)
    r.f()  # air_control = 0.15 const (ninja.cpp:312)
    jump_charge = r.f()
    r.f()  # jump_charge_inc (mode const, ninja.cpp)
    return s.replace(
        game=s.game.replace(
            has_support=jnp.asarray(has_support),
            facing_right=jnp.asarray(facing_right),
            last_fire_time=jnp.asarray(last_fire_time, i32),
            wall_theme=jnp.asarray(wall_theme, i32),
            jump_charge=jnp.asarray(jump_charge, f32),
        )
    )


def _ninja_exp(game, s, w):
    g = s.game
    w.b(np.asarray(g.has_support))
    w.b(np.asarray(g.facing_right))
    w.i(_gi(g.last_fire_time))
    w.i(_gi(g.wall_theme))
    w.f(0.2)
    w.f(0.15)
    w.f(_gf(g.jump_charge))
    w.f(game.jump_charge_inc)


# -- plunder (plunder.cpp:250-264) -------------------------------------------
def _plunder_imp(game, s, r):
    g = s.game
    last_fire_time = r.i()
    lane_directions = r.vec_b()
    target_bools = r.vec_b()
    image_permutation = r.vec_i()
    lane_vels = r.vec_f()
    r.i()  # num_lanes = 5 const (plunder.cpp:128)
    r.i()  # num_current_ship_types = 2 const (plunder.cpp:141)
    targets_hit = r.i()
    r.i()  # target_quota = 20 const (plunder.cpp:123)
    juice_left = r.f()
    r.f()  # r_scale (mode const, plunder.cpp:125)
    r.f()  # spawn_prob = 0.06 const (plunder.cpp:124)
    r.f()  # legend_r = 2 const (plunder.cpp:166)
    min_agent_x = r.f()
    ld = np.zeros(np.asarray(g.lane_directions).shape, bool)
    ld[: len(lane_directions)] = lane_directions
    tb = np.zeros(np.asarray(g.target_bools).shape, bool)
    tb[: len(target_bools)] = target_bools
    ip = np.zeros(np.asarray(g.image_permutation).shape, np.int32)
    ip[: len(image_permutation)] = image_permutation
    lv = np.zeros(np.asarray(g.lane_vels).shape, np.float32)
    lv[: len(lane_vels)] = lane_vels
    return s.replace(
        game=g.replace(
            last_fire_time=jnp.asarray(last_fire_time, i32),
            lane_directions=jnp.asarray(ld),
            target_bools=jnp.asarray(tb),
            image_permutation=jnp.asarray(ip),
            lane_vels=jnp.asarray(lv),
            targets_hit=jnp.asarray(targets_hit, i32),
            juice_left=jnp.asarray(juice_left, f32),
            min_agent_x=jnp.asarray(min_agent_x, f32),
        )
    )


def _plunder_exp(game, s, w):
    g = s.game
    w.i(_gi(g.last_fire_time))
    w.vec_b(np.asarray(g.lane_directions))
    w.vec_b(np.asarray(g.target_bools))
    w.vec_i(np.asarray(g.image_permutation))
    w.vec_f(np.asarray(g.lane_vels))
    w.i(5)  # num_lanes (plunder.cpp:128)
    w.i(2)  # num_current_ship_types (plunder.cpp:141)
    w.i(_gi(g.targets_hit))
    w.i(20)  # target_quota (plunder.cpp:123)
    w.f(_gf(g.juice_left))
    w.f(game.r_scale)
    w.f(0.06)  # spawn_prob (plunder.cpp:124)
    w.f(2.0)  # legend_r (plunder.cpp:166)
    w.f(_gf(g.min_agent_x))


# -- starpilot (starpilot.cpp:432-440): the remaining pre-rolled spawner
# list, stored back-to-front (descending spawn_time; the engine pops from
# the back, starpilot.cpp:401-403).  The TPU keeps the full list ascending
# plus a consumed-count cursor.
def _starpilot_imp(game, s, r):
    g = s.game
    sp_list = _read_entities(r)
    sp_list = sp_list[::-1]  # back-of-vector = next to spawn -> ascending
    spawners = _entities_from_list(g.spawners, sp_list)
    return s.replace(
        game=g.replace(
            spawners=spawners, spawn_cursor=jnp.asarray(0, i32)
        )
    )


def _starpilot_exp(game, s, w):
    g = s.game
    cur = _gi(g.spawn_cursor)
    count = _gi(g.spawners.count)
    idxs = list(range(count - 1, cur - 1, -1))  # descending spawn_time
    _write_entities(w, g.spawners, idxs)


_GAME_TAILS = {
    "maze": (_maze_imp, _maze_exp),
    "miner": (_miner_imp, _miner_exp),
    "bigfish": (_bigfish_imp, _bigfish_exp),
    "bossfight": (_bossfight_imp, _bossfight_exp),
    "caveflyer": (_none_imp, _none_exp),
    "chaser": (_chaser_imp, _chaser_exp),
    "climber": (_climber_imp, _climber_exp),
    "coinrun": (_coinrun_imp, _coinrun_exp),
    "dodgeball": (_dodgeball_imp, _dodgeball_exp),
    "fruitbot": (_fruitbot_imp, _fruitbot_exp),
    "heist": (_heist_imp, _heist_exp),
    "jumper": (_jumper_imp, _jumper_exp),
    "leaper": (_leaper_imp, _leaper_exp),
    "ninja": (_ninja_imp, _ninja_exp),
    "plunder": (_plunder_imp, _plunder_exp),
    "starpilot": (_starpilot_imp, _starpilot_exp),
}
