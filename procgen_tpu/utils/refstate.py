"""Import reference-format serialized states (the WriteBuffer byte layout).

The reference checkpoints an env as a raw little-endian byte stream
(game.cpp:196-304 -> basic-abstract-game.cpp:1178-1280 -> entity.cpp:90-177
-> per-game tails), with both mt19937 streams stored as libstdc++ textual
state (randgen.cpp:100-114: 624 words + position).  This module parses
that layout into a ``BasicState`` pytree so a state produced by the
reference engine can be dropped into the TPU runtime mid-episode and
replayed bit-exactly (tests/test_refstate_bridge.py).

Supported games: every BasicAbstractGame layout field is generic; the
per-game serialize tail is implemented for the games whose extension
state the TPU build tracks explicitly (maze, miner).  Fields the TPU
design derives on the fly (camera scalars, unit/view_dim/x_off/y_off,
asset RNG) are validated where cheap and otherwise skipped; fields that
exist only TPU-side (total_reward HUD accumulator, reset_count,
step_draws, the static render-prefix frame) are reconstructed.
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
    n_ents = r.i()
    ents_list = [_read_entity(r) for _ in range(n_ents)]
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
    s = template
    cap = s.ents.cap
    assert n_ents <= cap, f"{n_ents} entities > ENT_CAP {cap}"
    ents = s.ents
    upd = {}
    for fname, kind in _ENTITY_FIELDS:
        arr = getattr(ents, fname)
        vals = np.zeros((cap,), np.asarray(arr).dtype)
        for j, e in enumerate(ents_list):
            vals[j] = e[fname]
        upd[fname] = jnp.asarray(vals)
    ents = ents.replace(count=jnp.asarray(n_ents, i32), **upd)

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
    s = _import_game_tail(game, s, r)
    assert r.off == len(blob), (r.off, len(blob))

    if game.static_prefix:
        from ..render.renderer import render_obs

        s = s.replace(frame=render_obs(game, s, 64, prefix_only=True))
    return s


def _import_game_tail(game, s, r: _Reader):
    if game.name == "maze":
        maze_dim = r.i()
        r.i()  # world_dim (static per mode)
        return s.replace(
            game=s.game.replace(maze_dim=jnp.asarray(maze_dim, i32))
        )
    if game.name == "miner":
        diamonds_remaining = r.i()
        return s.replace(
            game=s.game.replace(
                diamonds_remaining=jnp.asarray(diamonds_remaining, i32),
                died=jnp.asarray(False),
            )
        )
    raise NotImplementedError(
        f"reference state import not implemented for {game.name}"
    )
