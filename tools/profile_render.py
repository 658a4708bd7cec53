"""Renderer stage timing + XLA cost analysis on the real chip.

Usage: python tools/profile_render.py [num_envs] [game]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu.core import lifecycle
from procgen_tpu.core.constants import EASY_MODE, INT32_MAX
from procgen_tpu.core.options import GameOptions
from procgen_tpu.games.registry import make_game
from procgen_tpu.render import renderer as R
from procgen_tpu.render.atlas import get_atlases
from procgen_tpu.utils.host_mt import HostMT19937

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
GAME = sys.argv[2] if len(sys.argv) > 2 else "maze"
STEPS = 50


def timeit(name, fn, *args):
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = jitted(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / STEPS
    c = jitted.lower(*args).compile().cost_analysis()
    fl = c.get("flops", 0) / 1e9
    by = c.get("bytes accessed", 0) / 1e9
    print(
        f"{name:26s} {dt*1e3:8.3f} ms   {fl:8.1f} GF ({fl/dt/1e3:6.1f} TF/s)"
        f"   {by:7.2f} GB ({by/dt:6.0f} GB/s)"
    )


def main():
    game = make_game(GAME, GameOptions(distribution_mode=EASY_MODE))
    game.level_seed_low, game.level_seed_high = 0, INT32_MAX
    master = HostMT19937(0)
    seeds = jnp.asarray([master.next_u32() for _ in range(N)], jnp.uint32)

    def init(seeds):
        states = jax.vmap(lambda sd: lifecycle.initial_state(game, sd))(seeds)
        return jax.vmap(lambda s: lifecycle.env_reset(game, s))(states)

    states = jax.jit(init)(seeds)
    jax.block_until_ready(states.grid)
    res = 64

    grid_atlas, bg_atlas, ent_atlas = get_atlases(game, res)

    def full(states):
        return jax.vmap(lambda s: R.render_obs(game, s, res))(states)

    def bg_only(states):
        def one(s):
            sx = jnp.arange(res, dtype=jnp.float32) + 0.5
            sy = jnp.arange(res, dtype=jnp.float32) + 0.5
            w = s.main_width.astype(jnp.float32)
            h = s.main_height.astype(jnp.float32)
            vis = jnp.maximum(jnp.maximum(w, h), jnp.float32(game.min_visibility))
            unit = res / vis
            obs = jnp.zeros((res, res, 3), jnp.int32)
            if bg_atlas is not None:
                pix = jnp.asarray(bg_atlas.pixels)
                bi = jnp.clip(s.background_index, 0, pix.shape[0] - 1)
                img = jax.lax.dynamic_index_in_dim(pix, bi, keepdims=False)
                bg_ar = jnp.asarray(bg_atlas.aspects)[bi]
                obs = R._paint_background(
                    game, s, obs, sx, sy, res, unit, vis, img, bg_ar
                )
            return obs

        return jax.vmap(one)(states)

    def grid_only(states):
        def one(s):
            sx = jnp.arange(res, dtype=jnp.float32) + 0.5
            sy = jnp.arange(res, dtype=jnp.float32) + 0.5
            w = s.main_width.astype(jnp.float32)
            h = s.main_height.astype(jnp.float32)
            vis = jnp.maximum(jnp.maximum(w, h), jnp.float32(game.min_visibility))
            unit = res / vis
            cx = w * 0.5
            cy = h * 0.5
            x_off = unit * (cx - vis / 2)
            y_off = unit * (cy - vis / 2)
            wxs = (sx + x_off) / unit
            wys = vis - (sy - y_off) / unit
            obs = jnp.zeros((res, res, 3), jnp.int32)
            if grid_atlas is not None:
                obs, _ = R._paint_grid_tiles(
                    game, s, obs, res, unit, vis, x_off, y_off, wxs, wys,
                    grid_atlas,
                )
            return obs

        return jax.vmap(one)(states)

    def sprites_only(states):
        def one(s):
            sx = jnp.arange(res, dtype=jnp.float32) + 0.5
            sy = jnp.arange(res, dtype=jnp.float32) + 0.5
            w = s.main_width.astype(jnp.float32)
            h = s.main_height.astype(jnp.float32)
            vis = jnp.maximum(jnp.maximum(w, h), jnp.float32(game.min_visibility))
            unit = res / vis
            cx = w * 0.5
            cy = h * 0.5
            x_off = unit * (cx - vis / 2)
            y_off = unit * (cy - vis / 2)
            if ent_atlas is None:
                return jnp.zeros((3, res, res, 4), jnp.float32)
            return R._sprite_canvases(
                game, s, s.ents, game.should_draw_entity_mask(s), ent_atlas,
                res, unit, vis, x_off, y_off, sx, sy,
            )

        return jax.vmap(one)(states)

    print(f"game={GAME} N={N} res={res}")
    timeit("full render", full, states)
    timeit("background", bg_only, states)
    timeit("grid tiles", grid_only, states)
    timeit("entity sprites", sprites_only, states)


if __name__ == "__main__":
    main()
