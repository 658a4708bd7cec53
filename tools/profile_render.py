"""Time the batched renderers (pallas vs XLA) on the real chip.

Usage: python tools/profile_render.py [num_envs] [game]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from procgen_tpu.core import lifecycle
from procgen_tpu.core.constants import EASY_MODE, INT32_MAX
from procgen_tpu.core.options import GameOptions
from procgen_tpu.games.registry import make_game
from procgen_tpu.render import pallas_kernel
from procgen_tpu.render.renderer import render_obs
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
    print(f"{name:28s} {dt*1e3:8.3f} ms   ({N/dt:,.0f} env-frames/s)")


def main():
    game = make_game(GAME, GameOptions(distribution_mode=EASY_MODE))
    game.level_seed_low, game.level_seed_high = 0, INT32_MAX
    master = HostMT19937(0)
    seeds = jnp.asarray([master.next_u32() for _ in range(N)], jnp.uint32)

    def init(seeds):
        st = jax.vmap(lambda sd: lifecycle.initial_state(game, sd))(seeds)
        return jax.vmap(lambda s: lifecycle.env_reset(game, s))(st)

    states = jax.jit(init)(seeds)
    jax.block_until_ready(states.grid)

    plan = pallas_kernel.get_plan(game, 64)
    print(
        f"game={GAME} N={N} NC={plan.NC} cap={plan.cap} dcap={plan.dcap} "
        f"n1g={plan.n1g} n1e={plan.n1e} sA={plan.sA} S={plan.S} "
        f"BH={plan.BH} BW={plan.BW} nb={plan.nb} nz={len(plan.z_levels)}"
    )

    if jax.default_backend() == "tpu":
        timeit(
            "pallas render",
            lambda st: pallas_kernel.render_obs_batch(game, st, 64, False),
            states,
        )
        timeit(
            "pallas prep only",
            lambda st: jax.vmap(lambda s: pallas_kernel._prep_one(plan, s))(st),
            states,
        )
    timeit(
        "xla render",
        lambda st: jax.vmap(lambda s: render_obs(game, s, 64))(st),
        states,
    )


if __name__ == "__main__":
    main()
