"""Time only the render path (one jit) on the real chip.

Usage: python tools/profile_render.py [num_envs] [game]
Combine with PROCGEN_TPU_KERNEL_ABLATE=bg,sprite,grid,cell to isolate
kernel passes (prep cost is what remains with everything ablated).
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
from procgen_tpu.parallel.vec import render_batch
from procgen_tpu.utils.host_mt import HostMT19937

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
GAME = sys.argv[2] if len(sys.argv) > 2 else "bossfight"
STEPS = 30


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

    # a few warm steps so entity pools look realistic
    rs = np.random.RandomState(0)

    @jax.jit
    def warm(states, actions):
        states, _ = jax.vmap(lambda s, a: lifecycle.env_step(game, s, a))(
            states, actions
        )
        return states

    for _ in range(int(os.environ.get("PROCGEN_TPU_PROFILE_WARM", "200"))):
        states = warm(states, jnp.asarray(rs.randint(0, 15, size=(N,)), jnp.int32))
    jax.block_until_ready(states.grid)

    if os.environ.get("PROCGEN_TPU_RENDER_PREP_ONLY", "0") == "1":
        from procgen_tpu.render import pallas_kernel as pk

        plan = pk.get_plan(game, 64)
        fn = jax.jit(lambda st: jax.vmap(lambda s: pk._prep_one(plan, s))(st))
    else:
        fn = jax.jit(lambda st: render_batch(game, st, 64))
    out = fn(states)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = fn(states)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / STEPS
    ab = os.environ.get("PROCGEN_TPU_KERNEL_ABLATE", "-")
    print(
        f"game={GAME} N={N} ablate={ab}: {dt*1e3:.3f} ms/render "
        f"({N/dt:,.0f} env-steps/s)",
        flush=True,
    )


if __name__ == "__main__":
    main()
