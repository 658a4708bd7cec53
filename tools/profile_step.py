"""Decompose step time on the real chip: logic / reset / render.

Usage: python tools/profile_step.py [num_envs] [game]
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
from procgen_tpu.parallel.vec import render_batch, reset_pending
from procgen_tpu.render.renderer import render_obs
from procgen_tpu.utils.host_mt import HostMT19937

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
GAME = sys.argv[2] if len(sys.argv) > 2 else "maze"
STEPS = 100
WARM = int(os.environ.get("PROCGEN_TPU_PROFILE_WARM", "200"))


def timeit(name, fn, *args, donate=False, n=STEPS):
    jitted = jax.jit(fn, donate_argnums=(0,) if donate else ())
    out = jitted(*args)
    jax.block_until_ready(out)
    # fresh copy each run if donating
    t0 = time.perf_counter()
    res = args
    for _ in range(n):
        out = jitted(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:34s} {dt*1e3:8.3f} ms/step   ({N/dt:,.0f} env-steps/s)")
    return out


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
    rng = np.random.RandomState(0)
    actions = jnp.asarray(rng.randint(0, 15, size=(N,)), jnp.int32)

    # reach steady state (entity/decor pools fill over a rollout — fresh
    # post-reset states understate render/dispatch cost substantially)
    @jax.jit
    def warm_step(states, acts):
        states, nr = jax.vmap(lambda s, a: lifecycle.env_step(game, s, a))(
            states, acts
        )
        return reset_pending(game, states, nr, max(1, min(N, 64)))

    for _ in range(WARM):
        states = warm_step(
            states, jnp.asarray(rng.randint(0, 15, size=(N,)), jnp.int32)
        )
    jax.block_until_ready(states.grid)

    def logic_only(states, actions):
        states, nr = jax.vmap(lambda s, a: lifecycle.env_step(game, s, a))(
            states, actions
        )
        return states, nr

    def reset_none(states):
        return reset_pending(
            game, states, jnp.zeros((N,), bool), max(1, min(N, 64))
        )

    def reset_one(states):
        pending = jnp.zeros((N,), bool).at[0].set(True)
        return reset_pending(game, states, pending, max(1, min(N, 64)))

    def render_only(states):
        return render_batch(game, states, 64)

    def full(states, actions):
        states, nr = jax.vmap(lambda s, a: lifecycle.env_step(game, s, a))(
            states, actions
        )
        states = reset_pending(game, states, nr, max(1, min(N, 64)))
        obs = render_batch(game, states, 64)
        return states, obs

    print(f"game={GAME} N={N}", flush=True)
    timeit("logic (env_step)", logic_only, states, actions)
    timeit("reset_pending (0 pending)", reset_none, states)
    timeit("reset_pending (1 pending)", reset_one, states)
    timeit("render 64x64 (product path)", render_only, states)
    timeit("full step", full, states, actions)


if __name__ == "__main__":
    main()
