"""Full-pipeline ablation timing on the real chip: where does a batched
step's wall-clock actually go?

Times cumulative stages of the production step (logic -> +pool-autoreset ->
+render -> full fused step) plus isolated components (render alone, RNG
peek/commit alone, env_reset alone) at steady state (warm-in discard).

Usage: python tools/profile_pipeline.py [num_envs] [game] [stage,...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu.core import lifecycle, rng
from procgen_tpu.core.constants import EASY_MODE, INT32_MAX
from procgen_tpu.core.options import GameOptions
from procgen_tpu.games.registry import make_game
from procgen_tpu.parallel.vec import (
    _tree_select,
    render_batch,
    replenish_pool,
    reset_pending,
    splice_pool,
)
from procgen_tpu.utils.host_mt import HostMT19937

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
GAME = sys.argv[2] if len(sys.argv) > 2 else "maze"
ONLY = sys.argv[3].split(",") if len(sys.argv) > 3 else None
WARM = 30
STEPS = 60
K = 64
M = 8


def main():
    game = make_game(GAME, GameOptions(distribution_mode=EASY_MODE))
    game.level_seed_low, game.level_seed_high = 0, INT32_MAX
    master = HostMT19937(0)
    seeds = jnp.asarray([master.next_u32() for _ in range(N)], jnp.uint32)

    @jax.jit
    def init(seeds):
        states = jax.vmap(lambda sd: lifecycle.initial_state(game, sd))(seeds)
        states = jax.vmap(lambda s: lifecycle.env_reset(game, s))(states)
        pool = jax.vmap(lambda s: lifecycle.env_reset(game, s))(states)
        return states, pool, jnp.ones((N,), bool), jnp.zeros((), jnp.int32)

    carry0 = init(seeds)
    jax.block_until_ready(carry0[0].grid)
    rs = np.random.RandomState(0)
    acts = jnp.asarray(rs.randint(0, 15, size=(WARM + STEPS + 1, N)), jnp.int32)

    def logic_only(carry, actions):
        states, pool, valid, t = carry
        states, needs = jax.vmap(lambda s, a: lifecycle.env_step(game, s, a))(
            states, actions
        )
        return (states, pool, valid, t + 1), states.reward

    def logic_pool(carry, actions):
        states, pool, valid, t = carry
        states, needs = jax.vmap(lambda s, a: lifecycle.env_step(game, s, a))(
            states, actions
        )
        use = needs & valid
        states = _tree_select(use, splice_pool(pool, states), states)
        valid = valid & ~needs
        states = reset_pending(game, states, needs & ~use, K)

        def rep(args):
            st, p, v = args
            return replenish_pool(game, st, p, v, K)

        pool, valid = jax.lax.cond(
            (t % M) == (M - 1), rep, lambda a: (a[1], a[2]),
            (states, pool, valid),
        )
        return (states, pool, valid, t + 1), states.reward

    def full(carry, actions):
        carry, _ = logic_pool(carry, actions)
        obs = render_batch(game, carry[0], 64)
        return carry, obs

    def render_only(carry, actions):
        return carry, render_batch(game, carry[0], 64)

    def peek_only(carry, actions):
        states = carry[0]

        def one(s, a):
            d, nrg = rng.peek_block(
                s.rand_gen, game.MAX_STEP_DRAWS, assume_normalized=True
            )
            d, x = d.randint(0, 1000000)
            return rng.commit(nrg, d), x

        rg, x = jax.vmap(one)(states, actions)
        return carry, (rg.pos, x)

    def reset_only(carry, actions):
        states = carry[0]
        sub = jax.tree_util.tree_map(lambda a: a[:K], states)
        new = jax.vmap(lambda s: lifecycle.env_reset(game, s))(sub)
        return carry, new.current_level_seed

    stages = {
        "logic": logic_only,
        "logic_pool": logic_pool,
        "full": full,
        "render": render_only,
        "peek": peek_only,
        "reset64": reset_only,
    }

    print(f"game={GAME} N={N} warm={WARM} steps={STEPS}", flush=True)
    for name, fn in stages.items():
        if ONLY and name not in ONLY:
            continue
        jfn = jax.jit(fn, donate_argnums=() if name != "full" else ())
        carry = carry0
        # compile + warm-in (advance real state so resets hit steady state)
        carry, out = jfn(carry, acts[0])
        jax.block_until_ready(out)
        for i in range(1, WARM):
            carry, out = jfn(carry, acts[i])
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(WARM, WARM + STEPS):
            carry, out = jfn(carry, acts[i])
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / STEPS
        print(f"{name:12s} {dt*1e3:8.3f} ms/step  ({N/dt:,.0f} env-steps/s)",
              flush=True)


if __name__ == "__main__":
    main()
