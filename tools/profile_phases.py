"""Decompose game_step time by phase on the real chip.

Usage: python tools/profile_phases.py [num_envs] [game]

Times each stage of the per-step pipeline (basic-abstract-game.cpp:695-755
equivalents) in isolation so optimization targets the real hot spot.
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
from procgen_tpu.utils.host_mt import HostMT19937

N = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
GAME = sys.argv[2] if len(sys.argv) > 2 else "dodgeball"
PHASES = sys.argv[3].split(",") if len(sys.argv) > 3 else None  # None = all
STEPS = 20


def timeit(name, fn, *args):
    jitted = jax.jit(fn)
    out = jitted(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(STEPS):
        out = jitted(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / STEPS
    print(f"{name:40s} {dt*1e3:8.3f} ms/step")
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
    rs = np.random.RandomState(0)
    actions = jnp.asarray(rs.randint(0, 15, size=(N,)), jnp.int32)

    # advance a few steps so pools are populated realistically
    @jax.jit
    def warm(states, actions):
        states, _ = jax.vmap(lambda s, a: lifecycle.env_step(game, s, a))(
            states, actions
        )
        return states

    for i in range(10):
        states = warm(states, jnp.asarray(rs.randint(0, 15, size=(N,)), jnp.int32))
    jax.block_until_ready(states.grid)

    def with_draws(f):
        """Wrap a (s, d) -> (s, d) stage as a jit-able batch fn."""

        def run(states, actions):
            def one(s, a):
                s = s.replace(action=jnp.asarray(a, jnp.int32))
                d, nrg = rng.peek_block(
                    s.rand_gen, game.MAX_STEP_DRAWS, assume_normalized=True
                )
                s = s.replace(rand_gen=nrg)
                s, d = f(s, d)
                return s

            return jax.vmap(one)(states, actions)

        return run

    def head(s, d):
        d, sri = d.randint(0, 1000000)
        s = s.replace(step_rand_int=sri)
        move_action = s.action % 9
        s = game.set_action_xy(s, move_action)
        if not game.grid_step:
            s = game.update_agent_velocity(s)
        return s, d

    def smart_vec(s, d):
        if not game.ONLY_AGENT_SMART and game.SMART_VECTORIZABLE:
            s = game.step_smart_entities_vectorized(s)
        return s, d

    def smart_noscan(s, d):
        # ablation: smart movers without the non-agent entity scan
        saved = game.ENTITY_SCAN_NONAGENT
        game.ENTITY_SCAN_NONAGENT = False
        try:
            if not game.ONLY_AGENT_SMART and game.SMART_VECTORIZABLE:
                s = game.step_smart_entities_vectorized(s)
        finally:
            game.ENTITY_SCAN_NONAGENT = saved
        return s, d

    def ent_step(s, d):
        nonagent = jnp.arange(s.ents.cap) != 0
        s = s.replace(ents=s.ents.step_masked(s.ents.active & nonagent))
        if game.DECOR_CAP:
            s = s.replace(decor=s.decor.step_all())
        return s, d

    def agent_move(s, d):
        s = game.basic_step_object_agent(s)
        return s, d

    def dispatch(s, d):
        return game.dispatch_collisions(s, d)

    def erase(s, d):
        return game.erase_if_needed(s), d

    def full_game_step(s, d):
        return game.game_step(s, d)

    print(f"game={GAME} N={N}", flush=True)
    all_phases = {
        "head": ("head (action/velocity)", head),
        "smart": ("smart entities (vectorized)", smart_vec),
        "smart_noscan": ("smart entities (no ent scan)", smart_noscan),
        "entstep": ("Entity::step all", ent_step),
        "agent": ("agent move (basic_step_object)", agent_move),
        "dispatch": ("dispatch_collisions", dispatch),
        "erase": ("erase_if_needed (compact)", erase),
        "full": ("FULL game_step", full_game_step),
    }
    for key, (label, fn) in all_phases.items():
        if PHASES is None or key in PHASES:
            timeit(label, with_draws(fn), states, actions)
            sys.stdout.flush()


if __name__ == "__main__":
    main()
