"""Throughput demo: thousands of envs on one chip, obs kept on device."""

import time

import jax
import numpy as np

from procgen_tpu.core.constants import EASY_MODE
from procgen_tpu.core.options import GameOptions
from procgen_tpu.games.registry import make_game
from procgen_tpu.parallel.vec import JaxVecGame


def main(num_envs=2048, steps=200, env_name="maze"):
    game = make_game(env_name, GameOptions(distribution_mode=EASY_MODE))
    vec = JaxVecGame(num=num_envs, game=game, rand_seed=0)
    actions = np.random.RandomState(0).randint(0, 15, size=(steps, num_envs))
    t0 = time.perf_counter()
    for t in range(steps):
        vec.act(actions[t])
    obs, rew, first, info = vec.observe()
    jax.block_until_ready(obs)
    dt = time.perf_counter() - t0
    print(f"{env_name}: {steps * num_envs / dt:,.0f} env-steps/s")


if __name__ == "__main__":
    main()
