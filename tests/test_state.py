"""State save/restore tests (reference procgen/state_test.py).

The reference's torture test: (a) replay determinism, (b) get_state doesn't
perturb, (c) restoring a state into a differently-seeded env reproduces the
rest of the rollout exactly (state_test.py:71-124).
"""

import numpy as np
import pytest

from procgen_tpu import ProcgenGym3Env
from procgen_tpu.games.registry import available_games

GAMES = available_games()
NUM_ENVS = 2
NUM_STEPS = 64


def make_env(rand_seed, env_name):
    return ProcgenGym3Env(
        num=NUM_ENVS,
        env_name=env_name,
        rand_seed=rand_seed,
        use_monochrome_assets=True,
        distribution_mode="easy",
    )


@pytest.mark.parametrize("env_name", GAMES)
def test_state_roundtrip_and_replay(env_name):
    rng = np.random.RandomState(42)
    actions = rng.randint(0, 15, size=(NUM_STEPS, NUM_ENVS))

    env = make_env(0, env_name)
    mid = NUM_STEPS // 2
    obs_tail1 = []
    state_mid = None
    for t in range(NUM_STEPS):
        if t == mid:
            state_mid = env.callmethod("get_state")
            # get_state must not perturb the env
            s2 = env.callmethod("get_state")
            assert state_mid == s2
        env.act(actions[t])
        _, obs, _ = env.observe()
        if t >= mid:
            obs_tail1.append(obs["rgb"])

    # restore into a *differently seeded* env and replay the tail
    env2 = make_env(999, env_name)
    env2.act(actions[0] * 0 + 4)  # advance once so internal buffers differ
    env2.callmethod("set_state", state_mid)
    obs_tail2 = []
    for t in range(mid, NUM_STEPS):
        env2.act(actions[t])
        _, obs, _ = env2.observe()
        obs_tail2.append(obs["rgb"])

    np.testing.assert_array_equal(np.stack(obs_tail1), np.stack(obs_tail2))
