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


FAST_GAMES = ["maze", "coinrun", "caveflyer", "dodgeball", "miner", "starpilot"]


@pytest.mark.parametrize("env_name", FAST_GAMES)
def test_state_roundtrip_and_replay(env_name):
    _check_state_roundtrip(env_name)


@pytest.mark.slow
@pytest.mark.parametrize("env_name", [g for g in GAMES if g not in FAST_GAMES])
def test_state_roundtrip_and_replay_rest(env_name):
    _check_state_roundtrip(env_name)


def _check_state_roundtrip(env_name):
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


# ---------------------------------------------------------------------------
# Torture suite (reference procgen/state_test.py:65-124): long random
# rollouts verifying (a) replay determinism, (b) get_state every step doesn't
# perturb, (c) states bit-equal across runs, (d) save+RESTORE every step
# changes nothing, (e) restoring mid-rollout into a differently-seeded env
# reproduces the remainder exactly.
# ---------------------------------------------------------------------------


def _signature(env):
    rew, _, first = env.observe()
    info = env.get_info()
    return (
        rew.tobytes(),
        first.tobytes(),
        tuple(int(i["level_seed"]) for i in info),
    )


def _torture(env_name, steps, save_every, seed=3):
    rng = np.random.RandomState(seed)
    actions = rng.randint(0, 15, size=(steps, NUM_ENVS)).astype(np.int32)
    restore_at = (3 * steps) // 4

    # run 1: plain rollout, recording signatures + periodic states
    env = make_env(0, env_name)
    sigs1, states1 = [], []
    for t in range(steps):
        env.act(actions[t])
        sigs1.append(_signature(env))
        if t % save_every == 0:
            states1.append(env.callmethod("get_state"))
    obs_end1 = env.observe()[1]["rgb"]

    # run 2: same rollout but get_state AND set_state(own state) every
    # save_every steps — must not perturb anything (d), and the saved
    # states must be bit-equal to run 1's (c)
    env2 = make_env(0, env_name)
    states2 = []
    for t in range(steps):
        env2.act(actions[t])
        assert sigs1[t] == _signature(env2), f"{env_name} diverged at {t}"
        if t % save_every == 0:
            st = env2.callmethod("get_state")
            env2.callmethod("set_state", st)
            states2.append(st)
    for s1, s2 in zip(states1, states2):
        assert s1 == s2, f"{env_name}: states differ between runs"
    np.testing.assert_array_equal(obs_end1, env2.observe()[1]["rgb"])

    # run 3: restore the state saved nearest restore_at into a
    # differently-seeded env; the tail must replay exactly (e)
    k = restore_at // save_every
    t0 = k * save_every
    env3 = make_env(999, env_name)
    env3.act(np.full((NUM_ENVS,), 4, np.int32))  # desynchronize
    env3.callmethod("set_state", states1[k])
    for t in range(t0 + 1, steps):
        env3.act(actions[t])
        assert sigs1[t] == _signature(env3), (
            f"{env_name}: cross-seed restore diverged at {t}"
        )
    np.testing.assert_array_equal(obs_end1, env3.observe()[1]["rgb"])


@pytest.mark.parametrize("env_name", ["maze", "coinrun", "starpilot"])
def test_state_torture_fast(env_name):
    _torture(env_name, steps=256, save_every=8)


@pytest.mark.slow
@pytest.mark.parametrize("env_name", GAMES)
def test_state_torture_10k(env_name):
    _torture(env_name, steps=10_000, save_every=1)
