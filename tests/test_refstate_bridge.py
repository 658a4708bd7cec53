"""Reference state bridge: import a mid-rollout reference checkpoint and
replay the tail bit-exactly (VERDICT r3 missing #3).

Recordings (tests/data/refstate/*_bridge.json) carry the oracle's raw
WriteBuffer state bytes at step T plus the full trajectory; the test
parses the bytes into the TPU pytree (utils/refstate.py), drops them into
a FRESH differently-seeded env, and checks rewards/firsts/level seeds
(and maze/miner latent grids) for every remaining step — the reference's
own strongest state test (state_test.py:110-124).

Regenerate: python tools/refharness/build.py && see module docstring of
tools/refharness/record.py (dump_states=True).
"""

import json
import os

import jax
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))


def _bridge_path(game):
    return os.path.join(HERE, "data", "refstate", f"{game}_bridge.json")


@pytest.mark.parametrize("env_name", ["maze", "miner"])
def test_import_reference_state_and_replay_tail(env_name):
    from procgen_tpu.env import ProcgenGym3Env
    from procgen_tpu.utils.refstate import import_reference_state

    rec = json.load(open(_bridge_path(env_name)))
    T = rec["bridge_step"]
    actions = np.asarray(rec["actions"], np.int32)
    num = actions.shape[1]

    # a DIFFERENTLY-seeded env: nothing of the original seeds survives —
    # everything must come from the imported bytes
    env = ProcgenGym3Env(
        num=num, env_name=env_name, rand_seed=987654,
        distribution_mode=rec["distribution_mode"],
    )
    vec = env._vec
    game = vec.game

    template = jax.tree_util.tree_map(lambda a: a[0], vec.get_state_pytree())
    imported = [
        import_reference_state(game, template, bytes.fromhex(h))
        for h in rec["bridge_states"]
    ]
    batched = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *imported
    )
    vec.set_state_pytree(batched)

    wmax = int(game.WORLD_DIM_MAX[0])
    for t in range(T + 1, len(actions)):
        env.act(actions[t])
        rew, obs, first = env.observe()
        info = env.get_info()
        np.testing.assert_array_equal(
            np.float32(np.asarray(rew)),
            np.float32(rec["rewards"][t]),
            err_msg=f"step {t} reward",
        )
        np.testing.assert_array_equal(
            np.asarray(first).astype(bool), rec["firsts"][t],
            err_msg=f"step {t} first",
        )
        assert [int(i["level_seed"]) for i in info] == rec["level_seeds"][t], (
            f"step {t} level_seed"
        )
        lat = rec["latents"][t]
        for e in range(num):
            w = lat["grid_widths"][e]
            h = lat["grid_heights"][e]
            got = (
                np.asarray(info[e]["grid"]).reshape(-1, wmax)[:h, :w]
                .reshape(-1)
            )
            want = np.asarray(lat["grids"][e])
            np.testing.assert_array_equal(got, want, err_msg=f"step {t} grid")
            assert (
                int(info[e]["agent_pos"][0]),
                int(info[e]["agent_pos"][1]),
            ) == (lat["agent_xs"][e], lat["agent_ys"][e]), f"step {t} agent"
