"""Reference state bridge, both directions, all 16 games (VERDICT r4 #4).

Import: recordings (tests/data/refstate/*_bridge.json) carry the oracle's
raw WriteBuffer state bytes at step T plus the full trajectory; the test
parses the bytes into the TPU pytree (utils/refstate.py), drops them into
a FRESH differently-seeded env, and checks rewards/firsts/level seeds
(and maze/miner latent grids) for every remaining step — the reference's
own strongest state test (state_test.py:110-124).

Export: the imported state is re-serialized to reference bytes
(export_reference_state) and the ORACLE ENGINE replays the same tail from
those bytes (refengine --load-states, mirroring VecGame::set_state,
vecgame.cpp:495-505).  Runs whenever the oracle binary is built
(python tools/refharness/build.py); the committed proof log is
tests/data/refstate/export_replay.log.

A fast oracle-free round-trip check (import ∘ export == identity on the
pytree) always runs.

Regenerate recordings: python tools/refharness/build.py &&
python tools/refharness/gen_bridge_recordings.py
"""

import json
import os
import subprocess

import jax
import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
ENGINE = os.path.join(REPO, ".refbuild", "refengine")

ALL_GAMES = [
    "bigfish", "bossfight", "caveflyer", "chaser", "climber", "coinrun",
    "dodgeball", "fruitbot", "heist", "jumper", "leaper", "maze", "miner",
    "ninja", "plunder", "starpilot",
]

DIST_MODES = {"easy": 0, "hard": 1, "extreme": 2, "memory": 10}


def _bridge_path(game):
    return os.path.join(HERE, "data", "refstate", f"{game}_bridge.json")


def _load(env_name):
    rec = json.load(open(_bridge_path(env_name)))
    actions = np.asarray(rec["actions"], np.int32)
    return rec, rec["bridge_step"], actions


def _fresh_env(env_name, rec, num):
    from procgen_tpu.env import ProcgenGym3Env

    # a DIFFERENTLY-seeded env: nothing of the original seeds survives —
    # everything must come from the imported bytes
    return ProcgenGym3Env(
        num=num, env_name=env_name, rand_seed=987654,
        distribution_mode=rec["distribution_mode"],
    )


def _import_bridge(vec, rec):
    from procgen_tpu.utils.refstate import import_reference_state

    template = jax.tree_util.tree_map(lambda a: a[0], vec.get_state_pytree())
    return [
        import_reference_state(vec.game, template, bytes.fromhex(h))
        for h in rec["bridge_states"]
    ]


@pytest.mark.parametrize("env_name", ALL_GAMES)
def test_import_reference_state_and_replay_tail(env_name):
    rec, T, actions = _load(env_name)
    num = actions.shape[1]
    env = _fresh_env(env_name, rec, num)
    vec = env._vec
    game = vec.game

    imported = _import_bridge(vec, rec)
    batched = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *imported
    )
    vec.set_state_pytree(batched)

    # the whole tail in one fused device program (bit-equivalent to
    # per-step act/observe — tools/conformance.py uses the same path)
    _obs, rew, first, info = vec.rollout_full(actions[T + 1 :])
    rews = np.asarray(rew)
    firsts = np.asarray(first).astype(bool)
    infos = {k: np.asarray(v) for k, v in info.items()}

    has_latents = "latents" in rec
    wmax = int(game.WORLD_DIM_MAX[0]) if has_latents else 0
    for i, t in enumerate(range(T + 1, len(actions))):
        np.testing.assert_array_equal(
            np.float32(rews[i]),
            np.float32(rec["rewards"][t]),
            err_msg=f"step {t} reward",
        )
        np.testing.assert_array_equal(
            firsts[i], rec["firsts"][t], err_msg=f"step {t} first"
        )
        assert infos["level_seed"][i].tolist() == rec["level_seeds"][t], (
            f"step {t} level_seed"
        )
        if not has_latents:
            continue
        lat = rec["latents"][t]
        for e in range(num):
            w = lat["grid_widths"][e]
            h = lat["grid_heights"][e]
            got = (
                infos["grid"][i, e].reshape(-1, wmax)[:h, :w].reshape(-1)
            )
            want = np.asarray(lat["grids"][e])
            np.testing.assert_array_equal(got, want, err_msg=f"step {t} grid")
            assert (
                int(infos["agent_pos"][i, e, 0]),
                int(infos["agent_pos"][i, e, 1]),
            ) == (lat["agent_xs"][e], lat["agent_ys"][e]), f"step {t} agent"


@pytest.mark.parametrize("env_name", ALL_GAMES)
def test_export_roundtrips_through_import(env_name):
    """import(export(s)) == s leaf-for-leaf — the oracle-free half of the
    export proof (reader/writer layout agreement on every field)."""
    from procgen_tpu.utils.refstate import (
        export_reference_state,
        import_reference_state,
    )

    rec, T, actions = _load(env_name)
    env = _fresh_env(env_name, rec, actions.shape[1])
    vec = env._vec
    template = jax.tree_util.tree_map(lambda a: a[0], vec.get_state_pytree())
    for h in rec["bridge_states"]:
        s = import_reference_state(vec.game, template, bytes.fromhex(h))
        s2 = import_reference_state(
            vec.game, template, export_reference_state(vec.game, s)
        )
        for (path, a), b in zip(
            jax.tree_util.tree_leaves_with_path(s),
            jax.tree_util.tree_leaves(s2),
        ):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"{env_name} leaf {jax.tree_util.keystr(path)}",
            )


@pytest.mark.slow  # spawns the oracle per game; proof log committed at
# tests/data/refstate/export_replay.log (the fast import∘export
# round-trip above stays in the default gate)
@pytest.mark.skipif(
    not os.path.exists(ENGINE),
    reason="oracle engine not built (python tools/refharness/build.py)",
)
@pytest.mark.parametrize("env_name", ALL_GAMES)
def test_export_reference_state_oracle_replays_tail(env_name, tmp_path):
    """Exported bytes dropped into the REFERENCE engine replay the tail
    exactly (refengine --load-states = VecGame::set_state + act loop)."""
    from procgen_tpu.utils.refstate import (
        export_reference_state,
        import_reference_state,
    )

    rec, T, actions = _load(env_name)
    num = actions.shape[1]
    env = _fresh_env(env_name, rec, num)
    vec = env._vec
    template = jax.tree_util.tree_map(lambda a: a[0], vec.get_state_pytree())

    hexfile = tmp_path / "states.hex"
    with open(hexfile, "w") as f:
        for e, h in enumerate(rec["bridge_states"]):
            s = import_reference_state(vec.game, template, bytes.fromhex(h))
            f.write(export_reference_state(vec.game, s, e).hex() + "\n")

    cmd = [
        ENGINE, "--env-name", env_name, "--num", str(num),
        "--rand-seed", "424242",  # a different seed: bytes must carry all
        "--num-levels", str(rec["num_levels"]),
        "--start-level", str(rec["start_level"]),
        "--distribution-mode", str(DIST_MODES[rec["distribution_mode"]]),
        "--load-states", str(hexfile),
    ]
    stdin = "\n".join(
        " ".join(str(a) for a in row) for row in actions[T + 1 :]
    ) + "\n"
    p = subprocess.run(cmd, input=stdin, capture_output=True, text=True)
    assert p.returncode == 0, p.stderr[-800:]
    steps = [json.loads(l) for l in p.stdout.splitlines() if l.strip()][1:]
    assert len(steps) == len(actions) - (T + 1)
    for i, l in enumerate(steps):
        t = T + 1 + i
        assert l["rewards"] == rec["rewards"][t], f"{env_name} step {t} reward"
        assert l["firsts"] == rec["firsts"][t], f"{env_name} step {t} first"
        assert l["level_seeds"] == rec["level_seeds"][t], (
            f"{env_name} step {t} level_seed"
        )
