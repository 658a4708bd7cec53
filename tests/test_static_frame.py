"""Static render-prefix cache correctness (render/renderer.py).

Games with ``static_prefix`` compose the bg+grid+colored-cell layers once
per level into ``state.frame`` and render only the sprite suffix per step.
This is sound ONLY if those layers are truly immutable within an episode
as rendered — asserted here empirically: render-from-frame must equal a
full fresh render at EVERY step of a stochastic rollout with auto-resets.
Any game that flips STATIC_RENDER_PREFIX on must appear in STATIC_GAMES.
"""

import jax
import numpy as np
import pytest

from procgen_tpu.core.constants import EASY_MODE, MEMORY_MODE
from procgen_tpu.core.options import GameOptions
from procgen_tpu.games.registry import available_games, make_game
from procgen_tpu.render.renderer import render_obs

STATIC_GAMES = ["bigfish", "bossfight", "dodgeball", "leaper", "maze", "plunder"]


def test_static_game_list_is_exhaustive():
    flagged = []
    for name in available_games():
        g = make_game(name, GameOptions(distribution_mode=EASY_MODE))
        if g.static_prefix:
            flagged.append(name)
    assert sorted(flagged) == sorted(STATIC_GAMES)


@pytest.mark.parametrize("env_name", STATIC_GAMES)
@pytest.mark.parametrize("mode", ["easy", "hard"])
def test_frame_matches_full_render(env_name, mode):
    from procgen_tpu.env import ProcgenGym3Env

    env = ProcgenGym3Env(
        num=2, env_name=env_name, rand_seed=9, distribution_mode=mode
    )
    vec = env._vec
    game = vec.game
    assert game.static_prefix

    full = jax.jit(
        jax.vmap(lambda s: render_obs(game, s.replace(frame=None), 64))
    )
    via_frame = jax.jit(
        jax.vmap(lambda s: render_obs(game, s, 64, base=s.frame))
    )

    rng = np.random.RandomState(0)
    for t in range(50):
        env.act(rng.randint(0, 15, size=(env.num,)).astype(np.int32))
        a = np.asarray(via_frame(vec.states))
        b = np.asarray(full(vec.states))
        np.testing.assert_array_equal(a, b, err_msg=f"step {t}")


def test_memory_mode_disables_static_prefix():
    """maze memory mode forces center_agent (maze.cpp:68) — the camera
    moves, so the prefix cache must disengage."""
    g = make_game("maze", GameOptions(distribution_mode=MEMORY_MODE))
    assert not g.static_prefix
