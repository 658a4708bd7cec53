"""Per-game RNG draw-budget guard (VERDICT weak #5).

``env_step`` peeks ``MAX_STEP_DRAWS`` mt19937 words per step
(core/lifecycle.py); if any game's ``game_step`` consumes more, the Draws
cursor walks past the block and the stream silently corrupts.  This suite
measures the worst case observed over stochastic rollouts (with auto-resets,
so every game's spawn bursts are exercised) and asserts the budget holds.
The debug-mode runtime check (parallel/vec.py act) guards production runs.
"""

import numpy as np
import pytest

from procgen_tpu import ENV_NAMES, ProcgenGym3Env

STEPS = 40
NUM = 2  # matches the conformance sweep's batch shape (compile-cache hit)


@pytest.mark.parametrize("env_name", ENV_NAMES)
def test_step_draws_within_budget(env_name):
    env = ProcgenGym3Env(
        num=NUM, env_name=env_name, rand_seed=19, distribution_mode="hard"
    )
    budget = env._vec.game.MAX_STEP_DRAWS
    rng = np.random.RandomState(7)
    worst = 0
    for t in range(STEPS):
        env.act(rng.randint(0, 15, size=(NUM,)).astype(np.int32))
        used = int(np.max(np.asarray(env._vec.states.step_draws)))
        worst = max(worst, used)
    assert worst <= budget, (
        f"{env_name}: observed {worst} draws/step > budget {budget}"
    )
