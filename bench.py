"""Benchmark: vectorized env-steps/s on the real chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference claims "thousands of steps per second" on a single
CPU core (README.md:16); we use 3,000 env-steps/s as the single-core C++
reference point (BASELINE.md) — vs_baseline is the per-chip speedup over
that.  The measured loop is the full production path: game logic + batched
auto-reset + 64x64 observation render, observations left on device (the
consumer is on-device RL, host transfer only at episode boundaries).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

NUM_ENVS = int(os.environ.get("BENCH_NUM_ENVS", 4096))
NUM_STEPS = int(os.environ.get("BENCH_NUM_STEPS", 300))
# steady-state warm-in, discarded: the first ~100 steps cover the synchronized
# first episodes + the reset pool's transient (a fresh-state window measures
# up to 5x off steady state)
WARM_STEPS = int(os.environ.get("BENCH_WARM_STEPS", 100))
GAME = os.environ.get("BENCH_GAME", "maze")
PROFILE_DIR = os.environ.get("BENCH_PROFILE_DIR", "")  # jax.profiler trace
BASELINE_STEPS_PER_SEC = 3000.0


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _make_env_fns

    init, step, seeds = _make_env_fns(NUM_ENVS, GAME)

    init_jit = jax.jit(init)
    step_jit = jax.jit(step, donate_argnums=(0,))

    carry = init_jit(seeds)
    jax.block_until_ready(carry[0].grid)

    rng = np.random.RandomState(0)
    total = WARM_STEPS + NUM_STEPS
    actions = jnp.asarray(rng.randint(0, 15, size=(total, NUM_ENVS)), jnp.int32)

    # compile + steady-state warm-in (discarded)
    for t in range(WARM_STEPS):
        carry, obs, rew, done = step_jit(carry, actions[t])
    jax.block_until_ready(obs)

    if PROFILE_DIR:
        jax.profiler.start_trace(PROFILE_DIR)
    t0 = time.perf_counter()
    for t in range(WARM_STEPS, total):
        carry, obs, rew, done = step_jit(carry, actions[t])
    jax.block_until_ready(obs)
    dt = time.perf_counter() - t0
    if PROFILE_DIR:
        jax.profiler.stop_trace()

    steps_per_sec = NUM_STEPS * NUM_ENVS / dt
    print(
        json.dumps(
            {
                "metric": "env_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 1),
                "unit": "env-steps/s",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
