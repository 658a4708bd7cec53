"""procgen_tpu — a TPU-native Procgen.

A from-scratch JAX/XLA/Pallas re-design of the 16 procedurally generated
Procgen RL environments (reference: jordan-schneider/procgen-1).  The entire
vectorized environment — level generation, physics, rendering, auto-reset —
is a single jitted program over a batch of env states, sharded across TPU
chips with `jax.sharding`.
"""

__version__ = "0.1.0"

ENV_NAMES = [
    "bigfish",
    "bossfight",
    "caveflyer",
    "chaser",
    "climber",
    "coinrun",
    "dodgeball",
    "fruitbot",
    "heist",
    "jumper",
    "leaper",
    "maze",
    "miner",
    "ninja",
    "plunder",
    "starpilot",
]

# Python-only "exploration" distribution mode fixes one hard level
# (reference: procgen/env.py:52-61).
EXPLORATION_LEVEL_SEEDS = {
    "coinrun": 1949448038,
    "caveflyer": 1259048185,
    "leaper": 1318677581,
    "jumper": 1434825276,
    "maze": 158988835,
    "heist": 876640971,
    "climber": 1561126160,
    "ninja": 1123500215,
}

DISTRIBUTION_MODE_DICT = {
    "easy": 0,
    "hard": 1,
    "extreme": 2,
    "memory": 10,
    "exploration": 20,
}

from .env import ProcgenGym3Env, ProcgenEnv  # noqa: E402,F401
