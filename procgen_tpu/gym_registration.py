"""Gym registration (reference: procgen/gym_registration.py).

Registers ``procgen-<name>-v0`` ids with gym/gymnasium when available and
provides ``make_env`` returning a single-env Gym-style adapter over the
vectorized runtime (the reference wraps gym3's ToGymEnv; here the adapter is
self-contained).
"""

from __future__ import annotations

import numpy as np

from . import ENV_NAMES
from .env import ProcgenGym3Env


class ToGymEnv:
    """Single-env Gym-style view of a gym3 env (gym3.ToGymEnv equivalent)."""

    metadata = {"render.modes": ["rgb_array"]}

    def __init__(self, env: ProcgenGym3Env):
        self.env = env
        assert env.num == 1

    def reset(self, seed=None, options=None):
        _, obs, _ = self.env.observe()
        return obs["rgb"][0], {}

    def step(self, action):
        self.env.act(np.array([action], dtype=np.int32))
        rew, obs, first = self.env.observe()
        info = self.env.get_info()[0]
        # gym5-style: terminated on episode end, no truncation distinction
        return obs["rgb"][0], float(rew[0]), bool(first[0]), False, info

    def render(self):
        _, obs, _ = self.env.observe()
        return obs["rgb"][0]

    def close(self):
        pass


def make_env(render_mode=None, **kwargs):
    """gym_registration.py:6-18 equivalent (ExtractDictOb handled inline)."""
    kwargs.setdefault("num", 1)
    env = ProcgenGym3Env(**kwargs)
    return ToGymEnv(env)


def register_environments():
    """gym_registration.py:21-34: register procgen-<name>-v0 ids."""
    try:
        from gymnasium.envs.registration import register
    except ImportError:
        try:
            from gym.envs.registration import register
        except ImportError:
            return False
    for name in ENV_NAMES:
        try:
            register(
                id=f"procgen-{name}-v0",
                entry_point="procgen_tpu.gym_registration:make_env",
                kwargs={"env_name": name},
            )
        except Exception:
            pass  # already registered
    return True
