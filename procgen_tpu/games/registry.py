"""Game registry (reference: procgen/src/game-registry.{h,cpp}).

Games self-register via the ``@register(name)`` decorator, mirroring
REGISTER_GAME; ``make_game(name, options)`` replaces
``globalGameRegistry->at(name)()``.
"""

from __future__ import annotations

import importlib

_REGISTRY: dict[str, type] = {}

# modules that register games on import (grown as games land)
_GAME_MODULES = [
    "maze",
    "bigfish",
    "coinrun",
    "miner",
    "leaper",
    "chaser",
    "heist",
    "climber",
    "fruitbot",
    "ninja",
    "jumper",
    "caveflyer",
    "dodgeball",
    "plunder",
    "bossfight",
    "starpilot",
]


def register(name: str):
    def deco(cls):
        cls.name = name
        _REGISTRY[name] = cls
        return cls

    return deco


def _ensure_loaded():
    for mod in _GAME_MODULES:
        try:
            importlib.import_module(f".{mod}", __package__)
        except ModuleNotFoundError:
            pass  # game not implemented yet


def available_games() -> list[str]:
    _ensure_loaded()
    return sorted(_REGISTRY)


def make_game(name: str, options):
    _ensure_loaded()
    if name not in _REGISTRY:
        raise KeyError(
            f"unknown env_name {name!r}; implemented: {sorted(_REGISTRY)}"
        )
    return _REGISTRY[name](options)
