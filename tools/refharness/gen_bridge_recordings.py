"""Generate reference state-bridge recordings for ALL 16 games.

Each recording (tests/data/refstate/<game>_bridge.json) carries a 128-step
oracle trajectory (rewards/firsts/level seeds per step; latents for
maze/miner) plus the raw WriteBuffer state bytes of every env at
``bridge_step`` (game.cpp:196-304 layout).  tests/test_refstate_bridge.py
imports those bytes into the TPU runtime mid-rollout and replays the tail
bit-exactly — and, in the export direction, re-serializes the imported
state and has the oracle replay the same tail from the exported bytes
(--load-states) — proving the bridge both ways.

    python tools/refharness/build.py
    python tools/refharness/gen_bridge_recordings.py [game ...]
"""

from __future__ import annotations

import json
import os
import sys

import record

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
OUT = os.path.join(REPO, "tests", "data", "refstate")

ALL_GAMES = [
    "bigfish", "bossfight", "caveflyer", "chaser", "climber", "coinrun",
    "dodgeball", "fruitbot", "heist", "jumper", "leaper", "maze", "miner",
    "ninja", "plunder", "starpilot",
]

BRIDGE_STEP = 63
STEPS = 128
NUM = 2


def main() -> None:
    games = sys.argv[1:] or ALL_GAMES
    os.makedirs(OUT, exist_ok=True)
    for game in games:
        rec = record.record(
            game,
            NUM,
            STEPS,
            rand_seed=31,
            distribution_mode="easy",
            action_seed=7,
            latents=game in ("maze", "miner"),
            dump_states=True,
        )
        rec["bridge_step"] = BRIDGE_STEP
        rec["bridge_states"] = rec.pop("states")[BRIDGE_STEP]
        path = os.path.join(OUT, f"{game}_bridge.json")
        with open(path, "w") as f:
            json.dump(rec, f)
        print(f"{game}: {os.path.getsize(path)} bytes -> {path}")


if __name__ == "__main__":
    main()
