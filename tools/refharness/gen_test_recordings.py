"""Generate the checked-in conformance recordings for tests/.

64-step, 2-env recordings for all 16 games x easy+hard (+ extreme/memory
where supported), with latents for maze/miner.  Short enough to keep the
repo light; the full-length sweep lives in tools/refharness/sweep.py.
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, HERE)

from record import record  # noqa: E402
from sweep import EXTREME, GAMES, MEMORY  # noqa: E402

OUT = os.path.join(REPO, "tests", "data", "conformance")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    n = 0
    for game in GAMES:
        modes = ["easy", "hard"]
        if game in EXTREME:
            modes.append("extreme")
        if game in MEMORY:
            modes.append("memory")
        for mode in modes:
            rec = record(
                game, num=2, steps=64, rand_seed=23, distribution_mode=mode,
                latents=game in ("maze", "miner"),
            )
            path = os.path.join(OUT, f"{game}_{mode}.json")
            json.dump(rec, open(path, "w"))
            n += 1
    print(f"wrote {n} recordings to {OUT}")


if __name__ == "__main__":
    main()
