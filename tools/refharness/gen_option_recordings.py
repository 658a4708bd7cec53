"""Generate the option-matrix + adversarial conformance recordings.

VERDICT r3 missing #2 / weak #6: every checked-in recording used default
options, so RNG-draw-pattern changes from ``use_sequential_levels``
(game.cpp:117-126), ``use_generated_assets`` (basic-abstract-game.cpp:103),
``restrict_themes`` and ``use_monochrome_assets`` theme-draw sites had no
oracle coverage; and no recording was engineered to stress the documented
divergence-risk sites (>=2-blocker push chains, two-bullets-one-target
volleys).

Writes tests/data/conformance_opts/*.json, replayed by
tests/test_conformance_options.py.  Long/sequential recordings cross
episode boundaries (leaper/maze timeout 500) so the sequential-levels
reset path actually runs; the adversarial rows use many envs + hard mode +
long horizons so crate push chains (coinrun) and bullet volleys
(dodgeball, plunder) occur in bulk.
"""

import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, HERE)

from record import record  # noqa: E402

OUT = os.path.join(REPO, "tests", "data", "conformance_opts")

# (name, game, mode, num, steps, options)
ROWS = [
    # --- option matrix -----------------------------------------------------
    ("maze_seq", "maze", "easy", 2, 600, {"use_sequential_levels": True}),
    ("leaper_seq", "leaper", "easy", 2, 600, {"use_sequential_levels": True}),
    ("coinrun_seq", "coinrun", "easy", 2, 64, {"use_sequential_levels": True}),
    ("maze_genassets", "maze", "easy", 2, 64, {"use_generated_assets": True}),
    ("dodgeball_genassets", "dodgeball", "easy", 2, 64,
     {"use_generated_assets": True}),
    ("coinrun_restrict", "coinrun", "hard", 2, 64, {"restrict_themes": True}),
    ("heist_restrict", "heist", "easy", 2, 64, {"restrict_themes": True}),
    ("coinrun_mono", "coinrun", "easy", 2, 64,
     {"use_monochrome_assets": True}),
    ("chaser_mono", "chaser", "easy", 2, 64, {"use_monochrome_assets": True}),
    ("maze_nobg_vel", "maze", "easy", 2, 64,
     {"use_backgrounds": False, "paint_vel_info": True}),
    # --- adversarial: documented divergence-risk sites ---------------------
    # coinrun hard spawns crate stacks; 8 envs x 500 steps of random motion
    # drives the agent into multi-crate push chains (>=2 blockers,
    # basic-abstract-game.cpp:248-276) many times per recording
    ("coinrun_pushchain", "coinrun", "hard", 8, 500, {}),
    # dodgeball hard: dense enemies + player volleys -> two bullets landing
    # on one target within a step (dodgeball.cpp:408-443)
    ("dodgeball_volley", "dodgeball", "hard", 8, 500, {}),
    # plunder: timed shots at lane ships; volleys + wooden-panel blockers
    ("plunder_volley", "plunder", "easy", 8, 500, {}),
]


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    for name, game, mode, num, steps, options in ROWS:
        rec = record(
            game, num=num, steps=steps, rand_seed=29, distribution_mode=mode,
            latents=game == "maze", options=options or None,
        )
        path = os.path.join(OUT, f"{name}.json")
        json.dump(rec, open(path, "w"))
        print(f"wrote {path} ({os.path.getsize(path)//1024} KiB)")


if __name__ == "__main__":
    main()
