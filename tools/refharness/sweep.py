"""Record + replay the full conformance sweep: all 16 games x modes.

    python tools/refharness/build.py
    python tools/refharness/sweep.py [--steps 128] [--num 2] [--games a,b]

Records every (game, mode) trajectory from the oracle into
.refbuild/recordings/, then replays each against procgen_tpu with exact
comparison, printing one PASS/FAIL line per config.  Runs on CPU devices
(compile cache shared with the test suite).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

GAMES = [
    "bigfish", "bossfight", "caveflyer", "chaser", "climber", "coinrun",
    "dodgeball", "fruitbot", "heist", "jumper", "leaper", "maze", "miner",
    "ninja", "plunder", "starpilot",
]
# game.cpp:76-86 mode validation
EXTREME = {"chaser", "dodgeball", "leaper", "starpilot"}
MEMORY = {"caveflyer", "dodgeball", "heist", "jumper", "maze", "miner"}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--num", type=int, default=2)
    ap.add_argument("--rand-seed", type=int, default=23)
    ap.add_argument("--games", default=",".join(GAMES))
    ap.add_argument("--modes", default="easy,hard")
    ap.add_argument("--record-only", action="store_true")
    ap.add_argument(
        "--tpu", action="store_true",
        help="replay on the real chip (conformance is logic-only; TPU "
        "compiles are much faster than the 2-core CPU)",
    )
    args = ap.parse_args()

    os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
    import jax

    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/procgen_tpu_xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from record import record  # tools/refharness/record.py

    rec_dir = os.path.join(REPO, ".refbuild", "recordings")
    os.makedirs(rec_dir, exist_ok=True)

    configs = []
    for game in args.games.split(","):
        for mode in args.modes.split(","):
            if mode == "extreme" and game not in EXTREME:
                continue
            if mode == "memory" and game not in MEMORY:
                continue
            configs.append((game, mode))

    records = {}
    for game, mode in configs:
        path = os.path.join(
            rec_dir, f"{game}_{mode}_s{args.rand_seed}_n{args.num}_t{args.steps}.json"
        )
        if os.path.exists(path):
            records[(game, mode)] = json.load(open(path))
            continue
        rec = record(
            game, args.num, args.steps, args.rand_seed,
            distribution_mode=mode, latents=game in ("maze", "miner"),
        )
        json.dump(rec, open(path, "w"))
        records[(game, mode)] = rec
        print(f"recorded {game} {mode}", flush=True)

    if args.record_only:
        return 0

    sys.path.insert(0, os.path.join(REPO, "tools"))
    import conformance

    n_ok = 0
    fails = []
    for (game, mode) in configs:
        r = conformance.replay(records[(game, mode)])
        if r["first_divergence"] is None:
            print(f"PASS {game} {mode}: {r['checked']} steps exact", flush=True)
            n_ok += 1
        else:
            print(
                f"FAIL {game} {mode}: "
                f"{json.dumps(r['first_divergence'])[:300]}",
                flush=True,
            )
            fails.append((game, mode))
    print(f"\n{n_ok}/{len(configs)} exact; failures: {fails}")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
