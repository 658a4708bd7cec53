"""Record reference trajectories from the logic-only oracle (refengine).

Drives .refbuild/refengine (built by tools/refharness/build.py) with the same
random-action stream tools/record_reference.py used, and writes the JSONL
format tools/conformance.py replays:

    python tools/refharness/build.py
    python tools/refharness/record.py --env-name maze --rand-seed 23 \
        --num 2 --steps 128 --distribution-mode easy >> recordings.jsonl

With --latents the record also carries per-step latent state (maze/miner
grids + agent/exit positions) for latent conformance.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
ENGINE = os.path.join(REPO, ".refbuild", "refengine")

DIST_MODES = {"easy": 0, "hard": 1, "extreme": 2, "memory": 10}


def record(
    env_name: str,
    num: int,
    steps: int,
    rand_seed: int,
    num_levels: int = 0,
    start_level: int = 0,
    distribution_mode: str = "easy",
    action_seed: int = 0,
    latents: bool = False,
    extra_flags: list[str] | None = None,
    options: dict | None = None,
    dump_states: bool = False,
) -> dict:
    """``options`` maps ProcgenGym3Env kwarg names (use_sequential_levels,
    use_generated_assets, restrict_themes, use_monochrome_assets,
    use_backgrounds, paint_vel_info) to bools; they are forwarded to the
    oracle as flags and stored in the recording so tools/conformance.py
    replays with the same configuration."""
    opt_flags = {
        "use_sequential_levels": "--use-sequential-levels",
        "use_generated_assets": "--use-generated-assets",
        "use_monochrome_assets": "--use-monochrome-assets",
        "restrict_themes": "--restrict-themes",
        "paint_vel_info": "--paint-vel-info",
        "use_backgrounds": None,  # inverted: --no-backgrounds
        "center_agent": None,
    }
    extra_flags = list(extra_flags or [])
    for k, v in (options or {}).items():
        assert k in opt_flags, f"unknown option {k}"
        if k == "use_backgrounds":
            if not v:
                extra_flags.append("--no-backgrounds")
        elif k == "center_agent":
            if v:
                extra_flags.append("--center-agent")
        elif v:
            extra_flags.append(opt_flags[k])
    cmd = [
        ENGINE,
        "--env-name", env_name,
        "--num", str(num),
        "--rand-seed", str(rand_seed),
        "--num-levels", str(num_levels),
        "--start-level", str(start_level),
        "--distribution-mode", str(DIST_MODES[distribution_mode]),
    ]
    if latents:
        cmd.append("--latents")
    if dump_states:
        cmd.append("--dump-states")
    cmd += extra_flags or []

    rng = np.random.RandomState(action_seed)
    actions = rng.randint(0, 15, size=(steps, num)).astype(np.int32)
    stdin = "\n".join(" ".join(str(a) for a in row) for row in actions) + "\n"

    proc = subprocess.run(
        cmd, input=stdin, capture_output=True, text=True, check=True
    )
    lines = [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]
    init, step_lines = lines[0]["init"], lines[1:]
    assert len(step_lines) == steps, (len(step_lines), steps)

    rec = {
        "env_name": env_name,
        "rand_seed": rand_seed,
        "num_levels": num_levels,
        "start_level": start_level,
        "distribution_mode": distribution_mode,
        "init_level_seeds": init["level_seeds"],
        "actions": actions.tolist(),
        "rewards": [l["rewards"] for l in step_lines],
        "firsts": [l["firsts"] for l in step_lines],
        "level_seeds": [l["level_seeds"] for l in step_lines],
        "prev_level_seeds": [l["prev_level_seeds"] for l in step_lines],
        "prev_level_completes": [l["prev_level_completes"] for l in step_lines],
    }
    if options:
        rec["options"] = dict(options)
    if dump_states:
        # per-step reference WriteBuffer hex blobs (game.cpp:196-304)
        rec["states"] = [l["states"] for l in step_lines]
    if latents:
        rec["init_latents"] = {
            k: init[k]
            for k in (
                "grid_widths", "grid_heights", "agent_xs", "agent_ys",
                "exit_xs", "exit_ys", "grids",
            )
        }
        rec["latents"] = [
            {
                k: l[k]
                for k in (
                    "grid_widths", "grid_heights", "agent_xs", "agent_ys",
                    "exit_xs", "exit_ys", "grids",
                )
            }
            for l in step_lines
        ]
    return rec


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-name", required=True)
    ap.add_argument("--rand-seed", type=int, default=23)
    ap.add_argument("--num", type=int, default=2)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--num-levels", type=int, default=0)
    ap.add_argument("--start-level", type=int, default=0)
    ap.add_argument("--distribution-mode", default="easy")
    ap.add_argument("--action-seed", type=int, default=0)
    ap.add_argument("--latents", action="store_true")
    args = ap.parse_args()

    rec = record(
        args.env_name,
        args.num,
        args.steps,
        args.rand_seed,
        args.num_levels,
        args.start_level,
        args.distribution_mode,
        args.action_seed,
        args.latents,
    )
    json.dump(rec, sys.stdout)
    print()


if __name__ == "__main__":
    main()
