"""Trajectory-conformance harness vs the C++ reference (SURVEY §7 step 8).

Replays recorded reference trajectories against procgen_tpu and reports the
first divergence per (game, seed).  Comparisons are EXACT — the north-star
bar is bit-equality of rewards / dones / level seeds / latent grids, not
tolerance (reference determinism bar: procgen/env_test.py:33-52,
procgen/state_test.py:71-124).

Recordings come from the in-container logic-only oracle:

    python tools/refharness/build.py
    python tools/refharness/record.py --env-name maze ... >> recordings.jsonl
    python tools/conformance.py recordings.jsonl
"""

from __future__ import annotations

import json
import sys

import numpy as np


def _exact(got, want) -> bool:
    got = np.asarray(got)
    want = np.asarray(want)
    if got.shape != want.shape:
        return False
    if got.dtype.kind == "f" or want.dtype.kind == "f":
        # float32 exactness: the oracle prints %.9g which round-trips float32
        return bool(np.all(np.float32(got) == np.float32(want)))
    return bool(np.all(got == want))


def _latent_views(info_list, game):
    """Extract (w, h, grid_wxh, agent, exit) per env from our info dicts."""
    wmax = int(game.WORLD_DIM_MAX[0])
    out = []
    for i in info_list:
        w, h = int(i["grid_size"][0]), int(i["grid_size"][1])
        grid = np.asarray(i["grid"]).reshape(-1, wmax)[:h, :w].reshape(-1)
        out.append((w, h, grid, np.asarray(i["agent_pos"]), np.asarray(i["exit_pos"])))
    return out


def replay(rec: dict, check_latents: bool = True) -> dict:
    sys.path.insert(0, ".")
    from procgen_tpu import ProcgenGym3Env

    actions = np.asarray(rec["actions"], np.int32)
    num = actions.shape[1]
    env = ProcgenGym3Env(
        num=num,
        env_name=rec["env_name"],
        rand_seed=rec["rand_seed"],
        num_levels=rec.get("num_levels", 0),
        start_level=rec.get("start_level", 0),
        distribution_mode=rec.get("distribution_mode", "hard"),
        **rec.get("options", {}),  # option-matrix recordings
    )
    result = {"steps": len(actions), "first_divergence": None, "checked": 0}

    def diverge(step, field, got, want):
        result["first_divergence"] = {
            "step": step,
            "field": field,
            "got": np.asarray(got).tolist(),
            "want": np.asarray(want).tolist(),
        }
        return result

    has_latents = check_latents and "latents" in rec
    game = env._vec.game if hasattr(env._vec, "game") else None

    # initial state (post-construction reset, pre-act)
    if "init_level_seeds" in rec:
        seeds = [i["level_seed"] for i in env.get_info()]
        if not _exact(seeds, rec["init_level_seeds"]):
            return diverge(-1, "init_level_seed", seeds, rec["init_level_seeds"])

    def check_latent_step(t, want):
        got = _latent_views(env.get_info(), game)
        for e, (w, h, grid, agent, exit_pos) in enumerate(got):
            if w != want["grid_widths"][e] or h != want["grid_heights"][e]:
                return ("latent_grid_size", (w, h),
                        (want["grid_widths"][e], want["grid_heights"][e]))
            if not _exact(grid, np.asarray(want["grids"][e])):
                wgrid = np.asarray(want["grids"][e])
                bad = np.nonzero(grid != wgrid)[0][:8]
                return (
                    "latent_grid",
                    [(int(i), int(grid[i])) for i in bad],
                    [(int(i), int(wgrid[i])) for i in bad],
                )
            if not _exact(agent, [want["agent_xs"][e], want["agent_ys"][e]]):
                return ("latent_agent_pos", agent,
                        [want["agent_xs"][e], want["agent_ys"][e]])
            if rec["env_name"] == "miner" and not _exact(
                exit_pos, [want["exit_xs"][e], want["exit_ys"][e]]
            ):
                return ("latent_exit_pos", exit_pos,
                        [want["exit_xs"][e], want["exit_ys"][e]])
        return None

    if has_latents and "init_latents" in rec:
        bad = check_latent_step(-1, rec["init_latents"])
        if bad:
            return diverge(-1, *bad)

    for t in range(len(actions)):
        env.act(actions[t])
        rew, obs, first = env.observe()
        infos = env.get_info()
        seeds = [i["level_seed"] for i in infos]
        prev_seeds = [i["prev_level_seed"] for i in infos]
        prev_complete = [bool(i["prev_level_complete"]) for i in infos]
        for name, got, want in (
            ("reward", rew, rec["rewards"][t]),
            ("first", first, rec["firsts"][t]),
            ("level_seed", seeds, rec["level_seeds"][t]),
            ("prev_level_seed", prev_seeds, rec.get("prev_level_seeds", [None])[t]
             if "prev_level_seeds" in rec else prev_seeds),
            ("prev_level_complete", prev_complete,
             rec["prev_level_completes"][t]
             if "prev_level_completes" in rec else prev_complete),
        ):
            if not _exact(got, want):
                return diverge(t, name, got, want)
        if has_latents:
            bad = check_latent_step(t, rec["latents"][t])
            if bad:
                return diverge(t, *bad)
        result["checked"] = t + 1
    return result


def main(path: str):
    ok = 0
    bad = 0
    for line in open(path):
        rec = json.loads(line)
        r = replay(rec)
        tag = (
            f"{rec['env_name']} seed={rec['rand_seed']} "
            f"mode={rec.get('distribution_mode', 'hard')}"
        )
        if r["first_divergence"] is None:
            print(f"PASS {tag}: {r['checked']} steps exact")
            ok += 1
        else:
            print(f"FAIL {tag}: {json.dumps(r['first_divergence'])[:300]}")
            bad += 1
    print(f"{ok} exact, {bad} diverged")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
