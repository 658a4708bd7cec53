"""Trajectory-conformance harness vs the C++ reference (SURVEY §7 step 8).

Replays recorded reference trajectories against procgen_tpu and reports the
first divergence per (game, seed) in rewards / dones / level seeds / latent
grids.  Reference recordings are JSONL, one rollout per line:

    {"env_name": "maze", "rand_seed": 23, "num_levels": 0, "start_level": 0,
     "distribution_mode": "easy", "actions": [[...t0 actions...], ...],
     "rewards": [[...], ...], "firsts": [[...], ...], "level_seeds": [[...], ...]}

Produce recordings with tools/record_reference.py on a machine where the
reference's native build works, then run:

    python tools/conformance.py recordings.jsonl
"""

from __future__ import annotations

import json
import sys

import numpy as np


def replay(rec: dict) -> dict:
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
    )
    result = {"steps": len(actions), "first_divergence": None, "checked": 0}
    for t in range(len(actions)):
        env.act(actions[t])
        rew, obs, first = env.observe()
        infos = env.get_info()
        seeds = [i["level_seed"] for i in infos]
        for name, got, want in (
            ("reward", rew.tolist(), rec["rewards"][t]),
            ("first", first.tolist(), rec["firsts"][t]),
            ("level_seed", seeds, rec["level_seeds"][t]),
        ):
            if not np.allclose(got, want):
                result["first_divergence"] = {
                    "step": t,
                    "field": name,
                    "got": got,
                    "want": want,
                }
                return result
        result["checked"] = t + 1
    return result


def main(path: str):
    ok = 0
    bad = 0
    for line in open(path):
        rec = json.loads(line)
        r = replay(rec)
        tag = f"{rec['env_name']} seed={rec['rand_seed']}"
        if r["first_divergence"] is None:
            print(f"PASS {tag}: {r['checked']} steps exact")
            ok += 1
        else:
            print(f"FAIL {tag}: {json.dumps(r['first_divergence'])[:200]}")
            bad += 1
    print(f"{ok} exact, {bad} diverged")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1]))
