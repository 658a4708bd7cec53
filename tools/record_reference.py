"""Record reference trajectories for tools/conformance.py.

Run on a machine with the ORIGINAL procgen installed (pip install procgen or
the reference repo's native build):

    python tools/record_reference.py --env-name maze --rand-seed 23 \
        --num 2 --steps 128 >> recordings.jsonl
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env-name", required=True)
    ap.add_argument("--rand-seed", type=int, default=23)
    ap.add_argument("--num", type=int, default=2)
    ap.add_argument("--steps", type=int, default=128)
    ap.add_argument("--num-levels", type=int, default=0)
    ap.add_argument("--start-level", type=int, default=0)
    ap.add_argument("--distribution-mode", default="easy")
    ap.add_argument("--action-seed", type=int, default=0)
    args = ap.parse_args()

    from procgen import ProcgenGym3Env  # the reference implementation

    env = ProcgenGym3Env(
        num=args.num,
        env_name=args.env_name,
        rand_seed=args.rand_seed,
        num_levels=args.num_levels,
        start_level=args.start_level,
        distribution_mode=args.distribution_mode,
        num_threads=0,
    )
    rng = np.random.RandomState(args.action_seed)
    actions, rewards, firsts, seeds = [], [], [], []
    for _ in range(args.steps):
        ac = rng.randint(0, 15, size=args.num)
        env.act(ac)
        rew, obs, first = env.observe()
        info = env.get_info()
        actions.append(ac.tolist())
        rewards.append(np.asarray(rew).tolist())
        firsts.append(np.asarray(first).tolist())
        seeds.append([int(i["level_seed"]) for i in info])

    json.dump(
        {
            "env_name": args.env_name,
            "rand_seed": args.rand_seed,
            "num_levels": args.num_levels,
            "start_level": args.start_level,
            "distribution_mode": args.distribution_mode,
            "actions": actions,
            "rewards": rewards,
            "firsts": firsts,
            "level_seeds": seeds,
        },
        sys.stdout,
    )
    print()


if __name__ == "__main__":
    main()
