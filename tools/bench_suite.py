"""Per-game benchmark suite over the BASELINE.md target configs.

Measures the PRODUCT path (ProcgenGym3Env -> JaxVecGame jitted step) on the
real chip, obs resident on device (the consumer is on-device RL; the gym3
numpy copy is reported separately for one config as "api" mode).  Mirrors
the reference's de-facto perf suite (procgen/env_test.py:55-68: 1000-step
rollouts over every game) scaled to TPU batch sizes.

    python tools/bench_suite.py [--steps 200] [--out BENCH.md]

Writes one markdown table + one JSON line per config to the output file.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BASELINE_STEPS_PER_SEC = 3000.0  # single-core C++ reference point (BASELINE.md)

ALL_GAMES = [
    "bigfish", "bossfight", "caveflyer", "chaser", "climber", "coinrun",
    "dodgeball", "fruitbot", "heist", "jumper", "leaper", "maze", "miner",
    "ninja", "plunder", "starpilot",
]

# (label, env_name, num_envs, distribution_mode, extra kwargs)
CONFIGS = (
    [(g, g, 4096, "easy", {}) for g in ALL_GAMES]
    + [
        ("coinrun@64 (reference cfg)", "coinrun", 64, "easy", {}),
        ("maze+heist joint", "maze,heist", 4096, "easy", {}),
        ("bigfish+starpilot joint", "bigfish,starpilot", 4096, "easy", {}),
        ("bossfight+chaser+dodgeball", "bossfight,chaser,dodgeball", 4098, "easy", {}),
        ("16-game joint suite", ",".join(ALL_GAMES), 4096, "easy", {}),
        ("maze@8192 + latents", "maze", 8192, "easy", {}),
        ("maze@4096 hard", "maze", 4096, "hard", {}),
    ]
)


def bench_config(label, env_name, num, mode, kwargs, steps):
    from procgen_tpu.env import ProcgenGym3Env

    import jax

    env = ProcgenGym3Env(
        num=num, env_name=env_name, rand_seed=0, distribution_mode=mode,
        **kwargs,
    )
    rng = np.random.RandomState(0)
    actions = rng.randint(0, 15, size=(steps, num)).astype(np.int32)

    vec = env._vec

    def device_observe():
        # obs stay on device; only tiny scalars sync (observe() returns the
        # obs rendered inside the fused step program)
        if hasattr(vec, "subs"):
            return [s.observe()[0] for s in vec.subs]
        return vec.observe()[0]

    # warmup / compile
    env.act(actions[0])
    obs = device_observe()
    jax.block_until_ready(obs)

    t0 = time.perf_counter()
    for t in range(1, steps):
        env.act(actions[t])
        obs = device_observe()
    jax.block_until_ready(obs)
    dt = time.perf_counter() - t0
    sps = (steps - 1) * num / dt
    return {
        "config": label,
        "env_name": env_name,
        "num_envs": num,
        "mode": mode,
        "env_steps_per_sec": round(sps, 1),
        "vs_baseline": round(sps / BASELINE_STEPS_PER_SEC, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", default="BENCH.md")
    ap.add_argument("--configs", default="")
    args = ap.parse_args()

    import jax

    rows = []
    sel = args.configs.split(",") if args.configs else None
    for label, env_name, num, mode, kwargs in CONFIGS:
        if sel and not any(s in label for s in sel):
            continue
        try:
            r = bench_config(label, env_name, num, mode, kwargs, args.steps)
        except Exception as e:  # record the failure, keep sweeping
            r = {"config": label, "error": str(e)[:200]}
        rows.append(r)
        print(json.dumps(r), flush=True)

    dev = jax.devices()[0].device_kind
    with open(args.out, "w") as f:
        f.write(
            "# BENCH — per-game suite on one chip\n\n"
            f"Hardware: {dev}.  Product path (ProcgenGym3Env), obs on device,\n"
            f"{args.steps}-step random rollouts.  Baseline: 3,000 env-steps/s\n"
            "single-core C++ (BASELINE.md).\n\n"
            "| Config | num_envs | mode | env-steps/s | vs baseline |\n"
            "|---|---|---|---|---|\n"
        )
        for r in rows:
            if "error" in r:
                f.write(f"| {r['config']} | — | — | ERROR: {r['error'][:80]} | — |\n")
            else:
                f.write(
                    f"| {r['config']} | {r['num_envs']} | {r['mode']} | "
                    f"{r['env_steps_per_sec']:,.0f} | {r['vs_baseline']:.1f}x |\n"
                )
        f.write("\n```jsonl\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write("```\n")
    print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
