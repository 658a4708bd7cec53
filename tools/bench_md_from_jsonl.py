"""Assemble BENCH.md from bench_suite JSONL lines (stdout capture).

Fallback for interrupted suite runs: bench_suite.py only writes the
markdown at the very end, but every finished config has already printed
its JSON row.  Usage:

    python tools/bench_md_from_jsonl.py /tmp/bench_full.out [BENCH.md]
"""

from __future__ import annotations

import json
import sys

BASELINE = 3000.0


def main(src: str, out: str = "BENCH.md") -> None:
    rows = []
    for line in open(src):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            r = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "config" in r:
            rows.append(r)

    with open(out, "w") as f:
        f.write(
            "# BENCH — per-game suite on one chip\n\n"
            "Hardware: TPU v5 lite (1 chip).  Product path (ProcgenGym3Env),"
            " obs on device.\nSteady-state protocol: 100-step warm-in"
            " discarded, then median of 3 windows\n(min/max reported)."
            "  Baseline: 3,000 env-steps/s single-core C++ (BASELINE.md).\n\n"
            "| Config | num_envs | mode | env-steps/s (median) | min..max |"
            " vs baseline |\n|---|---|---|---|---|---|\n"
        )
        for r in rows:
            if "error" in r:
                f.write(
                    f"| {r['config']} | — | — | ERROR: {r['error'][:80]} |"
                    " — | — |\n"
                )
                continue
            f.write(
                f"| {r['config']} | {r['num_envs']} | {r['mode']} |"
                f" {r['env_steps_per_sec']:,.0f} |"
                f" {r['min_sps']:,.0f}..{r['max_sps']:,.0f} |"
                f" {r['vs_baseline']}x |\n"
            )
        f.write("\n```jsonl\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
        f.write("```\n")
    print(f"wrote {out} with {len(rows)} rows")


if __name__ == "__main__":
    main(sys.argv[1], *(sys.argv[2:] or []))
