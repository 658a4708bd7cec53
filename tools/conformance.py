"""Trajectory-conformance harness vs the C++ reference (SURVEY §7 step 8).

Replays recorded reference trajectories against procgen_tpu and reports the
first divergence per (game, seed).  Comparisons are EXACT — the north-star
bar is bit-equality of rewards / dones / level seeds / latent grids, not
tolerance (reference determinism bar: procgen/env_test.py:33-52,
procgen/state_test.py:71-124).

The whole recording replays in ONE device program
(JaxVecGame.rollout_full — a lax.scan over the fused production step,
bit-equivalent to per-step act/observe) and the per-step exactness checks
run host-side on the stacked outputs; the old per-step dispatch loop cost
~0.3 s/step of host overhead on CPU and made the default gate unrunnable
(VERDICT r4 weak #3).  Joint-game (comma env_name) recordings keep the
per-step path.

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


def _info_now(vec):
    """Info fields read straight off the resident state batch (no render
    program — the initial checks only need seeds + latents)."""
    import jax

    if not hasattr(vec, "states"):
        # joint vec: interleave the sub-batches' level seeds (env n runs
        # game n % k at sub-index n // k); joint recordings carry no
        # latents, so level_seed is all the init check needs
        seeds = np.stack(
            [np.asarray(sub.states.current_level_seed) for sub in vec.subs],
            axis=1,
        )
        return {"level_seed": seeds.reshape(-1)}

    states = vec.states
    info = {"level_seed": np.asarray(states.current_level_seed)}
    game = getattr(vec, "game", None)
    if game is not None and hasattr(game, "latent_info"):
        lat = jax.jit(jax.vmap(game.latent_info))(states)
        info.update({k: np.asarray(v) for k, v in lat.items()})
    return info


def replay(rec: dict, check_latents: bool = True) -> dict:
    sys.path.insert(0, ".")
    from procgen_tpu import ProcgenGym3Env

    actions = np.asarray(rec["actions"], np.int32)
    T, num = actions.shape
    mode = rec.get("distribution_mode", "hard")
    level_kwargs = (
        {}  # exploration derives num_levels/start_level itself (env.py)
        if mode == "exploration"
        else {
            "num_levels": rec.get("num_levels", 0),
            "start_level": rec.get("start_level", 0),
        }
    )
    env = ProcgenGym3Env(
        num=num,
        env_name=rec["env_name"],
        rand_seed=rec["rand_seed"],
        distribution_mode=mode,
        **level_kwargs,
        **rec.get("options", {}),  # option-matrix recordings
    )
    result = {"steps": T, "first_divergence": None, "checked": 0}

    def diverge(step, field, got, want):
        result["first_divergence"] = {
            "step": step,
            "field": field,
            "got": np.asarray(got).tolist(),
            "want": np.asarray(want).tolist(),
        }
        return result

    vec = env._vec
    game = getattr(vec, "game", None)
    has_latents = check_latents and "latents" in rec and game is not None
    wmax = int(game.WORLD_DIM_MAX[0]) if game is not None else 0

    def check_latents_at(t, lat_arrays, want):
        """lat_arrays: dict of [num, ...] arrays for one step."""
        for e in range(num):
            w = int(lat_arrays["grid_size"][e][0])
            h = int(lat_arrays["grid_size"][e][1])
            if w != want["grid_widths"][e] or h != want["grid_heights"][e]:
                return ("latent_grid_size", (w, h),
                        (want["grid_widths"][e], want["grid_heights"][e]))
            grid = (
                np.asarray(lat_arrays["grid"][e]).reshape(-1, wmax)[:h, :w]
                .reshape(-1)
            )
            wgrid = np.asarray(want["grids"][e])
            if not _exact(grid, wgrid):
                bad = np.nonzero(grid != wgrid)[0][:8]
                return (
                    "latent_grid",
                    [(int(i), int(grid[i])) for i in bad],
                    [(int(i), int(wgrid[i])) for i in bad],
                )
            agent = lat_arrays["agent_pos"][e]
            if not _exact(agent, [want["agent_xs"][e], want["agent_ys"][e]]):
                return ("latent_agent_pos", agent,
                        [want["agent_xs"][e], want["agent_ys"][e]])
            if rec["env_name"] == "miner" and not _exact(
                lat_arrays["exit_pos"][e],
                [want["exit_xs"][e], want["exit_ys"][e]],
            ):
                return ("latent_exit_pos", lat_arrays["exit_pos"][e],
                        [want["exit_xs"][e], want["exit_ys"][e]])
        return None

    # initial state (post-construction reset, pre-act)
    if "init_level_seeds" in rec or (has_latents and "init_latents" in rec):
        init_info = _info_now(vec)
        if "init_level_seeds" in rec:
            seeds = init_info["level_seed"]
            if not _exact(seeds, rec["init_level_seeds"]):
                return diverge(
                    -1, "init_level_seed", seeds, rec["init_level_seeds"]
                )
        if has_latents and "init_latents" in rec:
            bad = check_latents_at(-1, init_info, rec["init_latents"])
            if bad:
                return diverge(-1, *bad)

    # ---- the whole trajectory in one fused device program --------------
    if hasattr(vec, "rollout_full"):
        _obs, rew, first, info = vec.rollout_full(actions)
        rews = np.asarray(rew)
        firsts = np.asarray(first)
        infos = {k: np.asarray(v) for k, v in info.items()}
    else:  # joint-game path: per-step stepping, same stacked arrays
        rews_l, firsts_l, infos_l = [], [], []
        for t in range(T):
            env.act(actions[t])
            rew, _obs, first = env.observe()
            rews_l.append(np.asarray(rew))
            firsts_l.append(np.asarray(first))
            per_env = env.get_info()
            keys = per_env[0].keys()
            infos_l.append(
                {k: np.stack([np.asarray(i[k]) for i in per_env])
                 for k in keys}
            )
        rews = np.stack(rews_l)
        firsts = np.stack(firsts_l)
        infos = {
            k: np.stack([i[k] for i in infos_l]) for k in infos_l[0]
        }

    for t in range(T):
        checks = [
            ("reward", rews[t], rec["rewards"][t]),
            ("first", firsts[t].astype(bool), rec["firsts"][t]),
            ("level_seed", infos["level_seed"][t], rec["level_seeds"][t]),
        ]
        if "prev_level_seeds" in rec:
            checks.append(
                ("prev_level_seed", infos["prev_level_seed"][t],
                 rec["prev_level_seeds"][t])
            )
        if "prev_level_completes" in rec:
            checks.append(
                ("prev_level_complete",
                 infos["prev_level_complete"][t].astype(bool),
                 rec["prev_level_completes"][t])
            )
        for name, got, want in checks:
            if not _exact(got, want):
                return diverge(t, name, got, want)
        if has_latents:
            lat_t = {
                k: infos[k][t]
                for k in ("grid_size", "grid", "agent_pos", "exit_pos")
                if k in infos
            }
            bad = check_latents_at(t, lat_t, rec["latents"][t])
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
