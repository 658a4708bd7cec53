"""2-process ``jax.distributed`` equivalence (SURVEY §5 comm backend).

The reference decorrelates seeds per MPI rank (reference procgen
env.py:73-82) and otherwise runs one independent VecGame per process.
The TPU design instead runs ONE logical env batch sharded over a global
mesh spanning processes (parallel/sharding.py init_multihost).  This
test spawns two coordinated CPU processes (4 virtual devices each → an
8-device global mesh), steps a sharded maze batch in lockstep, and
asserts each process's addressable shards are bit-identical to a
single-process rollout of the same batch.  Also pins the per-process
seed decorrelation fold used when no rand_seed is given.
"""

import json
import os
import socket
import subprocess
import sys
import tempfile

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

NUM_ENVS = 8
STEPS = 6
GAME = "maze"

_WORKER = r"""
import json, os, sys

nproc = int(sys.argv[1])
pid = int(sys.argv[2])
coord = sys.argv[3]
out_path = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
).strip()
# the persistent compile cache is keyed per-topology; sharing it across the
# coordinated processes is fine
import jax

jax.config.update("jax_platforms", "cpu")
if nproc > 1:
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, {repo!r})
from procgen_tpu.core import lifecycle
from procgen_tpu.core.constants import EASY_MODE, INT32_MAX
from procgen_tpu.core.options import GameOptions
from procgen_tpu.games.registry import make_game
from procgen_tpu.parallel.sharding import env_sharding, make_mesh
from procgen_tpu.parallel.vec import reset_pending
from procgen_tpu.render.renderer import render_obs
from procgen_tpu.utils.host_mt import HostMT19937

NUM_ENVS = {num_envs}
STEPS = {steps}

game = make_game(
    {game!r},
    GameOptions(distribution_mode=EASY_MODE, use_monochrome_assets=True),
)
game.level_seed_low, game.level_seed_high = 0, INT32_MAX
master = HostMT19937(7)
seeds_np = np.array([master.next_u32() for _ in range(NUM_ENVS)], np.uint32)

mesh = make_mesh()
sh = env_sharding(mesh)
seeds = jax.device_put(jnp.asarray(seeds_np), sh)


@jax.jit
def init(seeds):
    st = jax.vmap(lambda sd: lifecycle.initial_state(game, sd))(seeds)
    return jax.vmap(lambda s: lifecycle.env_reset(game, s))(st)


@jax.jit
def step(states, actions):
    states, needs = jax.vmap(lambda s, a: lifecycle.env_step(game, s, a))(
        states, actions
    )
    states = reset_pending(game, states, needs, 4)
    obs = jax.vmap(lambda s: render_obs(game, s, 64))(states)
    return states, obs


states = init(seeds)
rng = np.random.RandomState(5)
acts = rng.randint(0, 15, size=(STEPS, NUM_ENVS)).astype(np.int32)

rows = []
for t in range(STEPS):
    a = jax.device_put(jnp.asarray(acts[t]), sh)
    states, obs = step(states, a)
    # collect this process's addressable shard values (global indices kept)
    shard_data = {{}}
    for name, arr in (
        ("reward", states.reward),
        ("done", states.done),
        ("seed", states.current_level_seed),
        ("obs", obs),
    ):
        for s in arr.addressable_shards:
            start = s.index[0].start or 0
            shard_data.setdefault(name, []).append(
                (start, np.asarray(s.data).tolist())
            )
    rows.append(shard_data)

with open(out_path, "w") as f:
    json.dump(rows, f)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _run_workers(nproc, tmp):
    script = _WORKER.format(
        repo=REPO, num_envs=NUM_ENVS, steps=STEPS, game=GAME
    )
    coord = f"127.0.0.1:{_free_port()}"
    procs, outs = [], []
    for pid in range(nproc):
        out = os.path.join(tmp, f"out_{nproc}_{pid}.json")
        outs.append(out)
        env = dict(os.environ)
        env.pop("JAX_PLATFORMS", None)
        procs.append(
            subprocess.Popen(
                [sys.executable, "-c", script, str(nproc), str(pid), coord, out],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    for p in procs:
        stdout, stderr = p.communicate(timeout=1500)
        assert p.returncode == 0, stderr.decode()[-3000:]
    return [json.load(open(o)) for o in outs]


def _merge(rows_per_proc):
    """Merge per-process shard rows into dense [steps][name] -> global arr."""
    merged = []
    for t in range(STEPS):
        step_map = {}
        for rows in rows_per_proc:
            for name, shards in rows[t].items():
                vals = step_map.setdefault(name, {})
                for start, data in shards:
                    vals[start] = np.asarray(data)
        dense = {}
        for name, vals in step_map.items():
            parts = [vals[k] for k in sorted(vals)]
            dense[name] = np.concatenate(parts, axis=0)
        merged.append(dense)
    return merged


@pytest.mark.slow
def test_two_process_matches_single():
    with tempfile.TemporaryDirectory() as tmp:
        single = _merge(_run_workers(1, tmp))
        double = _merge(_run_workers(2, tmp))
    for t in range(STEPS):
        for name in ("reward", "done", "seed", "obs"):
            np.testing.assert_array_equal(
                single[t][name], double[t][name],
                err_msg=f"step {t} field {name}",
            )


def test_seed_decorrelation_fold():
    """rand_seed=None folds jax.process_index() so each host draws a
    distinct master seed (the MPI-rank fold, reference env.py:73-82)."""
    from procgen_tpu.env import _fold_process_seed

    s0 = _fold_process_seed(1234, 0)
    s1 = _fold_process_seed(1234, 1)
    assert s0 != s1
    assert s0 == _fold_process_seed(1234, 0)
