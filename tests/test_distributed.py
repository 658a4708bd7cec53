"""2-process ``jax.distributed`` equivalence on the PRODUCT path
(SURVEY §5 comm backend; VERDICT r4 weak #5).

The reference decorrelates seeds per MPI rank (reference procgen
env.py:73-82) and otherwise runs one independent VecGame per process.
The TPU design instead runs ONE logical env batch sharded over a global
mesh spanning processes (parallel/sharding.py).  This test spawns two
coordinated CPU processes (4 virtual devices each → an 8-device global
mesh), drives ``ProcgenGym3Env(mesh=...)`` — the same fused program
``dryrun_multichip`` compiles: pool auto-reset + textured Pallas/XLA
render — in lockstep, and asserts each process's addressable shards are
bit-identical to a single-process rollout of the same batch.  Runs for
maze (grid-step product path) and dodgeball (continuous physics).
Also pins the per-process seed decorrelation fold used when no
rand_seed is given.
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
from procgen_tpu.env import ProcgenGym3Env
from procgen_tpu.parallel.sharding import make_mesh

NUM_ENVS = {num_envs}
STEPS = {steps}

# the PRODUCT path: fused step = logic + pool auto-reset + textured render
env = ProcgenGym3Env(
    num=NUM_ENVS, env_name={game!r}, rand_seed=7,
    distribution_mode="easy", mesh=make_mesh(),
)
vec = env._vec

rng = np.random.RandomState(5)
acts = rng.randint(0, 15, size=(STEPS, NUM_ENVS)).astype(np.int32)

rows = []
for t in range(STEPS):
    vec.act(acts[t])
    obs, rew, first, info = vec.observe()
    # collect this process's addressable shard values (global indices kept)
    shard_data = {{}}
    for name, arr in (
        ("reward", rew),
        ("first", first),
        ("seed", info["level_seed"]),
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


def _run_workers(nproc, tmp, game):
    script = _WORKER.format(
        repo=REPO, num_envs=NUM_ENVS, steps=STEPS, game=game
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
@pytest.mark.parametrize("game", ["maze", "dodgeball"])
def test_two_process_matches_single(game):
    with tempfile.TemporaryDirectory() as tmp:
        single = _merge(_run_workers(1, tmp, game))
        double = _merge(_run_workers(2, tmp, game))
    for t in range(STEPS):
        for name in ("reward", "first", "seed", "obs"):
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
