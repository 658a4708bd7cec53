"""Sharded execution equivalence on an 8-device virtual CPU mesh.

The env batch axis is the only parallel axis (SURVEY §2.2): stepping a
sharded batch must produce bit-identical results to the unsharded program.
"""

import jax
import jax.numpy as jnp
import numpy as np

from procgen_tpu.core import lifecycle
from procgen_tpu.core.constants import EASY_MODE, INT32_MAX
from procgen_tpu.core.options import GameOptions
from procgen_tpu.games.registry import make_game
from procgen_tpu.parallel.sharding import env_sharding, make_mesh, shard_states
from procgen_tpu.parallel.vec import reset_pending
from procgen_tpu.render.renderer import render_obs
from procgen_tpu.utils.host_mt import HostMT19937


def _fns(num_envs):
    game = make_game(
        "maze", GameOptions(distribution_mode=EASY_MODE, use_monochrome_assets=True)
    )
    game.level_seed_low, game.level_seed_high = 0, INT32_MAX
    master = HostMT19937(3)
    seeds = jnp.asarray([master.next_u32() for _ in range(num_envs)], jnp.uint32)

    def init(seeds):
        st = jax.vmap(lambda sd: lifecycle.initial_state(game, sd))(seeds)
        return jax.vmap(lambda s: lifecycle.env_reset(game, s))(st)

    def step(states, actions):
        states, needs = jax.vmap(lambda s, a: lifecycle.env_step(game, s, a))(
            states, actions
        )
        states = reset_pending(game, states, needs, 8)
        obs = jax.vmap(lambda s: render_obs(game, s, 64))(states)
        return states, obs

    return init, step, seeds


def test_sharded_step_matches_unsharded():
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    num_envs = 16
    init, step, seeds = _fns(num_envs)

    states = jax.jit(init)(seeds)
    actions = jnp.asarray(
        np.random.RandomState(0).randint(0, 15, size=(5, num_envs)), jnp.int32
    )

    # unsharded rollout
    st = states
    step_jit = jax.jit(step)
    for t in range(5):
        st, obs_ref = step_jit(st, actions[t])
    obs_ref = np.asarray(obs_ref)

    # sharded rollout over the 8-device env mesh
    mesh = make_mesh(8)
    sh = env_sharding(mesh)
    st2 = shard_states(jax.jit(init)(seeds), mesh)
    for t in range(5):
        st2, obs_sh = step_jit(st2, jax.device_put(actions[t], sh))
    assert len(obs_sh.sharding.device_set) == 8
    np.testing.assert_array_equal(np.asarray(obs_sh), obs_ref)


def test_product_env_sharded_matches_unsharded():
    """The user-facing path: ProcgenGym3Env(mesh="auto") — pool auto-reset +
    textured render — must match mesh=None bit-for-bit."""
    from procgen_tpu.env import ProcgenGym3Env

    num = 16
    actions = np.random.RandomState(1).randint(0, 15, size=(6, num)).astype(
        np.int32
    )

    def rollout(mesh):
        env = ProcgenGym3Env(
            num=num,
            env_name="maze",
            rand_seed=11,
            distribution_mode="easy",
            mesh=mesh,
        )
        out = []
        for t in range(len(actions)):
            env.act(actions[t])
            rew, obs, first = env.observe()
            info = env.get_info()
            out.append(
                (rew, obs["rgb"], first, [i["level_seed"] for i in info])
            )
        return env, out

    env_sh, sharded = rollout("auto")
    assert env_sh._vec.mesh is not None, "auto mesh must engage on 8 devices"
    assert len(env_sh._vec.states.grid.sharding.device_set) == 8
    _, plain = rollout(None)
    for t, (a, b) in enumerate(zip(sharded, plain)):
        np.testing.assert_array_equal(a[0], b[0], err_msg=f"rew step {t}")
        np.testing.assert_array_equal(a[1], b[1], err_msg=f"obs step {t}")
        np.testing.assert_array_equal(a[2], b[2], err_msg=f"first step {t}")
        assert a[3] == b[3], f"level seeds step {t}"


def _rollout_env(env_name, mesh, num, actions, mode="easy"):
    from procgen_tpu.env import ProcgenGym3Env

    env = ProcgenGym3Env(
        num=num, env_name=env_name, rand_seed=11, distribution_mode=mode,
        mesh=mesh,
    )
    out = []
    for t in range(len(actions)):
        env.act(actions[t])
        rew, obs, first = env.observe()
        out.append((np.asarray(rew), np.asarray(obs["rgb"]),
                    np.asarray(first)))
    return env, out


def _assert_rollouts_equal(a, b):
    for t, (x, y) in enumerate(zip(a, b)):
        for f, (u, v) in enumerate(zip(x, y)):
            np.testing.assert_array_equal(u, v, err_msg=f"step {t} field {f}")


def test_physics_game_sharded_matches_unsharded():
    """Sharding equivalence beyond maze (VERDICT r3 weak #7): a full
    physics game — textured render, entity pools, sub-stepped movers,
    pool auto-reset — under the env mesh."""
    num = 16
    actions = np.random.RandomState(2).randint(0, 15, size=(6, num)).astype(
        np.int32
    )
    env_sh, sharded = _rollout_env("dodgeball", "auto", num, actions)
    assert env_sh._vec.mesh is not None
    assert len(env_sh._vec.states.grid.sharding.device_set) == 8
    _, plain = _rollout_env("dodgeball", None, num, actions)
    _assert_rollouts_equal(sharded, plain)


def test_joint_batch_sharded_matches_unsharded():
    """The fused joint-game step under the env mesh: each sub-batch is
    sharded; the single joint program must stay bit-identical."""
    num = 16
    actions = np.random.RandomState(3).randint(0, 15, size=(5, num)).astype(
        np.int32
    )
    env_sh, sharded = _rollout_env("maze,miner", "auto", num, actions)
    assert all(s.mesh is not None for s in env_sh._vec.subs)
    _, plain = _rollout_env("maze,miner", None, num, actions)
    _assert_rollouts_equal(sharded, plain)
