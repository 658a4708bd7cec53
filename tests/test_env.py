"""Functional env tests, mirroring reference procgen/env_test.py.

- test_seeding (env_test.py:7-30): same start_level ⇒ identical first obs;
  different level ⇒ different obs.
- test_determinism (env_test.py:33-52): 128-step random rollout with fixed
  rand_seed, run twice, bit-identical obs.
Parametrised over every implemented game.
"""

import numpy as np
import pytest

from procgen_tpu import ProcgenGym3Env
from procgen_tpu.games.registry import available_games

GAMES = available_games()


def rollout(env, steps, rng):
    obs_list, rew_list, first_list = [], [], []
    for _ in range(steps):
        env.act(rng.randint(0, 15, size=env.num))
        rew, obs, first = env.observe()
        obs_list.append(obs["rgb"])
        rew_list.append(rew)
        first_list.append(first)
    return (
        np.stack(obs_list),
        np.stack(rew_list),
        np.stack(first_list),
    )


@pytest.mark.parametrize("env_name", GAMES)
def test_seeding(env_name):
    def make(start_level):
        return ProcgenGym3Env(
            num=1,
            env_name=env_name,
            num_levels=1,
            start_level=start_level,
            rand_seed=0,
            use_monochrome_assets=True,
            distribution_mode="easy",
        )

    _, obs1, _ = make(0).observe()
    _, obs2, _ = make(0).observe()
    _, obs3, _ = make(1).observe()

    np.testing.assert_array_equal(obs1["rgb"], obs2["rgb"])
    assert not np.array_equal(obs1["rgb"], obs3["rgb"])


@pytest.mark.parametrize("env_name", GAMES)
def test_determinism(env_name):
    def collect():
        env = ProcgenGym3Env(
            num=2,
            env_name=env_name,
            rand_seed=23,
            use_monochrome_assets=True,
            distribution_mode="easy",
        )
        rng = np.random.RandomState(0)
        return rollout(env, 128, rng)

    obs1, rew1, first1 = collect()
    obs2, rew2, first2 = collect()
    np.testing.assert_array_equal(obs1, obs2)
    np.testing.assert_array_equal(rew1, rew2)
    np.testing.assert_array_equal(first1, first2)


@pytest.mark.parametrize("env_name", GAMES)
def test_forced_reset_and_progression(env_name):
    """action == -1 forces a reset (game.cpp:141-144): first=True and a new
    level seed on the next observe."""
    env = ProcgenGym3Env(
        num=4,
        env_name=env_name,
        rand_seed=7,
        use_monochrome_assets=True,
        distribution_mode="easy",
    )
    rng = np.random.RandomState(1)
    rollout(env, 20, rng)
    info_before = env.get_info()
    env.act(np.full(4, -1, np.int32))
    _, _, first = env.observe()
    info_after = env.get_info()
    assert first.all(), "forced reset must set first=True"
    seeds_before = [i["level_seed"] for i in info_before]
    seeds_after = [i["level_seed"] for i in info_after]
    assert any(a != b for a, b in zip(seeds_before, seeds_after)) or all(
        i["prev_level_seed"] == b
        for i, b in zip(info_after, seeds_before)
    )


def test_info_latent_state_maze():
    env = ProcgenGym3Env(
        num=2, env_name="maze", rand_seed=11, distribution_mode="easy",
        use_monochrome_assets=True,
    )
    info = env.get_info()[0]
    for key in ("grid_size", "grid", "agent_pos", "exit_pos", "level_seed"):
        assert key in info
    w, h = info["grid_size"]
    assert w == 15 and h == 15
    grid = info["grid"][: w * h].reshape(h, w)
    ax, ay = info["agent_pos"]
    assert grid[ay, ax] != 51  # agent stands on a free cell
    ex, ey = info["exit_pos"]
    assert grid[ey, ex] == 2  # GOAL


def test_render_human_hi_res():
    """render_mode="rgb_array" exposes 512x512 frames via info["rgb"]
    (vecgame.cpp:318-330)."""
    env = ProcgenGym3Env(
        num=1, env_name="maze", rand_seed=5, distribution_mode="easy",
        use_monochrome_assets=True, render_mode="rgb_array",
    )
    info = env.get_info()[0]
    assert info["rgb"].shape == (512, 512, 3)
    assert info["rgb"].dtype == np.uint8


def test_miner_set_latent_state():
    """miner supports writing latent state back (miner.cpp:423-449)."""
    env = ProcgenGym3Env(
        num=2, env_name="miner", rand_seed=5, distribution_mode="easy",
        use_monochrome_assets=True,
    )
    infos = env.get_info()
    latents = [
        {
            "grid": i["grid"],
            "agent_pos": np.array([1, 1]),
            "exit_pos": i["exit_pos"],
        }
        for i in infos
    ]
    env.callmethod("set_latent_state", latents)
    infos2 = env.get_info()
    for i in infos2:
        assert tuple(i["agent_pos"]) == (1, 1)


def test_joint_games():
    """Comma-separated env_name runs games round-robin with the same master
    seed stream as a single-game batch (vecgame.cpp:343-363)."""
    env = ProcgenGym3Env(
        num=4, env_name="maze,miner", rand_seed=3, distribution_mode="easy",
        use_monochrome_assets=True,
    )
    rew, obs, first = env.observe()
    assert obs["rgb"].shape == (4, 64, 64, 3)
    env.act(np.array([4, 7, 2, 5], np.int32))
    info = env.get_info()

    single = ProcgenGym3Env(
        num=4, env_name="maze", rand_seed=3, distribution_mode="easy",
        use_monochrome_assets=True,
    )
    si = single.get_info()
    # joint envs 0, 2 are maze and must see master draws 0, 2
    assert info[0]["level_seed"] == si[0]["level_seed"]
    assert info[2]["level_seed"] == si[2]["level_seed"]

    # state blobs round-trip through the per-game codecs
    st = env.callmethod("get_state")
    env.callmethod("set_state", st)
    _, obs2, _ = env.observe()
    np.testing.assert_array_equal(env.observe()[1]["rgb"], obs2["rgb"])


def test_joint_info_union_keys():
    """Joint batches expose the UNION of per-game info keys with fixed
    padded shapes (the reference's single joint tensortype set,
    vecgame.cpp:270-330) — maze latents must survive joining with a game
    that has none, and differing latent shapes are padded, not dropped."""
    env = ProcgenGym3Env(
        num=4, env_name="maze,bigfish", rand_seed=3,
        distribution_mode="easy", use_monochrome_assets=True,
    )
    env.act(np.zeros(4, np.int32))
    info = env.get_info()
    for i in info:
        assert "grid" in i and "agent_pos" in i and "grid_size" in i
    # maze envs (0, 2) have real latents; bigfish envs (1, 3) read zeros
    assert tuple(info[0]["grid_size"]) != (0, 0)
    assert tuple(info[1]["grid_size"]) == (0, 0)
    single = ProcgenGym3Env(
        num=4, env_name="maze", rand_seed=3, distribution_mode="easy",
        use_monochrome_assets=True,
    )
    single.act(np.zeros(4, np.int32))
    si = single.get_info()
    np.testing.assert_array_equal(
        np.asarray(info[0]["grid"]), np.asarray(si[0]["grid"])
    )
    np.testing.assert_array_equal(
        np.asarray(info[0]["agent_pos"]), np.asarray(si[0]["agent_pos"])
    )


def test_textured_render_smoke():
    """Sprite/tile/background sampling path (non-monochrome) renders and is
    deterministic."""
    def collect():
        env = ProcgenGym3Env(
            num=2, env_name="bigfish", rand_seed=11, distribution_mode="easy",
        )
        rng = np.random.RandomState(1)
        frames = []
        for _ in range(16):
            _, obs, _ = env.observe()
            frames.append(obs["rgb"].copy())
            env.act(rng.randint(0, 15, size=2).astype(np.int32))
        return np.stack(frames)

    f1 = collect()
    f2 = collect()
    np.testing.assert_array_equal(f1, f2)
    assert f1.std() > 10  # real image content, not flat fill


@pytest.mark.parametrize("env_name", ["maze", "coinrun", "leaper"])
def test_reset_pool_equivalence(env_name, monkeypatch):
    """The precomputed next-level pool must be trajectory-identical to
    resetting in-step: env_reset is a pure function of the live state's
    level_seed_rand_gen, so consuming a precomputed slot and resetting at
    episode end produce the same post-reset state."""

    def collect(use_pool):
        monkeypatch.setenv("PROCGEN_TPU_RESET_POOL", "1" if use_pool else "0")
        monkeypatch.setenv("PROCGEN_TPU_REPLENISH_EVERY", "4")
        env = ProcgenGym3Env(
            num=8, env_name=env_name, rand_seed=7, distribution_mode="easy",
        )
        rng = np.random.RandomState(3)
        obs_l, rew_l, first_l, seed_l = [], [], [], []
        for t in range(40):
            acts = rng.randint(0, 15, size=8).astype(np.int32)
            # forced resets (action -1, game.cpp:141-143) exercise pool
            # consumption, double-finish fallback, and replenish bursts
            acts[rng.rand(8) < 0.2] = -1
            env.act(acts)
            rew, obs, first = env.observe()
            obs_l.append(obs["rgb"].copy())
            rew_l.append(np.asarray(rew))
            first_l.append(np.asarray(first))
            seed_l.append(np.asarray(env.get_info()[0]["level_seed"]))
        return (
            np.stack(obs_l), np.stack(rew_l), np.stack(first_l),
            np.stack(seed_l),
        )

    a = collect(True)
    b = collect(False)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_episode_recorder(tmp_path):
    """interactive --record-dir analogue of the reference's
    VideoRecorderWrapper wiring (reference interactive.py:28-49)."""
    from procgen_tpu.interactive import EpisodeRecorder

    rec = EpisodeRecorder(str(tmp_path), fps=15)
    rng = np.random.RandomState(0)
    for _ in range(7):
        rec.append(rng.randint(0, 255, size=(64, 64, 3), dtype=np.uint8))
    rec.flush()
    for _ in range(3):
        rec.append(rng.randint(0, 255, size=(64, 64, 3), dtype=np.uint8))
    rec.flush()
    rec.flush()  # empty flush is a no-op

    import os

    files = sorted(os.listdir(tmp_path))
    assert "episode_00000.npz" in files and "episode_00001.npz" in files
    ep0 = np.load(tmp_path / "episode_00000.npz")
    assert ep0["frames"].shape == (7, 64, 64, 3)
    assert int(ep0["fps"]) == 15
    ep1 = np.load(tmp_path / "episode_00001.npz")
    assert ep1["frames"].shape == (3, 64, 64, 3)


# (game, hardest valid mode) for every game with a MAX_SMART compaction
# bound (core/game.py).  Modes follow the reference's per-mode validation
# (game.cpp:76-86): extreme only for chaser/dodgeball/leaper/starpilot,
# memory only for caveflyer/dodgeball/heist/jumper/maze/miner.  dodgeball
# memory mode spawns up to 19 enemies (dodgeball.cpp:310,347) — the known
# worst case among these.
MAX_SMART_CONFIGS = [
    ("caveflyer", "memory"),
    ("chaser", "extreme"),
    ("climber", "hard"),
    ("coinrun", "hard"),
    ("dodgeball", "memory"),
    ("ninja", "hard"),
]


@pytest.mark.parametrize("env_name,mode", MAX_SMART_CONFIGS)
def test_max_smart_bound(env_name, mode):
    """The live smart-mover count never exceeds the game's MAX_SMART
    compaction bound (movers beyond it would freeze for the step —
    core/game.py step_smart_entities_vectorized).  Worst-case rollout:
    hardest distribution mode, with auto-resets churning fresh levels."""
    import jax

    env = ProcgenGym3Env(
        num=4, env_name=env_name, rand_seed=11, distribution_mode=mode
    )
    vec = env._vec
    game = vec.game
    assert game.MAX_SMART is not None
    count_fn = jax.jit(
        lambda st: jax.numpy.max(jax.vmap(game.count_smart_movers)(st))
    )
    rng = np.random.RandomState(3)
    worst = int(np.asarray(count_fn(vec.states)))  # post-reset spawn burst
    for _ in range(120):
        env.act(rng.randint(0, 15, size=(env.num,)).astype(np.int32))
        worst = max(worst, int(np.asarray(count_fn(vec.states))))
    assert worst <= game.MAX_SMART, (
        f"{env_name}/{mode}: observed {worst} smart movers > "
        f"MAX_SMART={game.MAX_SMART}"
    )
    # the bound should be doing real work (compaction actually engaged)
    assert worst > 0
