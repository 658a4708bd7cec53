"""AssetGen parity: the traced background generator must consume exactly the
same number of rand_gen words as a host-side simulation of
AssetGen::generate_resource (assetgen.cpp:104-132, num_recurse=1,
blotch_scale=50) seeded identically."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from procgen_tpu.core import rng
from procgen_tpu.render import assetgen
from procgen_tpu.render.assetgen_host import (
    HostRandGen,
    _paint_rect_resource,
    bake_generated_asset,
)


class _CountingRandGen(HostRandGen):
    def __init__(self, seed):
        super().__init__(seed)
        self.count = 0

    def randint(self, low, high):
        self.count += 1
        return super().randint(low, high)

    def randn(self, high):
        self.count += 1
        return super().randn(high)

    def rand01(self):
        self.count += 1
        return super().rand01()


def _host_draw_count(seed: int) -> int:
    rg = _CountingRandGen(seed)
    img = np.zeros((4, 4, 4), np.uint8)  # raster irrelevant for the count
    _paint_rect_resource(img, rg, (0.0, 0.0, 500.0, 500.0), 1, 50)
    return rg.count


@pytest.mark.parametrize("seed", [0, 1, 7, 1234, 999999])
def test_background_draw_count_matches_host(seed):
    @jax.jit
    def traced_count(sd):
        st = rng.seed(sd)
        vals, _ = rng.draw_block(st, assetgen.N_MAX)
        _, used = assetgen.generate_background(vals)
        return used

    used = int(traced_count(jnp.uint32(seed)))
    assert used == _host_draw_count(seed)
    assert used <= assetgen.N_MAX


def test_generated_sprite_deterministic():
    a = bake_generated_asset(1234, 7, True)
    b = bake_generated_asset(1234, 7, True)
    np.testing.assert_array_equal(a, b)
    c = bake_generated_asset(1234, 8, True)
    assert not np.array_equal(a, c)
    d = bake_generated_asset(1234, 7, False)  # shape resource differs
    assert not np.array_equal(a, d)
    assert a.shape == (64, 64, 4)


def test_generated_assets_env():
    from procgen_tpu.env import ProcgenGym3Env

    def collect():
        env = ProcgenGym3Env(
            num=2, env_name="maze", rand_seed=9, distribution_mode="easy",
            use_generated_assets=True,
        )
        frames = []
        r = np.random.RandomState(0)
        for _ in range(6):
            _, obs, _ = env.observe()
            frames.append(obs["rgb"].copy())
            env.act(r.randint(0, 15, size=2).astype(np.int32))
        return np.stack(frames)

    f1 = collect()
    f2 = collect()
    np.testing.assert_array_equal(f1, f2)
    assert f1.std() > 10
