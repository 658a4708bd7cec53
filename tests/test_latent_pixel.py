"""Latent-grid ↔ rendered-pixel consistency (VERDICT r4 weak #6).

Trajectory conformance never looks at the obs tensor and the Pallas/XLA
renderer equality tests are internal, so a gross render bug (wrong theme
table, swapped channels, wrong atlas row) could pass every other gate.
This cross-check pivots on the latent grid the reference itself exposes
(maze.cpp:167-188): for a few seeds it maps each latent cell to its
screen rect (maze renders the whole square world, so cell (gx, gy) is an
axis-aligned block with the world y axis flipped) and asserts the
rendered block's per-channel mean matches the ASSET's per-channel mean —
computed independently from the PNG bytes (render/assets.load_rgba), not
through any renderer code.  A channel swap, a wrong sprite, or a
mis-indexed theme table shifts the means far outside the tolerance;
nearest-resampling variation does not.
"""

import numpy as np
import pytest

WALL_OBJ = 51
CHEESE = 2
SPACE = 100

TOL = 32.0  # per-channel mean tolerance (resampling noise ~ a few counts)


def _asset_mean(rel_path, opaque_only=False):
    """Mean color straight from the PNG bytes.  ``opaque_only`` averages
    just the alpha>50% pixels (for entities smaller than their cell, the
    rendered sprite pixels are compared rather than the whole cell)."""
    from procgen_tpu.render.assets import load_rgba

    img = load_rgba(rel_path).astype(np.float64)
    if opaque_only:
        op = img[img[..., 3] > 128]
        return op[:, :3].mean(axis=0)
    rgb, a = img[..., :3], img[..., 3:] / 255.0
    return (rgb * a).reshape(-1, 3).mean(axis=0)


@pytest.mark.parametrize("rand_seed", [11, 12])
def test_maze_latent_cells_render_matching_palette(rand_seed):
    from procgen_tpu.env import ProcgenGym3Env

    num = 2
    env = ProcgenGym3Env(
        num=num, env_name="maze", rand_seed=rand_seed,
        distribution_mode="easy", use_backgrounds=False,
    )
    game = env._vec.game
    _, obs, _ = env.observe()
    frames = np.asarray(obs["rgb"], np.float64)  # [num, 64, 64, 3]
    infos = env.get_info()

    wall_means = [
        _asset_mean(p) for p in game.asset_for_type(WALL_OBJ)
    ]
    cheese_mean = _asset_mean(game.asset_for_type(CHEESE)[0], opaque_only=True)

    wmax = int(game.WORLD_DIM_MAX[0])
    res = 64
    for e in range(num):
        info = infos[e]
        w, h = int(info["grid_size"][0]), int(info["grid_size"][1])
        assert w == h, "maze worlds are square"
        grid = np.asarray(info["grid"]).reshape(-1, wmax)[:h, :w]
        u = res / w

        def cell_mean(gx, gy):
            # world y up -> screen row down; shrink 1px against bleed
            c0, c1 = int(np.ceil(gx * u)), int(np.floor((gx + 1) * u))
            r0 = int(np.ceil(res - (gy + 1) * u))
            r1 = int(np.floor(res - gy * u))
            block = frames[e, r0 + 1 : r1 - 1, c0 + 1 : c1 - 1]
            assert block.size > 0
            return block.reshape(-1, 3).mean(axis=0)

        # walls: one theme per level — every wall cell must match the SAME
        # wall asset variant, and match it channel-for-channel
        wall_cells = np.argwhere(grid == WALL_OBJ)
        assert len(wall_cells) > 0
        dists_per_variant = []
        for vm in wall_means:
            dists = [
                np.abs(cell_mean(gx, gy) - vm).max()
                for gy, gx in wall_cells[:12]
            ]
            dists_per_variant.append(np.median(dists))
        best = int(np.argmin(dists_per_variant))
        assert dists_per_variant[best] < TOL, (
            f"env {e}: wall cells match no wall asset variant "
            f"(best median per-channel error {dists_per_variant[best]:.1f})"
        )

        # the cheese cell (the latent goal) matches the cheese sprite
        cheese_cells = np.argwhere(grid == CHEESE)
        if len(cheese_cells):
            gy, gx = cheese_cells[0]
            # skip if the agent currently overlaps the goal cell
            ax, ay = int(info["agent_pos"][0]), int(info["agent_pos"][1])
            if (gx, gy) != (ax, ay):
                # the cheese entity is smaller than its cell: compare the
                # lit sprite pixels only (the rest is black background)
                c0, c1 = int(np.ceil(gx * u)), int(np.floor((gx + 1) * u))
                r0 = int(np.ceil(res - (gy + 1) * u))
                r1 = int(np.floor(res - gy * u))
                block = frames[e, r0:r1, c0:c1].reshape(-1, 3)
                bright = block[block.sum(axis=-1) > 60]
                assert len(bright) >= 3, (
                    f"env {e}: no lit pixels in the cheese cell"
                )
                # few-pixel sprites jitter in absolute level with nearest
                # resampling; the color DIRECTION is stable, and a channel
                # swap moves it by ~0.5 (10x the bound)
                got = bright.mean(axis=0)
                got = got / np.linalg.norm(got)
                want = cheese_mean / np.linalg.norm(cheese_mean)
                err = np.abs(got - want).max()
                assert err < 0.08, (
                    f"env {e}: cheese cell color direction off by "
                    f"{err:.3f} — wrong sprite or channel order"
                )

        # empty cells are black (use_backgrounds=False), far from walls
        space_cells = np.argwhere(grid == SPACE)
        for gy, gx in space_cells[:6]:
            ax, ay = int(info["agent_pos"][0]), int(info["agent_pos"][1])
            if (gx, gy) == (ax, ay) or grid[gy, gx] != SPACE:
                continue
            m = cell_mean(gx, gy)
            assert m.max() < TOL, (
                f"env {e}: SPACE cell ({gx},{gy}) not background-black: {m}"
            )
