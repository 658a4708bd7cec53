"""Observation renderer (single env; vmapped by the vec runtime).

Re-designs the QPainter pipeline (basic-abstract-game.cpp:828-1021) as a
per-pixel compositor in the reference's paint order: background → z=-1
entities → grid cells → z=0 → z=1 entities → HUD velocity squares.

TPU-first choices:
  * The grid pass avoids per-pixel gathers (which lower to slow serialized
    gathers on TPU) by sampling the [Hmax, Wmax] grid with two one-hot
    matmuls — row-select @ grid @ col-select — which XLA maps onto the MXU.
  * The entity passes accumulate a per-pixel *winner slot* (later slot wins,
    matching painter order within a z level) with separable row/col interval
    masks, then resolve winner → color with one tiny one-hot matmul.

This module implements the colored-rect paths (use_monochrome_assets and
types >= USE_ASSET_THRESHOLD, cpp:886-928).  Sprite-atlas sampling plugs in
on top (render/atlas.py) by replacing the color resolution step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.constants import INVALID_OBJ, SPACE
from .assets import monochrome_color

f32 = jnp.float32
i32 = jnp.int32
u8 = jnp.uint8


def to_shade(f):
    """qt-utils.h:21-28."""
    return jnp.clip((f * 255).astype(i32), 0, 255)


def _onehot_sample_grid(grid, celly, cellx, hmax, wmax, oob_val):
    """out[p, q] = grid[celly[p], cellx[q]] via one-hot matmuls (MXU).

    Out-of-range cells read as ``oob_val``.
    """
    rows = (celly[:, None] == jnp.arange(hmax)[None, :]).astype(f32)  # [res, H]
    cols = (cellx[:, None] == jnp.arange(wmax)[None, :]).astype(f32)  # [res, W]
    gf = grid.astype(f32)
    sampled = rows @ gf @ cols.T  # [res, res]
    inb = ((celly >= 0) & (celly < hmax))[:, None] & (
        (cellx >= 0) & (cellx < wmax)
    )[None, :]
    return jnp.where(inb, sampled.astype(i32), oob_val)


def render_obs(game, s, res: int = 64):
    """Render one env state to [res, res, 3] uint8."""
    w = s.main_width.astype(f32)
    h = s.main_height.astype(f32)

    # prepare_for_drawing (cpp:828-847)
    if game.center_agent:
        cx, cy, vis = game.camera(s)
    else:
        cx = w * 0.5
        cy = h * 0.5
        vis = jnp.maximum(jnp.maximum(w, h), f32(game.min_visibility))

    unit = res / vis  # pixels per world unit at this resolution
    x_off = unit * (cx - vis / 2)
    y_off = unit * (cy - vis / 2)

    sx = jnp.arange(res, dtype=f32) + 0.5  # pixel centers, screen coords
    sy = jnp.arange(res, dtype=f32) + 0.5
    wxs = (sx + x_off) / unit  # [res] world x per pixel column
    wys = vis - (sy - y_off) / unit  # [res] world y per pixel row

    obs = jnp.zeros((res, res, 3), i32)  # black fill (cpp:989)

    draw_mask = game.should_draw_entity_mask(s)

    def paint_pool(obs, pool, zlevel, mask):
        """Composite one pool at one z level: winner-slot then color."""
        cap = pool.cap
        e = pool
        img_all = game.image_for_type(s, e.image_type)
        live_all = e.active & (e.render_z == zlevel) & (img_all >= 0) & (
            img_all != SPACE
        )
        if mask is not None:
            live_all &= mask

        def body(i, winner):
            # separable cover: world-coords or abs-coords rect
            xcov_w = jnp.abs(wxs - e.x[i]) < e.rx[i]
            ycov_w = jnp.abs(wys - e.y[i]) < e.ry[i]
            x0 = res * (e.x[i] - e.rx[i])
            y0 = res * (e.y[i] + e.ry[i])
            xcov_a = (sx >= x0) & (sx < x0 + 2 * res * e.rx[i])
            ycov_a = (sy >= y0) & (sy < y0 + 2 * res * e.ry[i])
            xcov = jnp.where(e.use_abs_coords[i], xcov_a, xcov_w)
            ycov = jnp.where(e.use_abs_coords[i], ycov_a, ycov_w)
            cover = ycov[:, None] & xcov[None, :] & live_all[i]
            return jnp.where(cover, i, winner)

        winner = jax.lax.fori_loop(0, cap, body, jnp.full((res, res), -1, i32))

        # resolve winner -> color with a one-hot matmul over slots
        r, g_, b = game.color_for_type(img_all, e.image_theme)
        colors = jnp.stack(
            [jnp.asarray(r, f32), jnp.asarray(g_, f32), jnp.asarray(b, f32)],
            axis=-1,
        )
        colors = jnp.broadcast_to(colors, (cap, 3))
        onehot = (
            winner.reshape(-1)[:, None] == jnp.arange(cap)[None, :]
        ).astype(f32)
        col = (onehot @ colors).reshape(res, res, 3).astype(i32)
        return jnp.where((winner >= 0)[:, :, None], col, obs)

    def paint_z(obs, zlevel):
        obs = paint_pool(obs, s.ents, zlevel, draw_mask)
        if game.DECOR_CAP:
            obs = paint_pool(obs, s.decor, zlevel, None)
        return obs

    # entities below the grid
    obs = paint_z(obs, -1)

    # grid pass (cpp:950-964)
    cellx = jnp.floor(wxs).astype(i32)
    celly = jnp.floor(wys).astype(i32)
    wmax, hmax = game.WORLD_DIM_MAX
    raw = _onehot_sample_grid(s.grid, celly, cellx, hmax, wmax, INVALID_OBJ)
    inb = (
        ((celly >= 0) & (celly < s.main_height))[:, None]
        & ((cellx >= 0) & (cellx < s.main_width))[None, :]
    )
    if game.center_agent:
        # C++ draws cells in center ± (vis/2 + 1) incl. out-of-world reads,
        # which return out_of_bounds_object (cpp:937-948, 180-185)
        gtype = jnp.where(inb, raw, game.out_of_bounds_object)
    else:
        gtype = jnp.where(inb, raw, INVALID_OBJ)

    u = wxs[None, :] - jnp.floor(wxs)[None, :]  # within-cell fraction
    v = wys[:, None] - jnp.floor(wys)[:, None]
    u = jnp.broadcast_to(u, (res, res))
    v = jnp.broadcast_to(v, (res, res))
    gvalid, r, g_, b = game.grid_cell_colors(s, gtype, u, v)
    gcol = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(r, i32), (res, res)),
            jnp.broadcast_to(jnp.asarray(g_, i32), (res, res)),
            jnp.broadcast_to(jnp.asarray(b, i32), (res, res)),
        ],
        axis=-1,
    )
    obs = jnp.where(gvalid[:, :, None], gcol, obs)

    # entities above the grid
    obs = paint_z(obs, 0)
    obs = paint_z(obs, 1)

    # paint_vel_info (cpp:969-978)
    if game.options.paint_vel_info and game.has_useful_vel_info:
        infodim = res * 0.2
        s1 = to_shade(0.5 * s.ents.vx[0] / s.maxspeed + 0.5)
        s2 = to_shade(0.5 * s.ents.vy[0] / s.max_jump + 0.5)
        in_y = (sy < infodim)[:, None]
        r1 = in_y & (sx < infodim)[None, :]
        r2 = in_y & ((sx >= infodim) & (sx < 2 * infodim))[None, :]
        obs = jnp.where(r1[:, :, None], s1, obs)
        obs = jnp.where(r2[:, :, None], s2, obs)

    obs = game.render_overlay(s, obs, sx, sy, res, unit, vis)

    return obs.astype(u8)
