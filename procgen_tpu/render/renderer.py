"""Flat-shaded observation renderer (single env; vmapped by the vec runtime).

Re-designs the QPainter pipeline (basic-abstract-game.cpp:828-1021) as a
per-pixel gather: every output pixel computes its world coordinate from the
camera transform and composites background → z=-1 entities → grid cells →
z=0 → z=1 entities → HUD velocity squares, exactly in the reference's paint
order (painter's algorithm == later select wins).

This module implements the colored-rect paths (use_monochrome_assets and
types >= USE_ASSET_THRESHOLD, cpp:886-928).  Sprite-atlas sampling plugs in
on top (render/atlas.py) without changing the structure: the per-pixel cover
test turns into a texel fetch.
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


def render_obs(game, s, res: int = 64):
    """Render one env state to [res, res, 3] uint8."""
    w = s.main_width.astype(f32)
    h = s.main_height.astype(f32)

    # prepare_for_drawing (cpp:828-847)
    if game.center_agent:
        cx, cy = game.choose_center(s)
        vis = s.visibility
    else:
        cx = w * 0.5
        cy = h * 0.5
        vis = jnp.maximum(jnp.maximum(w, h), f32(game.min_visibility))

    unit = res / vis  # pixels per world unit at this resolution
    x_off = unit * (cx - vis / 2)
    y_off = unit * (cy - vis / 2)

    sx = jnp.arange(res, dtype=f32) + 0.5  # pixel centers, screen coords
    sy = jnp.arange(res, dtype=f32) + 0.5
    wx = (sx[None, :] + x_off) / unit  # [res(y), res(x)] world x
    wy = vis - (sy[:, None] - y_off) / unit  # world y (up-positive)
    wx = jnp.broadcast_to(wx, (res, res))
    wy = jnp.broadcast_to(wy, (res, res))

    obs = jnp.zeros((res, res, 3), u8)  # black fill (cpp:989)

    draw_mask = game.should_draw_entity_mask(s)

    def paint_entities(obs, zlevel):
        def body(i, obs):
            e = s.ents
            live = (i < e.count) & (e.render_z[i] == zlevel) & draw_mask[i]
            img = game.image_for_type(s, e.image_type[i])
            live &= (img >= 0) & (img != SPACE)

            def abs_cover():
                # get_abs_rect path (cpp:820-825): screen units
                px = sx[None, :]
                py = sy[:, None]
                x0 = res * (e.x[i] - e.rx[i])
                y0 = res * (e.y[i] + e.ry[i])
                return (
                    (px >= x0)
                    & (px < x0 + 2 * res * e.rx[i])
                    & (py >= y0)
                    & (py < y0 + 2 * res * e.ry[i])
                )

            def world_cover():
                return (jnp.abs(wx - e.x[i]) < e.rx[i]) & (
                    jnp.abs(wy - e.y[i]) < e.ry[i]
                )

            cover = jnp.where(e.use_abs_coords[i], abs_cover(), world_cover())
            r, g_, b = game.color_for_type(img, e.image_theme[i])
            col = jnp.stack(
                [jnp.asarray(r, u8), jnp.asarray(g_, u8), jnp.asarray(b, u8)]
            )
            return jnp.where((cover & live)[:, :, None], col[None, None, :], obs)

        return jax.lax.fori_loop(0, game.ENT_CAP, body, obs)

    # entities below the grid
    obs = paint_entities(obs, -1)

    # grid pass (cpp:950-964)
    cellx = jnp.floor(wx).astype(i32)
    celly = jnp.floor(wy).astype(i32)
    if game.center_agent:
        # the C++ loop covers center ± (vis/2 + 1), a superset of all visible
        # cells; out-of-world reads return out_of_bounds_object
        gtype = _get_obj_grid(game, s, cellx, celly)
    else:
        inb = (
            (cellx >= 0)
            & (cellx < s.main_width)
            & (celly >= 0)
            & (celly < s.main_height)
        )
        gtype = jnp.where(inb, _get_obj_grid(game, s, cellx, celly), INVALID_OBJ)

    theme = game.theme_for_grid_obj(gtype)
    gimg = game.image_for_type(s, gtype)
    gvalid = (gtype != INVALID_OBJ) & (gimg >= 0) & (gimg != SPACE)
    r, g_, b = game.color_for_type(gimg, theme)
    gcol = jnp.stack(
        [jnp.asarray(r, u8), jnp.asarray(g_, u8), jnp.asarray(b, u8)], axis=-1
    )
    gcol = jnp.broadcast_to(gcol, (res, res, 3))
    obs = jnp.where(gvalid[:, :, None], gcol, obs)

    # entities above the grid
    obs = paint_entities(obs, 0)
    obs = paint_entities(obs, 1)

    # paint_vel_info (cpp:969-978)
    if game.options.paint_vel_info and game.has_useful_vel_info:
        infodim = res * 0.2
        s1 = to_shade(0.5 * s.ents.vx[0] / s.maxspeed + 0.5).astype(u8)
        s2 = to_shade(0.5 * s.ents.vy[0] / s.max_jump + 0.5).astype(u8)
        px = sx[None, :]
        py = sy[:, None]
        in_y = py < infodim
        r1 = (px < infodim) & in_y
        r2 = (px >= infodim) & (px < 2 * infodim) & in_y
        obs = jnp.where(r1[:, :, None], s1, obs)
        obs = jnp.where(r2[:, :, None], s2, obs)

    return obs


def _get_obj_grid(game, s, x, y):
    """Vectorised bounds-checked grid read over pixel cell arrays."""
    inb = (x >= 0) & (x < s.main_width) & (y >= 0) & (y < s.main_height)
    idx = jnp.clip(y * s.main_width + x, 0, game.grid_cap - 1)
    return jnp.where(inb, s.grid[idx], game.out_of_bounds_object)
