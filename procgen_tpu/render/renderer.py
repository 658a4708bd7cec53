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

f32 = jnp.float32
i32 = jnp.int32
u8 = jnp.uint8


def to_shade(f):
    """qt-utils.h:21-28."""
    return jnp.clip((f * 255).astype(i32), 0, 255)


def _onehot_sample_grid(grid, celly, cellx, hmax, wmax, oob_val):
    """out[p, q] = grid[celly[p], cellx[q]] via one-hot matmuls (MXU).

    Out-of-range cells read as ``oob_val``.  Object ids ride as 8-bit
    planes (core/exact.py) so ids above bf16's integer-exact range (e.g.
    KEY_OBJ+theme = 301) survive XLA's default matmul precision.
    """
    from ..core.exact import from_planes16, to_planes16

    rows = (celly[:, None] == jnp.arange(hmax)[None, :]).astype(f32)  # [res, H]
    cols = (cellx[:, None] == jnp.arange(wmax)[None, :]).astype(f32)  # [res, W]
    gp = to_planes16(grid)  # [H, W, 2]
    t1 = jnp.einsum("ph,hwk->pwk", rows, gp)  # [res, W, 2]
    sampled = from_planes16(
        jnp.einsum("pwk,qw->pqk", t1, cols)
    )  # [res, res]
    inb = ((celly >= 0) & (celly < hmax))[:, None] & (
        (cellx >= 0) & (cellx < wmax)
    )[None, :]
    return jnp.where(inb, sampled, oob_val)


def render_obs(game, s, res: int = 64, base=None, prefix_only=False):
    """Render one env state to [res, res, 3] uint8.

    ``base``: a precomputed static-prefix frame (u8 [res, res, 3]) — skip
    the background / z<0 / grid-tile / colored-cell passes and composite
    only the dynamic suffix (z>=0 sprites, velocity squares, overlays) on
    top.  ``prefix_only``: render and return just that static prefix.
    Games whose prefix layers are immutable within an episode
    (``game.static_prefix``) cache the prefix in state at reset
    (lifecycle.env_reset) so the per-step render pays only the suffix.
    Splitting is bit-neutral: the prefix obs is integer-valued (one-hot
    picks of u8 texels + rounded blends), so the u8 round-trip is exact.
    """
    w = s.main_width.astype(f32)
    h = s.main_height.astype(f32)
    want_prefix = base is None
    want_suffix = not prefix_only

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

    from .atlas import get_atlases

    grid_atlas, bg_atlas, ent_atlas = get_atlases(game, res)

    if base is not None:
        obs = jnp.asarray(base, i32)
    else:
        obs = jnp.zeros((res, res, 3), i32)  # black fill (cpp:989)

        # background image (cpp:988-1016) via separable one-hot matmuls
        if game.options.use_backgrounds:
            if bg_atlas is not None:
                custom = game.paint_background(s, res, sx, sy, bg_atlas)
                if custom is not None:
                    obs = custom
                else:
                    pix = jnp.asarray(bg_atlas.pixels)
                    bi = jnp.clip(s.background_index, 0, pix.shape[0] - 1)
                    img = jax.lax.dynamic_index_in_dim(pix, bi, keepdims=False)
                    bg_ar = jnp.asarray(bg_atlas.aspects)[bi]
                    obs = _paint_background(
                        game, s, obs, sx, sy, res, unit, vis, img, bg_ar
                    )
            elif game.uses_procgen_background and s.bg_canvas is not None:
                # per-level procedural canvas (square, like the reference's
                # 500x500 QImage: aspect ratio 1)
                obs = _paint_background(
                    game, s, obs, sx, sy, res, unit, vis, s.bg_canvas, f32(1.0)
                )

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

        # traced bound: under vmap the loop runs to the batch-max live
        # count, not the static capacity
        winner = jax.lax.fori_loop(
            0, e.count, body, jnp.full((res, res), -1, i32)
        )

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

    # sprite mode: sample every slot ONCE into per-z premultiplied canvases
    # (over-compositing is associative, so canvas-then-apply equals painting
    # each entity directly in order), then the z passes are cheap applies.
    # Canvases exist only for the z levels this render pass needs
    # (ENT_Z_LEVELS / DECOR_Z_LEVELS restricted to prefix z<0 / suffix
    # z>=0) — HBM traffic scales with that count.
    def _wanted(levels):
        return tuple(
            z for z in levels
            if (want_prefix if z < 0 else want_suffix)
        )

    ent_z = _wanted(game.ENT_Z_LEVELS)
    dec_z = _wanted(game.DECOR_Z_LEVELS) if game.DECOR_CAP else ()
    if ent_atlas is not None:
        ents_canv = _sprite_canvases(
            game, s, s.ents, draw_mask, ent_atlas, res, unit, vis, x_off,
            y_off, sx, sy, ent_z,
        ) if ent_z else None
        decor_canv = (
            _sprite_canvases(
                game, s, s.decor, None, ent_atlas, res, unit, vis, x_off,
                y_off, sx, sy, dec_z,
            )
            if dec_z
            else None
        )

    def _apply_canvas(obs, canv):
        canv = canv.astype(f32)
        a = canv[..., 3:]
        return jnp.round(canv[..., :3] + obs.astype(f32) * (1 - a)).astype(i32)

    def paint_z(obs, zlevel):
        if ent_atlas is not None:
            if ents_canv is not None and zlevel in ent_z:
                obs = _apply_canvas(obs, ents_canv[ent_z.index(zlevel)])
            if decor_canv is not None and zlevel in dec_z:
                obs = _apply_canvas(obs, decor_canv[dec_z.index(zlevel)])
            return obs
        if zlevel in ent_z:
            obs = paint_pool(obs, s.ents, zlevel, draw_mask)
        if zlevel in dec_z:
            obs = paint_pool(obs, s.decor, zlevel, None)
        return obs

    # entities below the grid
    if want_prefix:
        obs = paint_z(obs, -1)

    if want_prefix:
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
            # C++ draws cells in center ± (vis/2 + 1) incl. out-of-world
            # reads, which return out_of_bounds_object (cpp:937-948, 180-185)
            gtype = jnp.where(inb, raw, game.out_of_bounds_object)
        else:
            gtype = jnp.where(inb, raw, INVALID_OBJ)

        u = wxs[None, :] - jnp.floor(wxs)[None, :]  # within-cell fraction
        v = wys[:, None] - jnp.floor(wys)[:, None]
        u = jnp.broadcast_to(u, (res, res))
        v = jnp.broadcast_to(v, (res, res))

        textured = jnp.zeros((res, res), bool)
        if grid_atlas is not None:
            obs, textured = _paint_grid_tiles(
                game, s, obs, res, unit, vis, x_off, y_off, wxs, wys,
                grid_atlas
            )

        gvalid, r, g_, b = game.grid_cell_colors(s, gtype, u, v)
        gvalid = gvalid & ~textured  # textured cells already painted
        gcol = jnp.stack(
            [
                jnp.broadcast_to(jnp.asarray(r, i32), (res, res)),
                jnp.broadcast_to(jnp.asarray(g_, i32), (res, res)),
                jnp.broadcast_to(jnp.asarray(b, i32), (res, res)),
            ],
            axis=-1,
        )
        obs = jnp.where(gvalid[:, :, None], gcol, obs)

    if prefix_only:
        return obs.astype(u8)

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


def _paint_background(game, s, obs, sx, sy, res, unit, vis, img, bg_ar):
    """draw_background (cpp:988-1016) as separable one-hot matmuls.

    ``img`` is the selected background image [BH, BW, 3] (atlas row or the
    per-level procedural canvas) with aspect ratio ``bg_ar``.
    """
    bf16 = jnp.bfloat16
    BH, BW = img.shape[0], img.shape[1]
    img = img.astype(bf16)

    W = s.main_width.astype(f32)
    H = s.main_height.astype(f32)
    if game.center_agent:
        cx, cy, _ = game.camera(s)
    else:
        cx = W * 0.5
        cy = H * 0.5
    x_off = unit * (cx - vis / 2)
    y_off = unit * (cy - vis / 2)
    # main_rect = get_screen_rect(0, H, W, H) (cpp:997)
    mr_x = -x_off
    mr_y = (vis - H) * unit + y_off
    mr_w = W * unit
    mr_h = H * unit

    if game.bg_tile_ratio < 0:
        # vertical tiling (tile_image, cpp:849-878)
        ratio = -game.bg_tile_ratio
        num_tiles = jnp.maximum((mr_h / (mr_w * ratio)).astype(i32), 1)
        tile_h = mr_h / num_tiles.astype(f32)
        fy = (sy - mr_y) / tile_h
        frac_y = fy - jnp.floor(fy)
        row_idx = jnp.clip((frac_y * BH).astype(i32), 0, BH - 1)
        col_idx = jnp.clip(((sx - mr_x) / mr_w * BW).astype(i32), 0, BW - 1)
        in_y = (sy >= mr_y) & (sy < mr_y + mr_h)
        in_x = (sx >= mr_x) & (sx < mr_x + mr_w)
    else:
        # aspect-preserving crop with random x offset (cpp:1003-1015)
        world_ar = W / H
        extra_w = bg_ar - world_ar
        offx = s.bg_pct_x * extra_w
        bgr_x = mr_x + mr_w * (-offx)
        bgr_w = mr_w * bg_ar / world_ar
        row_idx = jnp.clip(((sy - mr_y) / mr_h * BH).astype(i32), 0, BH - 1)
        col_idx = jnp.clip(((sx - bgr_x) / bgr_w * BW).astype(i32), 0, BW - 1)
        in_y = (sy >= mr_y) & (sy < mr_y + mr_h)
        in_x = (sx >= bgr_x) & (sx < bgr_x + bgr_w)

    # one-hot picks of integers <= 255: bf16 accumulation is exact
    R = ((row_idx[:, None] == jnp.arange(BH)[None, :]) & in_y[:, None]).astype(bf16)
    C = ((col_idx[:, None] == jnp.arange(BW)[None, :]) & in_x[:, None]).astype(bf16)
    e1 = jnp.einsum("ph,hwc->pwc", R, img, preferred_element_type=bf16)
    samp = jnp.einsum("qw,pwc->pqc", C, e1, preferred_element_type=bf16)
    return samp.astype(i32)


def _sprite_canvases(game, s, pool, mask, atlas, res, unit, vis, x_off,
                     y_off, sx, sy, z_levels=(-1, 0, 1)):
    """Entity sprite pass (draw_entity, cpp:1061-1067) without gathers.

    Per slot, in C++ vector order (QPainter sequential over-compositing):
    the sprite row is selected from the atlas, reflected / quarter-turn
    rotated by index remapping (both keep the sampling separable), sampled
    onto the entity's screen rect with two one-hot matmuls, and
    over-composited into the premultiplied canvas of its render_z.  Returns
    [len(z_levels), res, res, 4] canvases, one per z in ``z_levels`` (the
    game's static set — agent is always z=1, so most games use (0, 1)).
    Arbitrary rotations (caveflyer's ship, dodgeball enemies) sample a
    pre-rotated bank (ROT_BANK_K buckets, sqrt(2) overhang footprint —
    atlas.py) approximating QPainter's smooth rotation (draw_image,
    cpp:908-916).

    Canvases are bf16: every sampled texel is an exact integer <= 255
    (one-hot matmuls have exactly one nonzero term), so rounding only
    happens in genuinely-blended pixels, bounded by ~1/256 relative.

    Entities whose image has no atlas entry (img >= USE_ASSET_THRESHOLD)
    fall back to the color rect exactly like draw_grid_obj (cpp:893-894),
    ignoring entity alpha as QPainter opacity is only set on the sprite
    branch (cpp:903-906).
    """
    from .atlas import ROT_OVERHANG

    bf16 = jnp.bfloat16
    e = pool
    cap = e.cap
    S = atlas.tile_px
    rows = jnp.asarray(atlas.rows)  # [n+1, S, S, 4] uint8

    img_all = game.image_for_type(s, e.image_type)
    live_all = e.active & (img_all >= 0) & (img_all != SPACE)
    if mask is not None:
        live_all &= mask
    row_all = atlas.row_for(img_all, game.mask_theme(img_all, e.image_theme))  # [cap]
    tile_ratio_all = game.entity_tile_ratio(s, e)  # [cap]

    # screen rects (get_object_rect, cpp:820-826), y down
    x0_w = (e.x - e.rx) * unit - x_off
    y0_w = (vis - (e.y + e.ry)) * unit + y_off
    w2_w = 2 * e.rx * unit
    h2_w = 2 * e.ry * unit
    x0_a = res * (e.x - e.rx)
    y0_a = res * (e.y + e.ry)
    w2_a = 2 * res * e.rx
    h2_a = 2 * res * e.ry
    x0_all = jnp.where(e.use_abs_coords, x0_a, x0_w)
    y0_all = jnp.where(e.use_abs_coords, y0_a, y0_w)
    w2_all = jnp.where(e.use_abs_coords, w2_a, w2_w)
    h2_all = jnp.where(e.use_abs_coords, h2_a, h2_w)
    x0_all, y0_all, w2_all, h2_all = game.adjust_image_rect(
        img_all, x0_all, y0_all, w2_all, h2_all
    )

    # fallback color (draw_grid_obj) for types with no sprite
    fr, fg, fb = game.color_for_type(img_all, e.image_theme)
    fallback_rgb = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(fr, f32), (cap,)),
            jnp.broadcast_to(jnp.asarray(fg, f32), (cap,)),
            jnp.broadcast_to(jnp.asarray(fb, f32), (cap,)),
        ],
        axis=-1,
    )
    is_fallback = row_all == atlas.transparent_row

    arange_S = jnp.arange(S)
    nz = len(z_levels)
    zsel = jnp.asarray(z_levels, i32)  # canvas index -> render_z value

    def body(i, canv):
        # rotation-bank decision first: banked draws enlarge the screen
        # rect by ROT_OVERHANG to match the bank tile's sqrt(2) footprint
        # (QPainter's rotated draw overhangs the axis-aligned rect)
        rot = e.rotation[i]
        qf = rot * (2.0 / jnp.pi)
        q = jnp.round(qf).astype(i32) % 4
        arb = jnp.abs(qf - jnp.round(qf)) > 1e-4
        brow, has_bank = atlas.bank_row_for(
            row_all[i], e.is_reflected[i].astype(i32), rot
        )
        use_bank = arb & has_bank
        grow = jnp.where(use_bank, f32(ROT_OVERHANG), f32(1.0))

        w2_r, h2_r = w2_all[i], h2_all[i]
        x0 = x0_all[i] - w2_r * (grow - 1.0) * 0.5
        y0 = y0_all[i] - h2_r * (grow - 1.0) * 0.5
        w2 = jnp.maximum(w2_r * grow, 1e-6)
        h2 = jnp.maximum(h2_r * grow, 1e-6)

        u = (sx - x0) / w2  # [res] along screen x
        v = (sy - y0) / h2  # [res] along screen y
        xvalid = (u >= 0) & (u < 1)
        yvalid = (v >= 0) & (v < 1)

        # tiling within the rect (tile_image, cpp:849-878)
        tr = tile_ratio_all[i]
        nt_h = jnp.maximum((w2 / (h2 * jnp.maximum(tr, 1e-6))).astype(i32), 1)
        nt_v = jnp.maximum(
            (h2 / (w2 * jnp.maximum(-tr, 1e-6))).astype(i32), 1
        )
        ut = u * nt_h.astype(f32)
        vt = v * nt_v.astype(f32)
        u_ = jnp.where(tr > 0, ut - jnp.floor(ut), u)
        v_ = jnp.where(tr < 0, vt - jnp.floor(vt), v)

        ui = jnp.clip((u_ * S).astype(i32), 0, S - 1)
        vi = jnp.clip((v_ * S).astype(i32), 0, S - 1)

        # quarter-turn rotation as index remap (Qt rotate = clockwise,
        # draw_image cpp:908-916); q = nearest quarter.  Non-quarter angles
        # sample the pre-rotated bank row instead (reflection baked in),
        # quantized to ROT_BANK_K buckets — atlas.py bank docstring.
        # (rot/q/bucket/use_bank hoisted above for the rect enlargement)
        use_t = ((q == 1) | (q == 3)) & ~use_bank
        rowflip = ((q == 2) | (q == 3)) & ~use_bank
        colflip = ((q == 1) | (q == 2)) & ~use_bank

        row_i = jnp.where(use_bank, brow, row_all[i])
        img = jax.lax.dynamic_index_in_dim(rows, row_i, keepdims=False)
        img = jnp.where(e.is_reflected[i] & ~use_bank, img[:, ::-1], img)
        img = jnp.where(use_t, jnp.swapaxes(img, 0, 1), img)
        imgf = img.astype(bf16)

        row_idx = jnp.where(rowflip, S - 1 - vi, vi)  # from screen y
        col_idx = jnp.where(colflip, S - 1 - ui, ui)  # from screen x

        R = ((row_idx[:, None] == arange_S[None, :]) & yvalid[:, None]).astype(
            bf16
        )
        C = ((col_idx[:, None] == arange_S[None, :]) & xvalid[:, None]).astype(
            bf16
        )
        # one-hot picks: every output element has exactly one nonzero term,
        # an integer <= 255, so bf16 accumulation is exact
        e1 = jnp.einsum("ph,hwc->pwc", R, imgf,
                        preferred_element_type=bf16)
        samp = jnp.einsum("qw,pwc->pqc", C, e1,
                          preferred_element_type=bf16).astype(f32)  # [y,x,4]

        cover = (yvalid[:, None] & xvalid[None, :]).astype(f32)
        fb = is_fallback[i]
        a = jnp.where(
            fb, cover, samp[..., 3] * (1.0 / 255.0) * e.alpha[i] * cover
        )
        rgb = jnp.where(fb, fallback_rgb[i][None, None, :], samp[..., :3])
        a = jnp.where(live_all[i], a, 0.0)

        # over-composite into this slot's render_z canvas only.  NOTE: a
        # dynamic_update_index_in_dim here lowers to a batched scatter under
        # vmap (measured 7s/frame at 8192 envs); the masked-where form stays
        # a dense select.
        src = jnp.concatenate([rgb, jnp.ones((res, res, 1), f32)], axis=-1)
        az = (a[None] * (zsel == e.render_z[i])[:, None, None])[..., None]
        return (src * az + canv.astype(f32) * (1 - az)).astype(bf16)

    init = jnp.zeros((nz, res, res, 4), bf16)
    if cap <= 16:
        # static unroll: XLA fuses the whole pool pass (a traced-count
        # while_loop costs ~15ms/iteration at 8192 envs from carry traffic)
        canv = init
        for i in range(cap):
            canv = body(i, canv)
        return canv
    return jax.lax.fori_loop(0, e.count, body, init)


def grid_tile_canvas(game, s, atlas):
    """Aligned per-env tile canvas: ``[NC*sA, NC*sA, 5]`` bf16 (RGBA +
    covered flag), plus the (top_y, low_x) cell-window origin.

    Shared by the XLA grid pass below and the Pallas kernel's prep (the
    kernel resamples this canvas with the identical separable picks, which
    is what keeps the two renderers bit-equal).
    """
    import numpy as np

    bf16 = jnp.bfloat16
    sA = atlas.tile_px
    rows_np = atlas.rows  # [n+1, sA, sA, 4]
    n1 = rows_np.shape[0]
    # 5th channel marks atlas-covered texels so the colored-rect path can
    # skip those cells
    aug = np.zeros((n1, sA, sA, 5), np.uint8)
    aug[..., :4] = rows_np
    aug[: atlas.transparent_row, ..., 4] = 255
    flat = jnp.asarray(aug.reshape(n1, -1), bf16)

    wmax, hmax = game.WORLD_DIM_MAX
    if game.center_agent:
        NC = int(game.visibility) + 3
        cx, cy, vis_d = game.camera(s)
        margin = vis_d / 2 + 1
        low_x = jnp.trunc(cx - margin).astype(i32)
        low_y = jnp.trunc(cy - margin).astype(i32)
        oob_val = game.out_of_bounds_object
    else:
        NC = max(wmax, hmax)
        low_x = jnp.zeros((), i32)
        low_y = jnp.zeros((), i32)
        oob_val = INVALID_OBJ

    top_y = low_y + NC
    cys = top_y - 1 - jnp.arange(NC)  # canvas rows: descending world y
    cxs = low_x + jnp.arange(NC)
    gt = _onehot_sample_grid(s.grid, cys, cxs, hmax, wmax, INVALID_OBJ)
    inb = ((cys >= 0) & (cys < s.main_height))[:, None] & (
        (cxs >= 0) & (cxs < s.main_width)
    )[None, :]
    gt = jnp.where(inb, gt, oob_val)

    img = game.image_for_type(s, gt)
    theme = game.theme_for_grid_obj(s, gt)
    img = jnp.where(gt == INVALID_OBJ, -1, img)
    row = atlas.row_for(img, game.mask_theme(img, theme))

    # one-hot picks of integers <= 255: bf16 accumulation is exact
    oh = (row.reshape(-1)[:, None] == jnp.arange(n1)[None, :]).astype(bf16)
    canvas = jnp.einsum(
        "ci,if->cf", oh, flat, preferred_element_type=bf16
    )  # [NC*NC, sA*sA*5]
    canvas = canvas.reshape(NC, NC, sA, sA, 5)
    canvas = jnp.transpose(canvas, (0, 2, 1, 3, 4)).reshape(
        NC * sA, NC * sA, 5
    )
    return canvas, top_y, low_x


def _paint_grid_tiles(game, s, obs, res, unit, vis, x_off, y_off, wxs, wys,
                      atlas):
    """Textured grid pass: aligned-canvas one-hot assembly + separable
    nearest resample (see render/atlas.py docstring)."""
    bf16 = jnp.bfloat16
    sA = atlas.tile_px
    canvas, top_y, low_x = grid_tile_canvas(game, s, atlas)
    NC = canvas.shape[0] // sA

    # separable nearest resample from canvas coords to output pixels
    cyx = (top_y.astype(f32) - wys) * sA  # [res] canvas row per pixel row
    cxx = (wxs - low_x.astype(f32)) * sA
    ri = jnp.clip(jnp.floor(cyx).astype(i32), 0, NC * sA - 1)
    ci = jnp.clip(jnp.floor(cxx).astype(i32), 0, NC * sA - 1)
    in_r = (cyx >= 0) & (cyx < NC * sA)
    in_c = (cxx >= 0) & (cxx < NC * sA)
    R = ((ri[:, None] == jnp.arange(NC * sA)[None, :]) & in_r[:, None]).astype(bf16)
    C = ((ci[:, None] == jnp.arange(NC * sA)[None, :]) & in_c[:, None]).astype(bf16)
    e1 = jnp.einsum("pa,abc->pbc", R, canvas, preferred_element_type=bf16)
    samp = jnp.einsum(
        "qb,pbc->pqc", C, e1, preferred_element_type=bf16
    ).astype(f32)

    alpha = samp[..., 3:4] / 255.0
    rgb = samp[..., :3]
    blended = jnp.round(obs.astype(f32) * (1 - alpha) + rgb * alpha).astype(i32)
    covered = samp[..., 4] > 127
    return blended, covered
