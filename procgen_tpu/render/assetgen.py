"""Procedural asset generation (reference: procgen/src/assetgen.cpp).

Two distinct jobs:

1. Offline sprite generation for ``use_generated_assets`` — runs on host at
   atlas-bake time on a *separate* RandGen stream (seeded
   ``fixed_asset_seed + type``, basic-abstract-game.cpp:101-110).
   Implemented in ``assetgen_host.bake_generated_asset``.

2. The per-reset procedural *background* (cpp:776-782), which consumes
   draws from the per-env level ``rand_gen`` — so the draw sequence must be
   replicated exactly on device to keep the mt19937 stream trajectory-exact.
   ``consume_background_draws`` below does that with a single bulk
   ``draw_block`` and a masked-cursor walk of AssetGen::generate_resource
   (num_recurse=1, blotch_scale=50, is_rect=true), painting a CAN x CAN
   canvas into ``state.bg_canvas`` along the way.

Draw-count bound (exact worst case):
  paint_shape             <= 10 + 2*6                = 22
  inner rect resource     <= 13 + 19*(4 + 22)        = 507   (nr=0, bs=10;
                             the p_recurse rand01 is short-circuited away)
  outer rect resource     <= 13 + 99*(4 + 1 + 507)   = 50701 (nr=1, bs=50)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import rng

i32 = jnp.int32
f32 = jnp.float32

CAN = 128  # canvas resolution (the reference paints 500x500, cpp:62)
REF = 500.0
N_MAX = 50704  # worst-case draws, rounded up a little

_SHAPE_MAX_SPLITS = 2  # num_splits = randn(10)^2 / 50 + 1  in {1, 2}
_INNER_MAX_BLOTCHES = 19  # randint(10, 20) <= 19
_OUTER_MAX_BLOTCHES = 99  # randint(50, 100) <= 99


def _grids():
    ys = (jnp.arange(CAN, dtype=f32) + 0.5) * (REF / CAN)  # 500-space centers
    return ys


def _fill_rect(canvas, rect, color, do, alpha=1.0):
    x, y, w, h = rect
    g = _grids()
    m = (
        ((g >= y) & (g < y + h))[:, None]
        & ((g >= x) & (g < x + w))[None, :]
        & do
    )
    src = jnp.asarray(color, f32)[None, None, :] * alpha + canvas * (1 - alpha)
    return jnp.where(m[..., None], src, canvas)


def _draw_ellipse(canvas, rect, brush, pen, do):
    x, y, w, h = rect
    a = jnp.maximum(w / 2, 1e-4)
    b = jnp.maximum(h / 2, 1e-4)
    cx = x + w / 2
    cy = y + h / 2
    g = _grids()
    dy2 = ((g - cy) / b) ** 2
    dx2 = ((g - cx) / a) ** 2
    d2 = dy2[:, None] + dx2[None, :]
    inside = (d2 <= 1.0) & do
    ai = jnp.maximum(a - 1.0, 0.0)
    bi = jnp.maximum(b - 1.0, 0.0)
    dy2i = ((g - cy) / jnp.maximum(bi, 1e-4)) ** 2
    dx2i = ((g - cx) / jnp.maximum(ai, 1e-4)) ** 2
    inner = ((dy2i[:, None] + dx2i[None, :]) <= 1.0) & (ai > 0) & (bi > 0)
    canvas = jnp.where(
        (inside & ~inner)[..., None], jnp.asarray(pen, f32)[None, None, :],
        canvas,
    )
    return jnp.where(
        (inside & inner)[..., None], jnp.asarray(brush, f32)[None, None, :],
        canvas,
    )


class _Cur:
    """Masked cursor over the bulk draw block (consume iff mask)."""

    @staticmethod
    def u32(vals, c, do):
        v = jax.lax.dynamic_index_in_dim(vals, c, keepdims=False)
        return v, c + do.astype(i32)

    @staticmethod
    def r01(vals, c, do):
        v, c = _Cur.u32(vals, c, do)
        return rng._rand01_from(v), c

    @staticmethod
    def rn(vals, c, n, do):
        v, c = _Cur.u32(vals, c, do)
        return rng._randn_from(v, n), c

    @staticmethod
    def rint(vals, c, lo, hi, do):
        v, c = _Cur.u32(vals, c, do)
        return rng._randint_from(v, lo, hi), c

    @staticmethod
    def rbool(vals, c, do):
        v, c = _Cur.r01(vals, c, do)
        return v > 0.5, c


def _roll(vals, c, do):
    """ColorGen::roll (assetgen.cpp:10-20): 7 draws."""
    lens = []
    for _ in range(3):
        v, c = _Cur.r01(vals, c, do)
        lens.append(v)
    starts = []
    for i in range(3):
        v, c = _Cur.r01(vals, c, do)
        starts.append(v * (1 - lens[i]))
    _, c = _Cur.r01(vals, c, do)  # p_rect (unused by the painters)
    return (jnp.stack(lens), jnp.stack(starts)), c


def _rand_color(vals, c, cgen, do):
    """ColorGen::rand_color (cpp:22-28): 3 draws."""
    lens, starts = cgen
    ch = []
    for i in range(3):
        v, c = _Cur.r01(vals, c, do)
        ch.append(jnp.floor(255.0 * (v * lens[i] + starts[i])))
    return jnp.stack(ch), c


def _choose_sub_rect(vals, c, rect, min_dim, max_dim, do):
    """cpp:35-51 (w/h truncated to int)."""
    x, y, w, h = rect
    wi = jnp.trunc(w)
    hi = jnp.trunc(h)
    smaller = jnp.where(wi > hi, hi, wi)
    del_dim = max_dim - min_dim
    v1, c = _Cur.r01(vals, c, do)
    v2, c = _Cur.r01(vals, c, do)
    v3, c = _Cur.r01(vals, c, do)
    v4, c = _Cur.r01(vals, c, do)
    rdx = (v1 * del_dim + min_dim) * smaller
    rdy = (v2 * del_dim + min_dim) * smaller
    rx_off = v3 * (wi - rdx)
    ry_off = v4 * (hi - rdy)
    return (rx_off + x, ry_off + y, rdx, rdy), c


def _paint_shape(canvas, vals, c, rect, cgen, do):
    """cpp:76-102."""
    k, c = _Cur.rn(vals, c, 10, do)
    num_splits = (k * k) // 50 + 1
    horiz, c = _Cur.rbool(vals, c, do)
    use_rect, c = _Cur.rbool(vals, c, do)
    regen, c = _Cur.rbool(vals, c, do)
    c1, c = _rand_color(vals, c, cgen, do)
    c2, c = _rand_color(vals, c, cgen, do)

    x, y, w, h = rect
    dw = w / num_splits.astype(f32)
    dh = h / num_splits.astype(f32)
    for i in range(_SHAPE_MAX_SPLITS):
        active = do & (i < num_splits)
        draw_colors = active & regen
        nc1, c = _rand_color(vals, c, cgen, draw_colors)
        nc2, c = _rand_color(vals, c, cgen, draw_colors)
        c1 = jnp.where(draw_colors, nc1, c1)
        c2 = jnp.where(draw_colors, nc2, c2)
        sub = (
            jnp.where(horiz, x + i * dw, x),
            jnp.where(horiz, y, y + i * dh),
            jnp.where(horiz, dw, w),
            jnp.where(horiz, h, dh),
        )
        rect_canvas = _fill_rect(canvas, sub, c1, active & use_rect)
        canvas = _draw_ellipse(rect_canvas, sub, c1, c2, active & ~use_rect)
    return canvas, c


def _paint_rect_inner(canvas, vals, c, rect, do):
    """cpp:104-132 with num_recurse=0, blotch_scale=10: the recursion check
    short-circuits before its rand01."""
    cgen, c = _roll(vals, c, do)
    bg, c = _rand_color(vals, c, cgen, do)
    canvas = _fill_rect(canvas, rect, bg, do)
    sc, c = _Cur.r01(vals, c, do)
    scale = 0.3 + 0.7 * sc
    nb, c = _Cur.rint(vals, c, 10, 20, do)
    _, c = _Cur.r01(vals, c, do)  # p_recurse (never compared at nr=0)

    def body(j, carry):
        canvas, c = carry
        active = do & (j < nb)
        sub, c = _choose_sub_rect(
            vals, c, rect, 0.05 * scale, 0.5 * scale, active
        )
        canvas, c = _paint_shape(canvas, vals, c, sub, cgen, active)
        return canvas, c

    canvas, c = jax.lax.fori_loop(0, _INNER_MAX_BLOTCHES, body, (canvas, c))
    canvas = _fill_rect(canvas, rect, bg, do, alpha=200.0 / 255.0)
    return canvas, c


def generate_background(vals):
    """AssetGen::generate_resource(img, 1, 50, true) over a 500x500 rect
    (cpp:184-195 + 104-132), returning (canvas u8[CAN,CAN,3], words_used)."""
    canvas = jnp.zeros((CAN, CAN, 3), f32)
    c = jnp.zeros((), i32)
    do = jnp.asarray(True)
    rect = (f32(0.0), f32(0.0), f32(REF), f32(REF))

    cgen, c = _roll(vals, c, do)
    bg, c = _rand_color(vals, c, cgen, do)
    canvas = _fill_rect(canvas, rect, bg, do)
    sc, c = _Cur.r01(vals, c, do)
    scale = 0.3 + 0.7 * sc
    nb, c = _Cur.rint(vals, c, 50, 100, do)
    p_recurse, c = _Cur.r01(vals, c, do)
    p_recurse = p_recurse * 0.75

    def body(j, carry):
        canvas, c = carry
        active = j < nb
        sub, c = _choose_sub_rect(
            vals, c, rect, 0.05 * scale, 0.5 * scale, active
        )
        rv, c = _Cur.r01(vals, c, active)  # num_recurse > 0 here: always drawn
        recurse = active & (rv < p_recurse)
        shape = active & ~recurse
        # both branches start at the same cursor; the survivor's count wins
        canvas_r, c_r = _paint_rect_inner(canvas, vals, c, sub, recurse)
        canvas_s, c_s = _paint_shape(canvas_r, vals, c, sub, cgen, shape)
        c = jnp.where(recurse, c_r, c_s)
        return canvas_s, c

    canvas, c = jax.lax.fori_loop(0, _OUTER_MAX_BLOTCHES, body, (canvas, c))
    canvas = _fill_rect(canvas, rect, bg, do, alpha=200.0 / 255.0)
    return jnp.clip(jnp.round(canvas), 0, 255).astype(jnp.uint8), c


def consume_background_draws(game, s):
    """Device-side AssetGen background (basic-abstract-game.cpp:776-782):
    exact rand_gen draw sequence + the painted canvas into state."""
    vals, ctx = rng.draw_block(s.rand_gen, N_MAX)
    canvas, used = generate_background(vals)
    g = rng.advance_block(s.rand_gen, ctx, used)
    return s.replace(rand_gen=g, bg_canvas=canvas)
