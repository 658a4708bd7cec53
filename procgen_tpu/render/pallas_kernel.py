"""Fused Pallas render kernel — the whole frame in VMEM.

The XLA renderer (render/renderer.py) expresses every sampling step as
one-hot matmuls, but at batch scale each pass materialises full-frame
intermediates in HBM ([N,64,64,*] per op), leaving the render memory-bound
(~27 GB accessed / frame batch at N=4096).  This kernel runs the identical
math — background crop -> z=-1 sprites -> grid tiles -> colored cells ->
z=0/1 sprites — per env inside one Pallas program, so the only HBM traffic
is the small per-env inputs, the resident atlases, and the final
[N,3,64,64] uint8 planes.

Bit-parity with the XLA path is a design invariant, not an accident:

* every texel fetch is a one-hot matmul whose output elements have exactly
  one nonzero term, an integer <= 255, so bf16 accumulation is exact in
  both backends;
* index arithmetic, blend formulas, rounding points, and the per-slot bf16
  canvas round-trip are copied operation-for-operation from renderer.py;
* all game polymorphism (hooks: image_for_type, color_for_type, themes,
  rect adjustment, tile ratios, camera) is evaluated OUTSIDE the kernel on
  [N, cap] / [N, NC, NC] shapes by `prep` (cheap), so one generic kernel
  serves every game.

Geometry reference: basic-abstract-game.cpp:828-1021 (QPainter pipeline).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from ..core.constants import INVALID_OBJ, SPACE
from . import renderer as xr
from .atlas import get_atlases

# Perf-ablation hook (tools/profile_render.py): comma list of passes to skip
# (bg, sprite, grid, cell).  Debug-only — skipping breaks bit-parity.
_ABLATE = frozenset(
    filter(None, os.environ.get("PROCGEN_TPU_KERNEL_ABLATE", "").split(","))
)

f32 = jnp.float32
i32 = jnp.int32
bf16 = jnp.bfloat16
u8 = jnp.uint8
# Plan constants are stored as NUMPY (converted at use): a plan built while
# tracing would otherwise cache tracers and poison later jits of other envs
_np_bf16 = np.dtype(jnp.bfloat16.dtype)

RES = 64

# ent_f columns
EF_X0, EF_Y0, EF_W2, EF_H2, EF_ALPHA, EF_R, EF_G, EF_B = range(8)
EF_N = 8
# ent_i columns
(EI_ROW, EI_LIVE, EI_FB, EI_PFLIP, EI_QFLIP, EI_Z, EI_NTH, EI_NTV,
 EI_TILEH, EI_TILEV) = range(10)
EI_N = 10

# scalar columns (f32)
(SF_UNIT, SF_VIS, SF_XOFF, SF_YOFF, SF_MRX, SF_MRY, SF_MRW, SF_MRH,
 SF_BGRX, SF_BGRW, SF_TILEH, SF_TOPY, SF_LOWX) = range(13)
SF_N = 13
# scalar columns (i32)
SI_BGROW, SI_ENT_COUNT, SI_DEC_COUNT = range(3)
SI_N = 3


class PallasPlan:
    """Static (per game, per res) compilation plan + device-resident atlases."""

    def __init__(self, game, res: int):
        assert res == RES, "pallas renderer is 64x64 only (v1)"
        grid_atlas, bg_atlas, ent_atlas = get_atlases(game, res)
        self.game = game
        self.res = res
        self.grid_atlas = grid_atlas
        self.bg_atlas = bg_atlas
        self.ent_atlas = ent_atlas

        wmax, hmax = game.WORLD_DIM_MAX
        if game.center_agent:
            self.NC = int(game.visibility) + 3
        else:
            self.NC = max(wmax, hmax)
        # static-prefix games: bg+grid+cells come precomposed in
        # state.frame (see renderer.render_obs docstring) — the kernel
        # starts from that base and runs only the sprite suffix
        self.static = bool(game.static_prefix)
        self.cap = game.ENT_CAP
        self.dcap = game.DECOR_CAP
        self.z_levels = tuple(game.ENT_Z_LEVELS)
        self.dz_levels = tuple(game.DECOR_Z_LEVELS)

        self.procgen_bg = game.uses_procgen_background
        # --- background atlas: planar bf16 [3*nb*BH, BW] ------------------
        if self.procgen_bg:
            from . import assetgen as _ag

            self.BH = self.BW = _ag.CAN
            self.nb = 1
            self.bg_flat = np.zeros((1, 1), _np_bf16)  # source is per-env
            self.bg_aspects = np.ones((1,), np.float32)
        elif bg_atlas is not None:
            self.BH, self.BW = bg_atlas.BH, bg_atlas.BW
            self.nb = bg_atlas.pixels.shape[0]
            pix = bg_atlas.pixels.astype(np.float32)  # [nb, BH, BW, 3]
            self.bg_flat = np.transpose(pix, (3, 0, 1, 2)).reshape(
                3 * self.nb * self.BH, self.BW
            ).astype(_np_bf16)
            self.bg_aspects = np.asarray(bg_atlas.aspects, np.float32)
        else:
            self.BH = self.BW = 8
            self.nb = 1
            self.bg_flat = np.zeros((3 * 8, 8), _np_bf16)
            self.bg_aspects = np.ones((1,), np.float32)

        # --- grid tiles: resampled in-kernel from a per-env aligned canvas
        # built by prep (renderer.grid_tile_canvas) — [5, GS, GS] planar
        # bf16 (RGBA + covered), GS = NC*sA ----------------------------------
        if grid_atlas is not None:
            self.sA = grid_atlas.tile_px
            self.n1g = grid_atlas.rows.shape[0] - 1  # excl. transparent row
            self.GS = self.NC * self.sA
        else:
            self.sA = 2
            self.n1g = 0
            self.GS = 1  # placeholder canvas (5, 1, 1)

        # --- entity atlas + transposed variants: planar [4*2*n1e*S, S] ----
        if ent_atlas is not None:
            self.S = ent_atlas.tile_px
            rows = ent_atlas.rows.astype(np.float32)  # [n1e+1, S, S, 4]
            self.n1e = rows.shape[0]  # keep transparent row (harmless)
            both = np.concatenate(
                [rows, np.transpose(rows, (0, 2, 1, 3))], axis=0
            )  # [2*n1e, S, S, 4]
            # rows: variant*S + p; cols: channel*S + q — so one dynamic
            # slice + one [SLAB,S]x[S,4S] matmul samples all 4 channels
            self.ent_flat = np.transpose(both, (0, 1, 3, 2)).reshape(
                2 * self.n1e * self.S, 4 * self.S
            ).astype(_np_bf16)
            # group-pass layout: rows = variant*4S + channel*S + p, cols =
            # q — the column-resample matmul [4S,S]x[S,res] samples all 4
            # channels of one variant in a single MXU pass
            self.ent_flat4 = np.transpose(both, (0, 3, 1, 2)).reshape(
                2 * self.n1e * 4 * self.S, self.S
            ).astype(_np_bf16)
        else:
            self.S = 2
            self.n1e = 1
            self.ent_flat = np.zeros((2 * 1 * 2, 4 * 2), _np_bf16)
            self.ent_flat4 = np.zeros((2 * 1 * 4 * 2, 2), _np_bf16)

        # --- sprite group scheduling config (render/sprite_groups.py):
        # pools big enough to be op-issue-bound take the grouped pass;
        # small pools keep the cheap per-slot unroll
        self.CAPK = 8

        def g_max(pool_cap):
            return int(min(pool_cap, max(8, -(-pool_cap * 3 // (2 * self.CAPK)))))

        flag = os.environ.get("PROCGEN_TPU_SPRITE_GROUPS", "1") != "0"
        self.groups_e = flag and ent_atlas is not None and self.cap > 16
        self.groups_d = (
            flag and ent_atlas is not None and bool(self.dcap)
            and self.dcap > 16
        )
        self.G_MAX_E = g_max(self.cap) if self.groups_e else 1
        self.G_MAX_D = g_max(self.dcap) if self.groups_d else 1
        self.NST_E = len(self.z_levels) * self.G_MAX_E
        self.NST_D = len(self.dz_levels) * self.G_MAX_D
        # extra SMEM scalar columns: per-z used-group counts + legacy
        # counts for both pools (zero-filled when a pool isn't grouped)
        nz = len(self.z_levels)
        nzd = len(self.dz_levels)
        self.SI_USED_E = SI_N
        self.SI_LEG_E = SI_N + nz
        self.SI_USED_D = SI_N + nz + 1
        self.SI_LEG_D = SI_N + nz + 1 + nzd
        self.SI_TOTAL = SI_N + nz + nzd + 2


_PLANS: dict = {}


def get_plan(game, res: int) -> PallasPlan:
    key = (game.name, game.options.distribution_mode, res, id(type(game)),
           game.options.use_generated_assets and int(game.fixed_asset_seed),
           game.options.use_monochrome_assets)
    if key not in _PLANS:
        _PLANS[key] = PallasPlan(game, res)
    return _PLANS[key]


def supports(game, res: int = RES) -> bool:
    """Gate: games whose render path the kernel reproduces exactly."""
    if res != RES:
        return False
    if (game.PALLAS_BG == "standard"
            and type(game).paint_background is not _base_paint_background()):
        return False  # unknown custom background
    if type(game).grid_cell_colors not in _known_cell_colors():
        return False  # per-pixel cell patterns beyond the inset model
    if game.center_agent and getattr(game, "DYNAMIC_VISIBILITY", False):
        return False
    return True


@functools.lru_cache(maxsize=1)
def _base_paint_background():
    from ..core.game import BasicAbstractGame

    return BasicAbstractGame.paint_background


@functools.lru_cache(maxsize=1)
def _known_cell_colors():
    from ..core.game import BasicAbstractGame

    known = [BasicAbstractGame.grid_cell_colors]
    try:
        from ..games.chaser import Chaser

        known.append(Chaser.grid_cell_colors)
    except Exception:  # pragma: no cover
        pass
    return tuple(known)


# ---------------------------------------------------------------------------
# prep: all game hooks evaluated at [N, cap] / [N, NC, NC] scale
# ---------------------------------------------------------------------------


def _prep_one(plan: PallasPlan, s):
    """Single-env kernel inputs (vmapped by the caller)."""
    game = plan.game
    res = plan.res
    NC = plan.NC

    w = s.main_width.astype(f32)
    h = s.main_height.astype(f32)
    if game.center_agent:
        cx, cy, vis = game.camera(s)
    else:
        cx = w * 0.5
        cy = h * 0.5
        vis = jnp.maximum(jnp.maximum(w, h), f32(game.min_visibility))
    unit = res / vis
    x_off = unit * (cx - vis / 2)
    y_off = unit * (cy - vis / 2)

    sf = jnp.zeros((SF_N,), f32)
    si = jnp.zeros((plan.SI_TOTAL,), i32)
    sf = sf.at[SF_UNIT].set(unit).at[SF_VIS].set(vis)
    sf = sf.at[SF_XOFF].set(x_off).at[SF_YOFF].set(y_off)

    # background rect scalars (renderer._paint_background /
    # starpilot.paint_background for the scroll mode)
    if ((plan.bg_atlas is not None or plan.procgen_bg)
            and game.options.use_backgrounds):
        mr_x = -x_off
        mr_y = (vis - h) * unit + y_off
        mr_w = w * unit
        mr_h = h * unit
        sf = sf.at[SF_MRX].set(mr_x).at[SF_MRY].set(mr_y)
        sf = sf.at[SF_MRW].set(mr_w).at[SF_MRH].set(mr_h)
        bi = jnp.clip(s.background_index, 0, plan.nb - 1)
        si = si.at[SI_BGROW].set(bi)
        if plan.procgen_bg:
            # per-level painted canvas: square, aspect ratio 1 (renderer:94)
            bg_ar = f32(1.0)
            world_ar = w / h
            extra_w = bg_ar - world_ar
            offx = s.bg_pct_x * extra_w
            sf = sf.at[SF_BGRX].set(mr_x + mr_w * (-offx))
            sf = sf.at[SF_BGRW].set(mr_w * bg_ar / world_ar)
        elif game.PALLAS_BG == "scroll":
            scale = f32(res) / h
            sf = sf.at[SF_BGRX].set(
                -s.cur_time.astype(f32) * scale * game.hp_slow_v * 2.0 / 5.0
            )
        elif game.bg_tile_ratio < 0:
            ratio = -game.bg_tile_ratio
            num_tiles = jnp.maximum((mr_h / (mr_w * ratio)).astype(i32), 1)
            sf = sf.at[SF_TILEH].set(mr_h / num_tiles.astype(f32))
        else:
            bg_ar = jnp.asarray(plan.bg_aspects)[bi]
            world_ar = w / h
            extra_w = bg_ar - world_ar
            offx = s.bg_pct_x * extra_w
            sf = sf.at[SF_BGRX].set(mr_x + mr_w * (-offx))
            sf = sf.at[SF_BGRW].set(mr_w * bg_ar / world_ar)

    si = si.at[SI_ENT_COUNT].set(s.ents.count)
    if plan.dcap:
        si = si.at[SI_DEC_COUNT].set(s.decor.count)

    if plan.static:
        # bg/grid/cell layers are precomposed in state.frame; only the
        # sprite-pool prep below is needed
        gcanvas = jnp.zeros((5, 1, 1), u8)
        cell5 = jnp.zeros((5, 1, 1), f32)
        bgc = jnp.zeros((3, 1, 1), jnp.bfloat16)
        si, pools = _pools_prep(plan, s, si, res, unit, vis, x_off, y_off)
        out = dict(
            sf=sf, si=si, gcanvas=gcanvas, cell5=cell5, bgc=bgc, **pools
        )
        out["base"] = jnp.transpose(s.frame, (2, 0, 1))  # [3,res,res] u8
        return out

    # grid cell window (renderer._paint_grid_tiles)
    wmax, hmax = game.WORLD_DIM_MAX
    if game.center_agent:
        margin = vis / 2 + 1
        low_x = jnp.trunc(cx - margin).astype(i32)
        low_y = jnp.trunc(cy - margin).astype(i32)
        oob_val = game.out_of_bounds_object
    else:
        low_x = jnp.zeros((), i32)
        low_y = jnp.zeros((), i32)
        oob_val = INVALID_OBJ
    top_y = low_y + NC
    sf = sf.at[SF_TOPY].set(top_y.astype(f32))
    sf = sf.at[SF_LOWX].set(low_x.astype(f32))

    cys = top_y - 1 - jnp.arange(NC)
    cxs = low_x + jnp.arange(NC)
    gt = xr._onehot_sample_grid(s.grid, cys, cxs, hmax, wmax, INVALID_OBJ)
    inb = ((cys >= 0) & (cys < s.main_height))[:, None] & (
        (cxs >= 0) & (cxs < s.main_width)
    )[None, :]
    gt = jnp.where(inb, gt, oob_val)

    # per-env aligned tile canvas (renderer.grid_tile_canvas): the kernel
    # resamples it with the identical separable picks, planar [5, GS, GS]
    if plan.grid_atlas is not None:
        canvas, _, _ = xr.grid_tile_canvas(s=s, game=game, atlas=plan.grid_atlas)
        # u8 halves the HBM traffic of the per-env canvas; values are exact
        # u8 integers so the kernel-side bf16 cast loses nothing
        gcanvas = jnp.transpose(canvas, (2, 0, 1)).astype(u8)
    else:
        gcanvas = jnp.zeros((5, 1, 1), u8)

    # colored-cell planes: r,g,b,valid,inset (cell-center evaluation;
    # chaser's orb inset is the only per-pixel pattern, grid_cell_inset)
    cv, cr, cg, cb = game.grid_cell_colors(
        s, gt, jnp.full((NC, NC), 0.5, f32), jnp.full((NC, NC), 0.5, f32)
    )
    inset = game.grid_cell_inset(s, gt)
    cell5 = jnp.stack(
        [
            jnp.broadcast_to(jnp.asarray(cr, f32), (NC, NC)),
            jnp.broadcast_to(jnp.asarray(cg, f32), (NC, NC)),
            jnp.broadcast_to(jnp.asarray(cb, f32), (NC, NC)),
            jnp.broadcast_to(cv.astype(f32), (NC, NC)),
            jnp.broadcast_to(jnp.asarray(inset, f32), (NC, NC)),
        ],
        axis=0,
    )  # [5, NC, NC]

    if plan.procgen_bg and s.bg_canvas is not None:
        bgc = jnp.transpose(s.bg_canvas, (2, 0, 1)).astype(jnp.bfloat16)
    else:
        bgc = jnp.zeros((3, 1, 1), jnp.bfloat16)

    si, pools = _pools_prep(plan, s, si, res, unit, vis, x_off, y_off)
    return dict(sf=sf, si=si, gcanvas=gcanvas, cell5=cell5, bgc=bgc, **pools)


def _pools_prep(plan, s, si, res, unit, vis, x_off, y_off):
    """Shared sprite-pool prep: per-slot params + group tables."""
    game = plan.game
    out = {}
    ent_f, ent_i, raw_e = _prep_pool(
        plan, s, s.ents, game.should_draw_entity_mask(s), plan.z_levels,
        res, unit, vis, x_off, y_off,
    )
    out["ent_f"], out["ent_i"] = ent_f, ent_i
    if plan.dcap:
        dec_f, dec_i, raw_d = _prep_pool(
            plan, s, s.decor, None, plan.dz_levels, res, unit, vis, x_off,
            y_off,
        )
    else:
        dec_f = jnp.zeros((1, EF_N), f32)
        dec_i = jnp.zeros((1, EI_N), i32)
        raw_d = None
    out["dec_f"], out["dec_i"] = dec_f, dec_i

    from . import sprite_groups as sg

    def tables(raw, z_levels, G_MAX):
        srow, qcol = sg.index_maps(
            res, plan.S, raw["x0"], raw["y0"], raw["w2"], raw["h2"],
            raw["nth"], raw["ntv"], raw["tileh"], raw["tilev"],
            raw["pflip"], raw["qflip"],
        )
        return sg.schedule(
            res, plan.S, len(z_levels), G_MAX, plan.CAPK, srow, qcol,
            raw["z_idx"], raw["live"], raw["fb"], raw["alpha"],
            raw["row2"],
        )

    if plan.groups_e:
        t = tables(raw_e, plan.z_levels, plan.G_MAX_E)
        out["eg_prow"] = t.prow
        out["eg_alpha"] = t.alpha
        out["eg_memb"] = jnp.concatenate([t.memberq, t.mrow2], axis=1)
        out["eg_qcol"] = t.qcol
        out["eg_legacy"] = t.legacy_ids
        for z in range(len(plan.z_levels)):
            si = si.at[plan.SI_USED_E + z].set(t.used[z])
        si = si.at[plan.SI_LEG_E].set(t.legacy_count)
    if plan.groups_d:
        t = tables(raw_d, plan.dz_levels, plan.G_MAX_D)
        out["dg_prow"] = t.prow
        out["dg_alpha"] = t.alpha
        out["dg_memb"] = jnp.concatenate([t.memberq, t.mrow2], axis=1)
        out["dg_qcol"] = t.qcol
        out["dg_legacy"] = t.legacy_ids
        for z in range(len(plan.dz_levels)):
            si = si.at[plan.SI_USED_D + z].set(t.used[z])
        si = si.at[plan.SI_LEG_D].set(t.legacy_count)
    return si, out


def _prep_pool(plan, s, pool, mask, z_levels, res, unit, vis, x_off, y_off):
    """Per-slot sprite parameters, mirroring renderer._sprite_canvases."""
    game = plan.game
    e = pool
    cap = e.cap
    S = plan.S

    img_all = game.image_for_type(s, e.image_type)
    live_all = e.active & (img_all >= 0) & (img_all != SPACE)
    if mask is not None:
        live_all &= mask
    if plan.ent_atlas is not None:
        row_all = plan.ent_atlas.row_for(
            img_all, game.mask_theme(img_all, e.image_theme)
        )
        is_fallback = row_all == plan.ent_atlas.transparent_row
    else:
        row_all = jnp.zeros((cap,), i32)
        is_fallback = jnp.ones((cap,), bool)
    tile_ratio_all = game.entity_tile_ratio(s, e)

    x0_w = (e.x - e.rx) * unit - x_off
    y0_w = (vis - (e.y + e.ry)) * unit + y_off
    w2_w = 2 * e.rx * unit
    h2_w = 2 * e.ry * unit
    x0_a = res * (e.x - e.rx)
    y0_a = res * (e.y + e.ry)
    w2_a = 2 * res * e.rx
    h2_a = 2 * res * e.ry
    x0 = jnp.where(e.use_abs_coords, x0_a, x0_w)
    y0 = jnp.where(e.use_abs_coords, y0_a, y0_w)
    w2 = jnp.where(e.use_abs_coords, w2_a, w2_w)
    h2 = jnp.where(e.use_abs_coords, h2_a, h2_w)
    x0, y0, w2, h2 = game.adjust_image_rect(img_all, x0, y0, w2, h2)
    w2 = jnp.maximum(w2, 1e-6)
    h2 = jnp.maximum(h2, 1e-6)

    fr, fg, fb = game.color_for_type(img_all, e.image_theme)

    # rotation quarter + reflection -> atlas variant + index flips.
    # XLA order: reflect img (flip source x), then maybe transpose, then
    # sample at (row_idx, col_idx) with rot flips.  Deriving the sample
    # source index: with T the transposed atlas variant,
    #   use_t=0: orig[row_idx, refl ? S-1-col_idx : col_idx]
    #   use_t=1: origT[refl ? S-1-row_idx : row_idx, col_idx]
    # so pflip = rowflip ^ (use_t & refl), qflip = colflip ^ (~use_t & refl).
    # Non-quarter angles pick the pre-rotated bank row (reflection baked),
    # no flips — identical selection logic to renderer._sprite_canvases.
    qf = e.rotation * (2.0 / jnp.pi)
    q = jnp.round(qf).astype(i32) % 4
    refl = e.is_reflected
    if plan.ent_atlas is not None:
        arb = jnp.abs(qf - jnp.round(qf)) > 1e-4
        brow, has_bank = plan.ent_atlas.bank_row_for(
            row_all, refl.astype(i32), e.rotation
        )
        use_bank = arb & has_bank
    else:
        use_bank = jnp.zeros(jnp.shape(q), bool)
        brow = row_all

    # banked draws enlarge the rect by the bank tile's sqrt(2) footprint
    # (atlas.ROT_OVERHANG) — identical math to renderer._sprite_canvases
    from .atlas import ROT_OVERHANG

    grow = jnp.where(use_bank, f32(ROT_OVERHANG), f32(1.0))
    x0 = x0 - w2 * (grow - 1.0) * 0.5
    y0 = y0 - h2 * (grow - 1.0) * 0.5
    w2 = jnp.maximum(w2 * grow, 1e-6)
    h2 = jnp.maximum(h2 * grow, 1e-6)
    use_t = ((q == 1) | (q == 3)) & ~use_bank
    rowflip = ((q == 2) | (q == 3)) & ~use_bank
    colflip = ((q == 1) | (q == 2)) & ~use_bank
    refl = refl & ~use_bank
    pflip = rowflip ^ (use_t & refl)
    qflip = colflip ^ (~use_t & refl)
    row2 = jnp.where(
        use_bank, brow, row_all + jnp.where(use_t, plan.n1e, 0)
    )

    tr = tile_ratio_all
    nt_h = jnp.maximum((w2 / (h2 * jnp.maximum(tr, 1e-6))).astype(i32), 1)
    nt_v = jnp.maximum((h2 / (w2 * jnp.maximum(-tr, 1e-6))).astype(i32), 1)

    zl = jnp.asarray(z_levels, i32)
    z_idx = jnp.full((cap,), -1, i32)
    for j, z in enumerate(z_levels):
        z_idx = jnp.where(e.render_z == z, j, z_idx)

    ent_f = jnp.stack(
        [x0, y0, w2, h2, e.alpha,
         jnp.broadcast_to(jnp.asarray(fr, f32), (cap,)),
         jnp.broadcast_to(jnp.asarray(fg, f32), (cap,)),
         jnp.broadcast_to(jnp.asarray(fb, f32), (cap,))],
        axis=-1,
    )
    ent_i = jnp.stack(
        [row2, live_all.astype(i32), is_fallback.astype(i32),
         pflip.astype(i32), qflip.astype(i32), z_idx, nt_h, nt_v,
         (tr > 0).astype(i32), (tr < 0).astype(i32)],
        axis=-1,
    )
    raw = dict(
        x0=x0, y0=y0, w2=w2, h2=h2, alpha=e.alpha, row2=row2,
        pflip=pflip, qflip=qflip, nth=nt_h, ntv=nt_v,
        tileh=tr > 0, tilev=tr < 0, live=live_all, fb=is_fallback,
        z_idx=z_idx,
    )
    return ent_f, ent_i, raw


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _make_kernel(plan: PallasPlan, B: int):
    res = plan.res
    NC = plan.NC
    S = plan.S
    sA = plan.sA
    BH, BW, nb = plan.BH, plan.BW, plan.nb
    n1g, n1e = plan.n1g, plan.n1e
    cap, dcap = plan.cap, plan.dcap
    nz = len(plan.z_levels)
    nzd = len(plan.dz_levels)
    static = plan.static
    use_bg = ((plan.bg_atlas is not None or plan.procgen_bg)
              and plan.game.options.use_backgrounds
              and "bg" not in _ABLATE and not static)
    bg_tiled = plan.game.bg_tile_ratio < 0
    bg_scroll = plan.game.PALLAS_BG == "scroll"
    bg_procgen = plan.procgen_bg
    has_grid_tex = (plan.grid_atlas is not None and n1g > 0
                    and "grid" not in _ABLATE and not static)

    # pixel-center screen coordinates, as column [res,1] / row [1,res]
    def iota_col(n):
        return jax.lax.broadcasted_iota(i32, (n, 1), 0)

    def iota_row(n):
        return jax.lax.broadcasted_iota(i32, (1, n), 1)

    groups_e, groups_d = plan.groups_e, plan.groups_d
    any_groups = groups_e or groups_d
    CAPK = plan.CAPK

    def kernel(sf_ref, si_ref, gcanvas_ref, cell5_ref, entf_ref, enti_ref,
               decf_ref, deci_ref, bgc_ref, bg_ref, ent_ref, *rest):
        rest = list(rest)
        ent4_ref = rest.pop(0) if any_groups else None
        eg = [rest.pop(0) for _ in range(5)] if groups_e else None
        dg = [rest.pop(0) for _ in range(5)] if groups_d else None
        base_ref = rest.pop(0) if static else None
        if any_groups:
            out_ref, ecanv_ref, dcanv_ref, gscr_ref = rest
            # unwritten member regions of the group scratch must be
            # finite: a NaN anywhere in the contraction poisons the
            # row-gather matmul even under zero coefficients
            gscr_ref[...] = jnp.zeros((4 * CAPK * plan.S, res), bf16)
        else:
            out_ref, ecanv_ref, dcanv_ref = rest
            gscr_ref = None

        # B envs per program: amortizes per-program pipeline overhead
        def render_one(b, _):
            return _render_env(
                b, sf_ref, si_ref, gcanvas_ref, cell5_ref, entf_ref,
                enti_ref, decf_ref, deci_ref, bgc_ref, bg_ref,
                ent_ref, ent4_ref, eg, dg, gscr_ref,
                base_ref, out_ref, ecanv_ref, dcanv_ref,
            )

        jax.lax.fori_loop(0, B, render_one, 0)

    def _render_env(b, sf_ref, si_ref, gcanvas_ref, cell5_ref, entf_ref,
                    enti_ref, decf_ref, deci_ref, bgc_ref, bg_ref,
                    ent_ref, ent4_ref, eg, dg, gscr_ref,
                    base_ref, out_ref, ecanv_ref, dcanv_ref):
        unit = sf_ref[b, 0, SF_UNIT]
        vis = sf_ref[b, 0, SF_VIS]
        x_off = sf_ref[b, 0, SF_XOFF]
        y_off = sf_ref[b, 0, SF_YOFF]

        sy = iota_col(res).astype(f32) + 0.5  # [res,1] screen y
        sx_r = iota_row(res).astype(f32) + 0.5  # [1,res] screen x
        wys = vis - (sy - y_off) / unit  # [res,1] world y per pixel row
        wxs = (sx_r + x_off) / unit  # [1,res] world x per pixel col

        # ---- background (renderer._paint_background) --------------------
        if use_bg:
            mr_x = sf_ref[b, 0, SF_MRX]
            mr_y = sf_ref[b, 0, SF_MRY]
            mr_w = sf_ref[b, 0, SF_MRW]
            mr_h = sf_ref[b, 0, SF_MRH]
            if bg_scroll and not bg_procgen:
                # starpilot time-scrolled tiles (starpilot.cpp:107-122)
                bg_xoff = sf_ref[b, 0, SF_BGRX]
                side = 3.0 * res
                tx = sx_r - bg_xoff
                fx = tx / side
                col_idx = jnp.clip(
                    ((fx - jnp.floor(fx)) * BW).astype(i32), 0, BW - 1
                )
                in_x = (tx >= 0) & (tx < 18.0 * side)
                row_idx = jnp.clip(
                    ((sy + f32(res)) / side * BH).astype(i32), 0, BH - 1
                )
                in_y = sy > -jnp.inf
            elif bg_tiled:
                tile_h = sf_ref[b, 0, SF_TILEH]
                fy = (sy - mr_y) / tile_h
                frac_y = fy - jnp.floor(fy)
                row_idx = jnp.clip((frac_y * BH).astype(i32), 0, BH - 1)
                col_idx = jnp.clip(
                    ((sx_r - mr_x) / mr_w * BW).astype(i32), 0, BW - 1
                )
                in_y = (sy >= mr_y) & (sy < mr_y + mr_h)
                in_x = (sx_r >= mr_x) & (sx_r < mr_x + mr_w)
            else:
                bgr_x = sf_ref[b, 0, SF_BGRX]
                bgr_w = sf_ref[b, 0, SF_BGRW]
                row_idx = jnp.clip(
                    ((sy - mr_y) / mr_h * BH).astype(i32), 0, BH - 1
                )
                col_idx = jnp.clip(
                    ((sx_r - bgr_x) / bgr_w * BW).astype(i32), 0, BW - 1
                )
                in_y = (sy >= mr_y) & (sy < mr_y + mr_h)
                in_x = (sx_r >= bgr_x) & (sx_r < bgr_x + bgr_w)

            R = (
                (row_idx == jax.lax.broadcasted_iota(i32, (res, BH), 1))
                & in_y
            ).astype(bf16)  # [res, BH]
            Ct = (
                (jax.lax.broadcasted_iota(i32, (BW, res), 0) == col_idx)
                & in_x
            ).astype(bf16)  # [BW, res]
            bgrow = si_ref[b, 0, SI_BGROW]
            obs = []
            for c in range(3):
                if bg_procgen:
                    img_c = bgc_ref[b, c]  # per-env painted canvas
                else:
                    img_c = bg_ref[pl.ds((c * nb + bgrow) * BH, BH), :]
                t1 = jnp.dot(R, img_c, preferred_element_type=f32)
                obs.append(jnp.dot(t1, Ct, preferred_element_type=f32))
            obs = jnp.stack(obs)  # [3,res,res]: channel ops fuse downstream
        elif static:
            # precomposed static prefix (bg+grid+cells) from state.frame
            obs = base_ref[b].astype(i32).astype(f32)
        else:
            obs = jnp.zeros((3, res, res), f32)

        # ---- entity sprite canvases (both pools, one pass each) ---------
        # canvas layout [nz, res, 4*res]: RGBA interleaved in lanes so a
        # blend touches one contiguous window
        def zero(ref, n):
            ref[...] = jnp.zeros((n, res, 4 * res), f32)

        zero(ecanv_ref, nz)
        if dcap:
            zero(dcanv_ref, nzd)

        SLAB = 32  # row band per sprite blend; res/SLAB passes for tall ones

        def sprite_pass(n_slots, f_ref, i_ref, canv_ref, nz_pool, count,
                        leg_ref=None):
            def slot_body(i):
                if "sprite_scalar" in _ABLATE:  # debug: measure scalar-read cost
                    live = jnp.int32(1)
                    zi = jnp.int32(0)
                    x0, y0 = f32(5.0), f32(5.0)
                    w2, h2 = f32(3.0), f32(3.0)
                else:
                    live = i_ref[b, i, EI_LIVE]
                    zi = i_ref[b, i, EI_Z]
                    x0 = f_ref[b, i, EF_X0]
                    y0 = f_ref[b, i, EF_Y0]
                    w2 = f_ref[b, i, EF_W2]
                    h2 = f_ref[b, i, EF_H2]
                u = (sx_r - x0) / w2  # [1,res]
                xvalid = (u >= 0) & (u < 1)
                ut = u * i_ref[b, i, EI_NTH].astype(f32)
                u_ = jnp.where(
                    i_ref[b, i, EI_TILEH] > 0, ut - jnp.floor(ut), u
                )
                ui = jnp.clip((u_ * S).astype(i32), 0, S - 1)
                qidx = jnp.where(
                    i_ref[b, i, EI_QFLIP] > 0, S - 1 - ui, ui
                )  # [1,res]
                Cxt = (
                    (jax.lax.broadcasted_iota(i32, (S, res), 0) == qidx)
                    & xvalid
                ).astype(bf16)

                if "sprite_scalar" in _ABLATE:
                    fb = jnp.asarray(False)
                    row2 = jnp.int32(0)
                    alpha_e = f32(1.0)
                    pflip = jnp.asarray(False)
                    tilev = jnp.asarray(False)
                    ntv = f32(1.0)
                else:
                    fb = i_ref[b, i, EI_FB] > 0
                    row2 = i_ref[b, i, EI_ROW]
                    alpha_e = f_ref[b, i, EF_ALPHA]
                    pflip = i_ref[b, i, EI_PFLIP] > 0
                    tilev = i_ref[b, i, EI_TILEV] > 0
                    ntv = i_ref[b, i, EI_NTV].astype(f32)
                on = (live > 0) & (zi >= 0)
                zc = jnp.clip(zi, 0, nz_pool - 1)

                def do_slab(start):
                    # rows [start, start+SLAB): blending rows where the
                    # sprite has a=0 is an exact identity through the bf16
                    # round-trip, so restricting to a band that contains
                    # every yvalid row is bit-neutral
                    sy_s = (
                        jax.lax.broadcasted_iota(i32, (SLAB, 1), 0) + start
                    ).astype(f32) + 0.5  # [SLAB,1]
                    v = (sy_s - y0) / h2
                    yvalid = (v >= 0) & (v < 1)
                    vt = v * ntv
                    v_ = jnp.where(tilev, vt - jnp.floor(vt), v)
                    vi = jnp.clip((v_ * S).astype(i32), 0, S - 1)
                    pidx = jnp.where(pflip, S - 1 - vi, vi)  # [SLAB,1]
                    Ry = (
                        (pidx == jax.lax.broadcasted_iota(i32, (SLAB, S), 1))
                        & yvalid
                    ).astype(bf16)

                    cover = (yvalid & xvalid).astype(f32)  # [SLAB,res]

                    # one slice + one wide matmul samples R,G,B,A rows at
                    # once ([SLAB,S]x[S,4S]); per-element results are
                    # bit-identical to the per-channel form (one-hot rows
                    # pick single texels)
                    if "sprite_matmul" not in _ABLATE:
                        img4 = ent_ref[pl.ds(row2 * S, S), :]
                        t1 = jnp.dot(Ry, img4, preferred_element_type=f32)

                    def samp(ch_base):
                        if "sprite_matmul" in _ABLATE:  # debug
                            return cover
                        return jnp.dot(
                            t1[:, ch_base * S:(ch_base + 1) * S].astype(bf16),
                            Cxt, preferred_element_type=f32,
                        )

                    a = jnp.where(
                        fb, cover, samp(3) * (1.0 / 255.0) * alpha_e * cover
                    )
                    # dead / foreign-z slots compose with a=0 (exact identity)
                    a = jnp.where(on, a, 0.0)

                    for c in range(3):
                        rgb_c = jnp.where(
                            fb, f_ref[b, i, EF_R + c], samp(c)
                        )
                        if "sprite_blend" in _ABLATE:  # debug: write-only
                            canv_ref[zc, pl.ds(start, SLAB),
                                     c * res:(c + 1) * res] = rgb_c
                            continue
                        old = canv_ref[zc, pl.ds(start, SLAB),
                                       c * res:(c + 1) * res]
                        canv_ref[zc, pl.ds(start, SLAB),
                                 c * res:(c + 1) * res] = (
                            (rgb_c * a + old * (1 - a)).astype(bf16)
                        ).astype(f32)
                    if "sprite_blend" not in _ABLATE:
                        old_a = canv_ref[zc, pl.ds(start, SLAB),
                                         3 * res:4 * res]
                        canv_ref[zc, pl.ds(start, SLAB),
                                 3 * res:4 * res] = (
                            (a + old_a * (1 - a)).astype(bf16)
                        ).astype(f32)

                # first yvalid row = ceil(y0 - 0.5); 8-aligned band start
                r_lo = jnp.clip(jnp.ceil(y0 - 0.5), 0.0, f32(res - 1)).astype(i32)
                start = jnp.clip(r_lo - r_lo % 8, 0, res - SLAB)
                start = pl.multiple_of(start, 8)
                # fits iff span (<= h2+1 rows) + alignment waste (<=7) <= SLAB
                small = h2 <= f32(SLAB - 8)

                @pl.when(small)
                def _():
                    do_slab(start)

                @pl.when(jnp.logical_not(small))
                def _():
                    for s0 in range(0, res, SLAB):
                        do_slab(s0)

            if leg_ref is not None:
                # legacy stream of a grouped pool: compacted slot ids in
                # paint order (fallback rects, spills, and their
                # overlap-cascade — render/sprite_groups.py)
                def leg_body(j, _):
                    # [B, cap, 1] layout: the dynamic index lands on the
                    # sublane dim (dynamic LANE indexing is unsupported)
                    slot_body(leg_ref[b, j, 0])
                    return 0

                jax.lax.fori_loop(0, count, leg_body, 0)
            elif n_slots <= 8:
                # small pools: static unroll
                for i in range(n_slots):
                    slot_body(i)
            else:
                # pools are contiguously compacted (Entities.compact), so
                # looping to the live count skips dead slots entirely;
                # 2 slots per iteration lets Mosaic overlap independent
                # slots' scalar loads and matmuls (canvas writes stay
                # program-ordered within the body)
                def pair_body(j, _):
                    slot_body(2 * j)

                    @pl.when(2 * j + 1 < count)
                    def _():
                        slot_body(2 * j + 1)

                    return 0

                jax.lax.fori_loop(0, (count + 1) // 2, pair_body, 0)

        def group_pass(refs, nz_pool, G_MAX, canv_ref, used_base):
            """Paint up to CAPK row-disjoint sprites per full-canvas pass
            (render/sprite_groups.py).  Per group: CAPK column-resample
            matmuls into shared scratch, one row-gather matmul per
            channel, one RGBA-interleaved blend."""
            prow_ref, alpha_ref, memb_ref, qcol_ref, _leg = refs
            KS = CAPK * S

            for zidx in range(nz_pool):
                ng = si_ref[b, 0, used_base + zidx]

                def gbody(g, _, zidx=zidx):
                    st = zidx * G_MAX + g
                    # NOTE r5: a runtime-bounded member loop (dynamic
                    # fori_loop to the occupied count, and a pl.when-
                    # predicated variant) both measured ~15% SLOWER
                    # end-to-end than this static unroll — Mosaic
                    # pipelines the fixed CAPK sequence better than it
                    # handles per-group dynamic trip counts.
                    for kk in range(CAPK):
                        slot = memb_ref[b, st, kk]
                        row2 = memb_ref[b, st, CAPK + kk]
                        qv = qcol_ref[b, pl.ds(slot, 1), :]  # [1,res] i32
                        Cx = (
                            jax.lax.broadcasted_iota(i32, (S, res), 0)
                            == qv
                        ).astype(bf16)
                        tile4 = ent4_ref[pl.ds(row2 * (4 * S), 4 * S), :]
                        cs = jnp.dot(
                            tile4, Cx, preferred_element_type=f32
                        ).astype(bf16)  # [4S, res], exact ints <= 255
                        for ch in range(4):
                            gscr_ref[
                                pl.ds(ch * KS + kk * S, S), :
                            ] = cs[ch * S:(ch + 1) * S, :]
                    prowv = prow_ref[b, st, :].reshape(res, 1)
                    Ry = (
                        prowv
                        == jax.lax.broadcasted_iota(i32, (res, KS), 1)
                    ).astype(bf16)
                    outs = [
                        jnp.dot(
                            Ry, gscr_ref[ch * KS:(ch + 1) * KS, :],
                            preferred_element_type=f32,
                        )
                        for ch in range(4)
                    ]
                    av = alpha_ref[b, st, :].reshape(res, 1)
                    # same multiply order as slot_body: texel*(1/255)*alpha
                    a = outs[3] * (1.0 / 255.0) * av
                    out4 = jnp.concatenate(
                        [outs[0], outs[1], outs[2],
                         jnp.ones((res, res), f32)],
                        axis=1,
                    )
                    a4 = jnp.concatenate([a, a, a, a], axis=1)
                    old = canv_ref[zidx]
                    canv_ref[zidx] = (
                        (out4 * a4 + old * (1 - a4)).astype(bf16)
                    ).astype(f32)
                    return 0

                jax.lax.fori_loop(0, ng, gbody, 0)

        if "sprite" not in _ABLATE:
            if groups_e:
                group_pass(eg, nz, plan.G_MAX_E, ecanv_ref, plan.SI_USED_E)
                sprite_pass(cap, entf_ref, enti_ref, ecanv_ref, nz,
                            si_ref[b, 0, plan.SI_LEG_E], leg_ref=eg[4])
            else:
                sprite_pass(cap, entf_ref, enti_ref, ecanv_ref, nz,
                            si_ref[b, 0, SI_ENT_COUNT])
            if dcap:
                if groups_d:
                    group_pass(dg, nzd, plan.G_MAX_D, dcanv_ref,
                               plan.SI_USED_D)
                    sprite_pass(dcap, decf_ref, deci_ref, dcanv_ref, nzd,
                                si_ref[b, 0, plan.SI_LEG_D], leg_ref=dg[4])
                else:
                    sprite_pass(dcap, decf_ref, deci_ref, dcanv_ref, nzd,
                                si_ref[b, 0, SI_DEC_COUNT])

        def apply_canvas(obs, canv_ref, zidx):
            c4 = canv_ref[zidx]  # [res, 4*res]
            a = c4[:, 3 * res:]
            rgb = jnp.stack([c4[:, c * res:(c + 1) * res] for c in range(3)])
            return jnp.round(rgb + obs * (1 - a)[None])

        def paint_z(obs, zlevel):
            if zlevel in plan.z_levels:
                obs = apply_canvas(obs, ecanv_ref,
                                   plan.z_levels.index(zlevel))
            if dcap and zlevel in plan.dz_levels:
                obs = apply_canvas(obs, dcanv_ref,
                                   plan.dz_levels.index(zlevel))
            return obs

        obs = paint_z(obs, -1)

        if static:
            # grid/cell layers live in the precomposed base frame
            obs = paint_z(obs, 0)
            obs = paint_z(obs, 1)
            out_ref[b] = obs.astype(i32).astype(u8)
            return 0

        # ---- grid pass: separable resample of the prep-built canvas ------
        # (renderer._paint_grid_tiles — bit-identical pick construction)
        top_y = sf_ref[b, 0, SF_TOPY]
        low_x = sf_ref[b, 0, SF_LOWX]

        GS = NC * sA
        cyx = (top_y - wys) * sA  # [res,1] canvas row per pixel row
        cxx = (wxs - low_x) * sA  # [1,res]
        ri = jnp.clip(jnp.floor(cyx).astype(i32), 0, GS - 1)
        ci = jnp.clip(jnp.floor(cxx).astype(i32), 0, GS - 1)
        in_r = (cyx >= 0) & (cyx < GS)  # [res,1]
        in_c = (cxx >= 0) & (cxx < GS)  # [1,res]

        # cell-resolution picks for the colored-cell pass
        Py = (
            (ri // sA == jax.lax.broadcasted_iota(i32, (res, NC), 1)) & in_r
        ).astype(bf16)  # [res, NC]
        Pxt = (
            (jax.lax.broadcasted_iota(i32, (NC, res), 0) == ci // sA) & in_c
        ).astype(bf16)  # [NC, res]

        if has_grid_tex:
            Ry_g = (
                (ri == jax.lax.broadcasted_iota(i32, (res, GS), 1)) & in_r
            ).astype(bf16)  # [res, GS]
            Cxt_g = (
                (jax.lax.broadcasted_iota(i32, (GS, res), 0) == ci) & in_c
            ).astype(bf16)  # [GS, res]

            def gsamp(ch):
                # MXU accumulates in f32; the bf16 round-trips mirror the
                # XLA path's preferred_element_type=bf16 einsums (exact:
                # one-hot picks of u8-valued texels)
                img = gcanvas_ref[b, ch].astype(i32).astype(bf16)
                e1 = jnp.dot(Ry_g, img,
                             preferred_element_type=f32).astype(bf16)
                return jnp.dot(e1, Cxt_g,
                               preferred_element_type=f32).astype(bf16).astype(f32)

            alpha = gsamp(3) / 255.0  # division, matching the XLA path
            g3 = jnp.stack([gsamp(c) for c in range(3)])
            obs = jnp.round(obs * (1 - alpha)[None] + g3 * alpha[None])
            covered = gsamp(4) > 127.0
        else:
            covered = jnp.zeros((res, res), bool)

        # colored cells (renderer grid_cell_colors path); the Pxt
        # contraction of all 5 planes happens in ONE matmul.  f32 one-hots:
        # the inset plane holds non-integers (chaser's 0.3) that a bf16
        # pick would perturb — f32 picks are exact for any f32 value.
        if "cell" not in _ABLATE:
            cell_flat = cell5_ref[b].reshape(5 * NC, NC)
            U5 = jnp.dot(cell_flat, Pxt.astype(f32),
                         preferred_element_type=f32)

            def cellpick(j):
                return jnp.dot(Py.astype(f32), U5[j * NC:(j + 1) * NC, :],
                               preferred_element_type=f32)

            cvalid = cellpick(3) > 0.5
            inset = cellpick(4)
            u_frac = wxs - jnp.floor(wxs)  # [1,res]
            v_frac = wys - jnp.floor(wys)  # [res,1]
            central = (jnp.abs(u_frac - 0.5) < inset / 2) & (
                jnp.abs(v_frac - 0.5) < inset / 2
            )
            gvalid = cvalid & central & ~covered
            cell3 = jnp.stack([cellpick(c) for c in range(3)])
            obs = jnp.where(gvalid[None], cell3, obs)

        obs = paint_z(obs, 0)
        obs = paint_z(obs, 1)

        # Mosaic has no f32->u8 cast; round-trip through int32
        out_ref[b] = obs.astype(i32).astype(u8)
        return 0

    return kernel


def _pick_b(N: int) -> int:
    for b in (8, 4, 2):
        if N % b == 0:
            return b
    return 1


def _pallas_call(plan: PallasPlan, N: int, interpret: bool):
    res = plan.res
    NC = plan.NC
    cap, dcap = plan.cap, plan.dcap
    nz = len(plan.z_levels)
    nzd = len(plan.dz_levels)
    dcap_eff = dcap if dcap else 1
    B = _pick_b(N)

    kernel = _make_kernel(plan, B)

    def row_block(shape, space=pltpu.VMEM):
        return pl.BlockSpec(
            (B,) + shape, lambda i: (i,) + (0,) * len(shape),
            memory_space=space,
        )

    def const_block(arr):
        return pl.BlockSpec(
            arr.shape, lambda i: (0,) * arr.ndim, memory_space=pltpu.VMEM
        )

    in_specs = [
        row_block((1, SF_N), pltpu.SMEM),
        row_block((1, plan.SI_TOTAL), pltpu.SMEM),
        row_block((5, 1, 1) if plan.static else (5, plan.GS, plan.GS)),
        row_block((5, 1, 1) if plan.static else (5, NC, NC)),
        # per-slot sprite params stay in VMEM: SMEM pads every scalar to
        # 32 bytes, so a [B, cap, 8] window blows the 1 MB SMEM budget
        row_block((cap, EF_N)),
        row_block((cap, EI_N)),
        row_block((dcap_eff, EF_N)),
        row_block((dcap_eff, EI_N)),
        row_block((3,) + ((plan.BH, plan.BW) if plan.procgen_bg
                          else (1, 1))),
        const_block(plan.bg_flat),
        const_block(plan.ent_flat),
    ]
    any_groups = plan.groups_e or plan.groups_d
    if any_groups:
        in_specs.append(const_block(plan.ent_flat4))
    if plan.groups_e:
        in_specs += [
            row_block((plan.NST_E, res)),
            row_block((plan.NST_E, res)),
            row_block((plan.NST_E, 2 * plan.CAPK)),
            row_block((cap, res)),
            row_block((cap, 1)),
        ]
    if plan.groups_d:
        in_specs += [
            row_block((plan.NST_D, res)),
            row_block((plan.NST_D, res)),
            row_block((plan.NST_D, 2 * plan.CAPK)),
            row_block((dcap_eff, res)),
            row_block((dcap_eff, 1)),
        ]
    if plan.static:
        in_specs.append(row_block((3, res, res)))  # precomposed base frame

    scratch_shapes = [
        pltpu.VMEM((nz, res, 4 * res), f32),
        pltpu.VMEM((nzd, res, 4 * res), f32),
    ]
    if any_groups:
        scratch_shapes.append(
            pltpu.VMEM((4 * plan.CAPK * plan.S, res), jnp.bfloat16)
        )

    # The grouped sprite pass holds (B, cap|NST, res) paint tensors plus the
    # slab scratch in VMEM at once; at B=8 with big pools (bossfight
    # cap=72/dcap=160) that exceeds the default 16 MiB scoped-vmem budget.
    # v5e has 128 MiB of physical VMEM — raise the per-kernel cap instead
    # of shrinking B (half-size blocks measured slower).
    params = {}
    if not interpret:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        )
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, 3, res, res), u8),
        grid=(N // B,),
        in_specs=in_specs,
        out_specs=row_block((3, res, res)),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **params,
    )
    return call


def render_obs_batch(game, states, res: int = RES, interpret=None):
    """Batched [N, res, res, 3] uint8 frames via the fused kernel."""
    plan = get_plan(game, res)
    if interpret is None:
        interpret = jax.default_backend() != "tpu"

    prep = jax.vmap(lambda s: _prep_one(plan, s))(states)
    N = prep["sf"].shape[0]
    sf = prep["sf"].reshape(N, 1, SF_N)
    si = prep["si"].reshape(N, 1, plan.SI_TOTAL)
    call = _pallas_call(plan, N, interpret)
    args = [
        sf, si, prep["gcanvas"], prep["cell5"], prep["ent_f"],
        prep["ent_i"], prep["dec_f"], prep["dec_i"], prep["bgc"],
        jnp.asarray(plan.bg_flat), jnp.asarray(plan.ent_flat),
    ]
    if plan.groups_e or plan.groups_d:
        args.append(jnp.asarray(plan.ent_flat4))
    if plan.groups_e:
        args += [prep["eg_prow"], prep["eg_alpha"], prep["eg_memb"],
                 prep["eg_qcol"], prep["eg_legacy"][..., None]]
    if plan.groups_d:
        args += [prep["dg_prow"], prep["dg_alpha"], prep["dg_memb"],
                 prep["dg_qcol"], prep["dg_legacy"][..., None]]
    if plan.static:
        args.append(prep["base"])
    if "call" in _ABLATE:  # debug: measure XLA-side prep+post in isolation
        out = jnp.zeros((N, 3, res, res), u8)
    else:
        out = call(*args)
    obs = jnp.transpose(out, (0, 2, 3, 1)).astype(i32)

    # post passes identical to renderer.render_obs: overlays run in XLA
    def post(o, s):
        sx = jnp.arange(res, dtype=f32) + 0.5
        sy = jnp.arange(res, dtype=f32) + 0.5
        if game.options.paint_vel_info and game.has_useful_vel_info:
            infodim = res * 0.2
            s1 = xr.to_shade(0.5 * s.ents.vx[0] / s.maxspeed + 0.5)
            s2 = xr.to_shade(0.5 * s.ents.vy[0] / s.max_jump + 0.5)
            in_y = (sy < infodim)[:, None]
            r1 = in_y & (sx < infodim)[None, :]
            r2 = in_y & ((sx >= infodim) & (sx < 2 * infodim))[None, :]
            o = jnp.where(r1[:, :, None], s1, o)
            o = jnp.where(r2[:, :, None], s2, o)
        w = s.main_width.astype(f32)
        h = s.main_height.astype(f32)
        if game.center_agent:
            _, _, vis = game.camera(s)
        else:
            vis = jnp.maximum(jnp.maximum(w, h), f32(game.min_visibility))
        unit = res / vis
        o = game.render_overlay(s, o, sx, sy, res, unit, vis)
        return o.astype(u8)

    return jax.vmap(post)(obs, states)
