"""Sprite/background atlas baking + MXU-friendly sampling plans.

Per-pixel texel gathers lower to serialized gathers on TPU (measured 10-42ms
per 1024 envs), so texturing is restructured around matmuls:

* Grid tiles are pre-scaled on host to the game's cell pixel size and
  assembled on an aligned canvas with a one-hot matmul
  ``onehot(cell image) @ atlas_rows`` (measured ~2ms @1024 envs), then
  resampled to the output resolution with two separable nearest-neighbor
  one-hot matmuls built from the (dynamic) camera transform.
* Backgrounds are sampled directly with the same separable row/col matmul
  construction (scale + crop + vertical tiling are all axis-aligned).
* The (type, theme) -> atlas row mapping is a static where-chain over the
  game's compact image list — no gathers.

Assets are read from the reference's asset data directory when present
(PROCGEN_TPU_ASSET_ROOT overrides); types without a decodable image fall
back to their flat placeholder color so rendering degrades gracefully.
"""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ..core.constants import MAX_ASSETS
from . import assets as asset_tables
from .assets import monochrome_color


def _load_image(rel_path: str) -> Optional[np.ndarray]:
    """RGBA pixels from the asset root or the baked artifact.

    Raises when a referenced asset is missing from a present source — the
    reference fatals on unloadable images (resources.cpp:26-28); silent
    color fallback would produce wrong observations with no signal."""
    pix = asset_tables.load_rgba(rel_path)
    if pix is None and asset_tables.assets_available():
        raise FileNotFoundError(
            f"asset {rel_path!r} missing from "
            f"{asset_tables.asset_root() or 'the baked artifact'} — "
            "re-run tools/bake_assets.py or fix PROCGEN_TPU_ASSET_ROOT"
        )
    return pix


def _resize(img: np.ndarray, h: int, w: int) -> np.ndarray:
    from PIL import Image

    return np.asarray(
        Image.fromarray(img).resize((w, h), Image.BILINEAR), np.uint8
    )


# Rotated bank tiles cover a sqrt(2)-enlarged footprint so the rotated
# sprite's corners survive (QPainter's rotated draw overhangs the
# axis-aligned rect by up to sqrt(2); the old inscribed tiles clipped
# them).  Renderers enlarge the screen rect of banked draws by the same
# factor, keeping the on-screen sprite size exact.
ROT_OVERHANG = float(np.sqrt(2.0))


def _rotate_tile(pix: np.ndarray, theta: float,
                 footprint: float = ROT_OVERHANG) -> np.ndarray:
    """Nearest-neighbor texture-space rotation by ``theta`` (clockwise in
    screen coords, matching Qt rotate); out-of-source texels transparent.
    The output tile's [0,1) span covers ``footprint`` x the source rect,
    centered — at sqrt(2) the rotated square always fits (no corner
    clipping) for any angle."""
    S = pix.shape[0]
    ii, jj = np.meshgrid(np.arange(S), np.arange(S), indexing="ij")
    a = ((jj + 0.5) / S - 0.5) * footprint  # right+
    b = ((ii + 0.5) / S - 0.5) * footprint  # down+
    c, s_ = np.cos(theta), np.sin(theta)
    p = a * c + b * s_
    q = -a * s_ + b * c
    sc = np.floor((p + 0.5) * S).astype(np.int64)
    sr = np.floor((q + 0.5) * S).astype(np.int64)
    inb = (sc >= 0) & (sc < S) & (sr >= 0) & (sr < S)
    out = np.zeros_like(pix)
    out[inb] = pix[sr[inb], sc[inb]]
    return out


class GridAtlas:
    """Pre-scaled grid-tile atlas + static (img, theme) -> row mapping."""

    def __init__(self, game, tile_px: int):
        self.tile_px = tile_px
        entries = []  # (img_type, theme, pixels[s,s,4])
        if game.options.use_generated_assets:
            # every drawable type gets one procedurally generated theme
            # (basic-abstract-game.cpp:93-110: names stay empty, so the
            # AssetGen path runs for all of them)
            from .assetgen_host import bake_generated_asset

            for type_ in range(MAX_ASSETS):
                if not (
                    game.asset_for_type(type_)
                    or game.RESERVED_ASSETS.get(type_)
                ):
                    continue
                raw = bake_generated_asset(
                    int(game.fixed_asset_seed), type_,
                    bool(game.use_block_asset(type_)),
                )
                entries.append((type_, 0, _resize(raw, tile_px, tile_px)))
        else:
            for type_ in range(MAX_ASSETS):
                names = game.asset_names(type_)
                for theme, name in enumerate(names):
                    raw = _load_image(name)
                    if raw is None:
                        r, g, b = monochrome_color(type_ % 64, theme)
                        pix = np.zeros((tile_px, tile_px, 4), np.uint8)
                        pix[..., 0], pix[..., 1], pix[..., 2] = r, g, b
                        pix[..., 3] = 255
                    else:
                        pix = _resize(raw, tile_px, tile_px)
                    entries.append((type_, theme, pix))

        self.entries = [(t, th) for t, th, _ in entries]
        n = len(entries)
        rows = np.zeros((n + 1, tile_px, tile_px, 4), np.uint8)
        for i, (_, _, pix) in enumerate(entries):
            rows[i] = pix
        # final row = fully transparent (SPACE / unknown)
        self.transparent_row = n

        # --- arbitrary-rotation bank (QPainter rotates sprites by real
        # angles, qpainter.h:63-144; caveflyer ship etc.).  For image types
        # the game declares in ARB_ROT_TYPES, bake per-type angle buckets
        # (x2 for reflection, mirrored BEFORE rotating) so both renderers
        # sample identically and stay separable.  ARB_ROT_TYPES may be a
        # tuple (every type gets ROT_BANK_K buckets) or a dict
        # {type: buckets} — games whose rotations are a known finite set
        # (45-degree facings, pi/8 spins) get EXACT bucket centers with a
        # small bank, while continuous rotations (caveflyer ship, dodgeball
        # enemies) get fine quantization.  Tiles cover a sqrt(2) footprint
        # (ROT_OVERHANG) so rotated corners survive; renderers enlarge
        # banked screen rects by the same factor. --------------------------
        default_k = int(getattr(game, "ROT_BANK_K", 32))
        arb_decl = getattr(game, "ARB_ROT_TYPES", ()) or ()
        if isinstance(arb_decl, dict):
            arb_k = {int(t): int(k) for t, k in arb_decl.items()}
        else:
            arb_k = {int(t): default_k for t in arb_decl}
        bank_start = np.full((n + 1,), -1, np.int64)
        bank_k = np.full((n + 1,), 0, np.int64)
        bank_rows = []
        for i, ((t, th), (_, _, pix)) in enumerate(
            zip(self.entries, entries)
        ):
            if t not in arb_k:
                continue
            k = arb_k[t]
            bank_start[i] = n + 1 + len(bank_rows)
            bank_k[i] = k
            for refl in (False, True):
                src = pix[:, ::-1] if refl else pix
                for b in range(k):
                    bank_rows.append(_rotate_tile(src, 2.0 * np.pi * b / k))
        if bank_rows:
            rows = np.concatenate([rows, np.stack(bank_rows)], axis=0)
        self.rows = rows  # [n+1+bank, s, s, 4]
        self.bank_start = bank_start  # base row -> first bank row (or -1)
        self.bank_k = bank_k  # base row -> angle buckets

    def bank_row_for(self, base_row, refl, rot):
        """Bank row for (base sprite row, reflection, rotation angle); the
        base row itself when the type has no bank.  Static where-chain;
        the angle->bucket quantization uses each entry's own bucket count."""
        import jax.numpy as jnp

        out = jnp.asarray(base_row)
        has = jnp.zeros(jnp.shape(base_row), bool)
        two_pi = 2.0 * np.pi
        for i, start in enumerate(self.bank_start):
            if start < 0:
                continue
            k = int(self.bank_k[i])
            bucket = jnp.round(rot * (k / two_pi)).astype(jnp.int32) % k
            sel = base_row == i
            out = jnp.where(
                sel,
                int(start) + refl.astype(jnp.int32) * k + bucket,
                out,
            )
            has = has | sel
        return out, has

    def row_for(self, img, theme):
        """Static where-chain (no gather): (img, theme) -> atlas row."""
        import jax.numpy as jnp

        out = jnp.full(jnp.shape(img), self.transparent_row, jnp.int32)
        for row, (t, th) in enumerate(self.entries):
            out = jnp.where((img == t) & (theme == th), row, out)
        # unknown themes of a known type fall back to theme 0
        for row, (t, th) in enumerate(self.entries):
            if th == 0:
                out = jnp.where(
                    (img == t) & (out == self.transparent_row), row, out
                )
        return out


class BackgroundAtlas:
    """Background group images + original aspects, pre-scaled to the output
    resolution (backgrounds at most fill the res x res frame, so storing
    more rows than ``res`` only adds sampling matmul work)."""

    def __init__(self, names: list[str], res: int = 64):
        self.BH = res
        self.BW = res * 5 // 3  # typical reference background aspect ~1.66
        n = max(len(names), 1)
        self.pixels = np.zeros((n, self.BH, self.BW, 3), np.uint8)
        self.aspects = np.ones((n,), np.float32)
        self.loaded = False
        for i, name in enumerate(names):
            raw = _load_image(name)
            if raw is None:
                continue
            self.pixels[i] = _resize(raw, self.BH, self.BW)[..., :3]
            self.aspects[i] = raw.shape[1] / raw.shape[0]
            self.loaded = True


_CACHE: dict = {}


def get_atlases(game, res: int):
    """(GridAtlas, BackgroundAtlas, entity GridAtlas) for a game at a given
    resolution; cached.

    Returns (None, None, None) when assets are unavailable (pure-color
    fallback).
    """
    key = (
        game.name, game.options.distribution_mode, res, id(type(game)),
        game.options.use_generated_assets and int(game.fixed_asset_seed),
    )
    if key in _CACHE:
        return _CACHE[key]
    if not asset_tables.assets_available() and not game.options.use_generated_assets:
        # the reference fatals when images can't load (resources.cpp:26-28);
        # the escape hatch keeps the colored-rect mode reachable for debug
        if os.environ.get("PROCGEN_TPU_ALLOW_NO_ASSETS", "0") != "1":
            raise RuntimeError(
                "no assets: neither an asset root directory (set "
                "PROCGEN_TPU_ASSET_ROOT) nor the baked artifact "
                "(procgen_tpu/data/assets.npz, see tools/bake_assets.py) "
                "is present.  Set PROCGEN_TPU_ALLOW_NO_ASSETS=1 to render "
                "colored rects instead."
            )
        _CACHE[key] = (None, None, None)
        return _CACHE[key]

    # use_monochrome_assets replaces only sprite/tile assets with colors;
    # backgrounds stay real images (color_for_type at
    # basic-abstract-game.cpp:464-467 vs draw_background at cpp:988-1016).
    if game.options.use_monochrome_assets:
        grid_atlas = None
        ent_atlas = None
    else:
        # cell pixel size: ceil(res / visible cells)
        if game.center_agent:
            vis = game.visibility
        else:
            vis = max(game.WORLD_DIM_MAX)
            vis = max(vis, game.min_visibility)
        tile_px = max(2, int(np.ceil(res / vis)))
        grid_atlas = GridAtlas(game, tile_px)
        # entity sprites can span several world units on screen, so they are
        # stored at a resolution tied to the output res, not the cell size
        ent_atlas = GridAtlas(game, max(16, res // 2))
    if game.uses_procgen_background:
        bg_atlas = None  # sampled from state.bg_canvas instead
    else:
        bg_atlas = BackgroundAtlas(game.background_names(), res)
        if not bg_atlas.loaded:
            bg_atlas = None
    _CACHE[key] = (grid_atlas, bg_atlas, ent_atlas)
    return _CACHE[key]
