"""Bake the asset artifact: every PNG the 16 games reference, in one npz.

The reference ships 1,289 PNGs (procgen/data/assets/); procgen_tpu reads the
same files when an asset root is present.  This tool bakes the subset the
games actually use into ``procgen_tpu/data/assets.npz`` so the package is
self-contained: runtime loading falls back to the artifact when no asset
root directory exists (render/assets.py), and fails loudly when neither is
available.

Stored per relpath:
  size/<relpath>  int32[2]  ORIGINAL (w, h) — aspect ratios are
                            logic-relevant (match_aspect_ratio,
                            basic-abstract-game.cpp:1023-1031), so they must
                            come from the original dimensions even when the
                            pixels are stored downscaled.
  img/<relpath>   uint8[h, w, 4] RGBA, max dimension capped (default 512).

Usage: python tools/bake_assets.py [--root DIR] [--out FILE] [--cap 512]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def used_paths() -> list[str]:
    from procgen_tpu.core.constants import MAX_ASSETS
    from procgen_tpu.core.options import GameOptions
    from procgen_tpu.games.registry import available_games, make_game

    paths: set[str] = set()
    for name in available_games():
        for mode in (0, 1):  # easy + hard cover all asset tables
            try:
                game = make_game(name, GameOptions(distribution_mode=mode))
            except Exception:
                continue
            for type_ in range(MAX_ASSETS):
                paths.update(game.asset_names(type_))
            paths.update(game.background_names())
    return sorted(paths)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/root/reference/procgen/data/assets")
    ap.add_argument(
        "--out",
        default=os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "procgen_tpu", "data", "assets.npz",
        ),
    )
    ap.add_argument("--cap", type=int, default=512)
    args = ap.parse_args()

    from PIL import Image

    os.environ.setdefault("PROCGEN_TPU_ASSET_ROOT", args.root)
    paths = used_paths()
    arrays: dict[str, np.ndarray] = {}
    missing = []
    for rel in paths:
        p = os.path.join(args.root, rel)
        try:
            img = Image.open(p).convert("RGBA")
        except Exception:
            # missing from the reference's own tree (the fork dropped
            # misc_assets/mud.png that upstream ships) — bake a flat
            # placeholder so rendering stays deterministic and loud
            # failures stay reserved for misconfiguration
            missing.append(rel)
            arrays[f"size/{rel}"] = np.asarray([64, 64], np.int32)
            flat = np.zeros((64, 64, 4), np.uint8)
            flat[..., :3] = (146, 103, 77)
            flat[..., 3] = 255
            arrays[f"img/{rel}"] = flat
            continue
        w, h = img.size
        arrays[f"size/{rel}"] = np.asarray([w, h], np.int32)
        if max(w, h) > args.cap:
            scale = args.cap / max(w, h)
            img = img.resize(
                (max(1, int(w * scale)), max(1, int(h * scale))),
                Image.BILINEAR,
            )
        arrays[f"img/{rel}"] = np.asarray(img, np.uint8)

    if missing:
        print(f"placeholder-baked (absent from reference tree): {missing}")

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    np.savez_compressed(args.out, **arrays)
    sz = os.path.getsize(args.out) / 1e6
    print(f"baked {len(paths)} assets -> {args.out} ({sz:.1f} MB)")


if __name__ == "__main__":
    main()
