"""Procedural asset generation (reference: procgen/src/assetgen.cpp).

Two distinct jobs:

1. Offline sprite generation for ``use_generated_assets`` — runs on host at
   construction time (seeded ``fixed_asset_seed + type``, which is a
   *separate* RandGen stream, basic-abstract-game.cpp:102-107) and feeds the
   texture atlas.  Implemented in ``bake_generated_asset`` (host, NumPy).

2. The per-reset procedural *background* (cpp:778-782) which consumes draws
   from the per-env ``rand_gen`` stream — this must run on device to keep
   the mt19937 stream exact.  All 16 games ship background images, so this
   path is only reachable with ``use_generated_assets=True``.
"""

from __future__ import annotations


def consume_background_draws(game, s):
    """Device-side draw-parity for AssetGen::generate_resource on the
    per-level background (basic-abstract-game.cpp:778-782).

    TODO(round 2): implement the full draw sequence (ColorGen.roll + blotch
    loop, assetgen.cpp:104-132) with bounded masked loops.  Until then,
    generated-assets mode is unsupported for trajectory parity.
    """
    raise NotImplementedError(
        "use_generated_assets (procedural backgrounds) not yet supported; "
        "all games ship real background images so the default path is exact"
    )
