"""Sprite group scheduling for the fused Pallas render kernel.

The kernel's original sprite pass issues ~50 vector ops per (env, slot):
at steady state the physics games carry 150-230 live sprites per env, so
the pass is op-issue-bound (~200ns/slot/env, BENCH r4 notes) and render
dominates the step.  This module restructures the pass so the kernel
paints up to ``CAPK`` sprites per issued op-sequence:

* prep (here, plain XLA over [cap, res] shapes, vmapped over envs)
  precomputes each slot's per-pixel texture indices — row map ``srow``
  (screen row -> tile row, flips/tiling/validity baked in) and column
  map ``qcol`` — with op-for-op the same f32 math as the in-kernel path,
  so sampled texels are bit-identical;
* a per-env scheduling scan packs sprites into GROUPS of up to CAPK
  slots whose screen-row intervals are pairwise disjoint (at 8-row
  granularity).  Disjoint rows mean one full-canvas blend composites the
  whole group, and the scan assigns overlapping sprites to increasing
  group ids in slot order, preserving QPainter's sequential
  over-compositing exactly (painter order only matters for overlapping
  pixels; row-disjoint sprites commute);
* the kernel then runs, per group: CAPK column-resample matmuls into a
  shared scratch, ONE row-gather matmul pair, and ONE RGBA-interleaved
  canvas blend — amortizing every full-canvas op across CAPK sprites.

Slots the group path cannot take — colored-rect fallbacks (no atlas
row), spills past G_MAX, and anything drawn after an overlapping such
slot (the scan cascades them to keep paint order) — go to a compacted
``legacy`` list the kernel walks with the original per-slot body.

Bit-parity invariant: every pixel sees the identical sequence of
(alpha, rgb) blend events as the per-slot path — sampled texels are
exact integers <= 255 through every matmul (one-hot picks), alpha math
keeps the original multiply order, and pixels outside a sprite blend
with a == +0.0 (an exact identity through the bf16 canvas round-trip).
Guarded by tests/test_pallas_render.py against the XLA renderer.

Geometry reference: basic-abstract-game.cpp:849-979 (draw order),
entity draw rect cpp:820-826.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.exact import from_planes, from_planes16, to_planes, to_planes16

f32 = jnp.float32
i32 = jnp.int32

# srow/qcol marker for "no texel here" — never matches a one-hot iota
INVALID = 4096
# nextg marker for "rows poisoned by a legacy slot": later overlapping
# slots must also go legacy or paint order would break
BIG_G = 1 << 20

N_GRAN = 8  # scheduling granules (res/8 rows each)


class GroupTables(NamedTuple):
    """Per-env kernel inputs for one pool's group pass."""

    prow: jax.Array     # [NST, res] i32: k*S + tile row, or INVALID
    alpha: jax.Array    # [NST, res] f32: owning slot's alpha per row
    memberq: jax.Array  # [NST, CAPK] i32: member slot ids (0 if absent)
    mrow2: jax.Array    # [NST, CAPK] i32: member atlas variant rows
    used: jax.Array     # [nz] i32: groups used per z level
    qcol: jax.Array     # [cap, res] i32: per-slot column map
    legacy_ids: jax.Array    # [cap] i32: legacy slots, slot order first
    legacy_count: jax.Array  # i32 scalar


def index_maps(res, S, x0, y0, w2, h2, nth, ntv, tileh, tilev, pflip, qflip):
    """Per-slot screen->texture index maps [cap, res] (i32, INVALID baked).

    Bit-identical to the in-kernel math it replaces (pallas_kernel
    slot_body): same f32 divides, floors, clips and flips.
    """
    sx = jnp.arange(res, dtype=f32)[None, :] + 0.5  # [1, res]
    sy = jnp.arange(res, dtype=f32)[None, :] + 0.5

    u = (sx - x0[:, None]) / w2[:, None]  # [cap, res]
    xvalid = (u >= 0) & (u < 1)
    ut = u * nth[:, None].astype(f32)
    u_ = jnp.where(tileh[:, None], ut - jnp.floor(ut), u)
    ui = jnp.clip((u_ * S).astype(i32), 0, S - 1)
    qcol = jnp.where(qflip[:, None], S - 1 - ui, ui)
    qcol = jnp.where(xvalid, qcol, INVALID)

    v = (sy - y0[:, None]) / h2[:, None]
    yvalid = (v >= 0) & (v < 1)
    vt = v * ntv[:, None].astype(f32)
    v_ = jnp.where(tilev[:, None], vt - jnp.floor(vt), v)
    vi = jnp.clip((v_ * S).astype(i32), 0, S - 1)
    srow = jnp.where(pflip[:, None], S - 1 - vi, vi)
    srow = jnp.where(yvalid, srow, INVALID)
    return srow, qcol


def schedule(res, S, nz, G_MAX, CAPK, srow, qcol, z_idx, live, fb, alpha,
             row2):
    """Pack one env's pool into group tables (see module docstring).

    Sequential scan over slots (the group id is a longest-chain quantity
    over the overlap graph — inherently ordered); everything around it is
    one-hot matmuls kept exact via 8-bit planes (core/exact.py).
    """
    cap = srow.shape[0]
    gran = res // N_GRAN

    rowvalid = srow != INVALID  # [cap, res]
    any_rows = jnp.any(rowvalid, axis=1)
    r_lo = jnp.argmax(rowvalid, axis=1)
    r_hi = (res - 1) - jnp.argmax(rowvalid[:, ::-1], axis=1)
    glo = r_lo // gran
    ghi = r_hi // gran

    drawable = live & any_rows & (z_idx >= 0)
    eligible = drawable & ~fb  # fallback rects keep the per-slot body

    def body(carry, inp):
        nextg, counts = carry  # [nz, N_GRAN] i32, [nz, G_MAX] i32
        z, lo, hi, elig, drawable_i, fb_i = inp
        zoh = jnp.arange(nz) == z  # [nz]
        gm = (jnp.arange(N_GRAN) >= lo) & (jnp.arange(N_GRAN) <= hi)
        sel = zoh[:, None] & gm[None, :]
        rowmax = jnp.max(jnp.where(sel, nextg, 0))
        cnt_z = jnp.sum(jnp.where(zoh[:, None], counts, 0), axis=0)
        ok = (cnt_z < CAPK) & (jnp.arange(G_MAX) >= rowmax)
        found = jnp.any(ok)
        g = jnp.argmax(ok).astype(i32)
        grouped = elig & found
        legacy = drawable_i & (fb_i | ~found)
        k = jnp.sum(jnp.where(jnp.arange(G_MAX) == g, cnt_z, 0)).astype(i32)

        goh = jnp.arange(G_MAX) == g
        counts = counts + (
            (zoh[:, None] & goh[None, :]) & grouped
        ).astype(i32)
        nextg = jnp.where(
            sel & grouped, g + 1, jnp.where(sel & legacy, BIG_G, nextg)
        )
        return (nextg, counts), (grouped, legacy, g, k)

    init = (
        jnp.zeros((nz, N_GRAN), i32),
        jnp.zeros((nz, G_MAX), i32),
    )
    _, (grouped, legacy, g, k) = jax.lax.scan(
        body,
        init,
        (z_idx, glo.astype(i32), ghi.astype(i32), eligible, drawable, fb),
    )

    NST = nz * G_MAX
    st = jnp.clip(z_idx, 0, nz - 1) * G_MAX + g  # [cap]

    # stream one-hot (f32 0/1 — exact under bf16 truncation)
    st_oh = (
        (jnp.arange(NST)[:, None] == st[None, :]) & grouped[None, :]
    ).astype(f32)  # [NST, cap]

    owned = (rowvalid & grouped[:, None]).astype(f32)  # [cap, res]
    rowvals = (k[:, None] * S + jnp.where(rowvalid, srow, 0)).astype(f32)
    vals = st_oh @ (rowvals * owned)  # values <= CAPK*S-1 <= 255: exact
    mask = st_oh @ owned
    prow = jnp.where(mask > 0.5, vals, f32(INVALID)).astype(i32)

    # alpha per row: 8-bit plane split keeps arbitrary f32 exact
    ap = to_planes(alpha)  # [cap, 4]
    a_planes = [
        (st_oh * ap[:, p][None, :]) @ owned for p in range(4)
    ]  # each [NST, res], entries are single plane bytes or 0
    alpha_rows = from_planes(jnp.stack(a_planes, axis=-1), f32)

    # member tables: ids/rows via 16-bit planes (values can exceed 255)
    mk_oh = (
        (jnp.arange(NST * CAPK)[:, None] == (st * CAPK + k)[None, :])
        & grouped[None, :]
    ).astype(f32)  # [NST*CAPK, cap]
    ids16 = to_planes16(jnp.arange(cap, dtype=i32))  # [cap, 2]
    memberq = from_planes16(
        jnp.stack([mk_oh @ ids16[:, p] for p in range(2)], axis=-1)
    ).reshape(NST, CAPK)
    row216 = to_planes16(row2)
    mrow2 = from_planes16(
        jnp.stack([mk_oh @ row216[:, p].astype(f32) for p in range(2)],
                  axis=-1)
    ).reshape(NST, CAPK)
    # absent members decode as -32768 (the planes16 bias) — clamp so the
    # kernel's dynamic loads stay in bounds; prow never selects their
    # scratch rows, so the sampled garbage is multiplied by 0
    memberq = jnp.clip(memberq, 0, cap - 1)
    mrow2 = jnp.maximum(mrow2, 0)

    used = jnp.stack(
        [
            jnp.max(jnp.where(grouped & (z_idx == z), g + 1, 0))
            for z in range(nz)
        ]
    ).astype(i32)

    order = jnp.argsort(~legacy, stable=True)
    legacy_ids = order.astype(i32)
    legacy_count = jnp.sum(legacy).astype(i32)

    return GroupTables(
        prow=prow,
        alpha=alpha_rows,
        memberq=memberq,
        mrow2=mrow2,
        used=used,
        qcol=qcol,
        legacy_ids=legacy_ids,
        legacy_count=legacy_count,
    )
