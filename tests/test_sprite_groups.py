"""Scheduling invariants of the grouped sprite pass
(render/sprite_groups.py): partition completeness, row-disjointness
inside a group, and paint-order preservation for overlapping sprites.

These are the properties that make the kernel's one-blend-per-group
compositing bit-equal to sequential per-slot painting; the end-to-end
pixel guard is tests/test_pallas_render.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from procgen_tpu.render import sprite_groups as sg

RES = 64
S = 32
CAPK = 8


def _random_pool(rng, cap, nz):
    """Synthetic srow/qcol and slot attributes with stacked intervals."""
    srow = np.full((cap, RES), sg.INVALID, np.int32)
    qcol = np.full((cap, RES), sg.INVALID, np.int32)
    r0 = rng.randint(0, RES - 1, size=cap)
    h = rng.randint(1, 20, size=cap)
    for i in range(cap):
        hi = min(RES, r0[i] + h[i])
        srow[i, r0[i]:hi] = rng.randint(0, S, size=hi - r0[i])
        c0 = rng.randint(0, RES - 1)
        cw = rng.randint(1, 16)
        qcol[i, c0:min(RES, c0 + cw)] = rng.randint(
            0, S, size=min(RES, c0 + cw) - c0
        )
    z = rng.randint(0, nz, size=cap).astype(np.int32)
    live = rng.rand(cap) < 0.8
    fb = rng.rand(cap) < 0.1
    alpha = rng.rand(cap).astype(np.float32)
    row2 = rng.randint(0, 500, size=cap).astype(np.int32)
    return srow, qcol, z, live, fb, alpha, row2


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("cap,nz,g_max", [(48, 2, 12), (160, 1, 32), (24, 2, 3)])
def test_schedule_invariants(seed, cap, nz, g_max):
    rng = np.random.RandomState(seed)
    srow, qcol, z, live, fb, alpha, row2 = _random_pool(rng, cap, nz)

    t = jax.jit(
        lambda *a: sg.schedule(RES, S, nz, g_max, CAPK, *a),
        static_argnums=(),
    )(
        jnp.asarray(srow), jnp.asarray(qcol), jnp.asarray(z),
        jnp.asarray(live), jnp.asarray(fb), jnp.asarray(alpha),
        jnp.asarray(row2),
    )
    prow = np.asarray(t.prow)
    alpha_rows = np.asarray(t.alpha)
    memberq = np.asarray(t.memberq)
    mrow2 = np.asarray(t.mrow2)
    used = np.asarray(t.used)
    legacy_ids = np.asarray(t.legacy_ids)
    legacy_count = int(t.legacy_count)

    rowvalid = srow != sg.INVALID
    drawable = live & rowvalid.any(axis=1) & (z >= 0)

    legacy_set = set(legacy_ids[:legacy_count].tolist())
    # legacy list preserves slot order
    assert list(legacy_ids[:legacy_count]) == sorted(legacy_set)

    # recover group assignment per slot from the tables
    slot_stream = {}
    for st in range(nz * g_max):
        zs, g = divmod(st, g_max)
        for k in range(CAPK):
            rows = np.where(prow[st] // S == k)[0]
            if rows.size == 0:
                continue
            # the owner is the unique slot whose srow matches on the rows
            cands = [
                i for i in range(cap)
                if drawable[i] and not fb[i] and z[i] == zs
                and np.array_equal(
                    prow[st, rows] % S, srow[i, rows]
                )
                and rowvalid[i, rows].all()
                and i == memberq[st, k]
            ]
            assert len(cands) == 1, (st, k, rows)
            i = cands[0]
            assert i not in slot_stream
            slot_stream[i] = (zs, g, k)
            # full row coverage: every valid row of i is owned in prow
            assert np.array_equal(
                np.where(rowvalid[i])[0], rows
            ), f"slot {i} rows partially owned"
            assert mrow2[st, k] == row2[i]
            np.testing.assert_array_equal(
                alpha_rows[st, rows], alpha[i].astype(np.float32)
            )
            assert g < used[zs]

    # every drawable slot is exactly one of: grouped, legacy
    for i in range(cap):
        if not drawable[i]:
            assert i not in slot_stream and i not in legacy_set
        else:
            assert (i in slot_stream) != (i in legacy_set), i
            if fb[i]:
                assert i in legacy_set

    # paint order: overlapping (same z, intersecting granules) i<j must
    # satisfy g_i < g_j, or j legacy if i is
    gran = RES // sg.N_GRAN
    span = {}
    for i in range(cap):
        if drawable[i]:
            rows = np.where(rowvalid[i])[0]
            span[i] = (rows[0] // gran, rows[-1] // gran)
    for i in span:
        for j in span:
            if i >= j or z[i] != z[j]:
                continue
            if span[i][1] < span[j][0] or span[j][1] < span[i][0]:
                continue  # granule-disjoint: order irrelevant
            if i in legacy_set:
                assert j in legacy_set, (i, j)
            elif j in slot_stream:
                assert slot_stream[i][1] < slot_stream[j][1], (i, j)
