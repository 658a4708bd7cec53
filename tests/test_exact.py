"""Bit-exactness of the one-hot matmul plane scheme (core/exact.py).

ADVICE r3 (medium): XLA-TPU lowers f32 dots to bf16 operands by default
(8 mantissa bits), so the old 16-bit-split / raw-f32-passthrough one-hot
matmuls could silently corrupt the mt19937 stream, entity fields, and
grid probes on TPU.  The plane scheme keeps every contracted operand an
integer in [0, 255], which bf16 represents exactly; these tests pin the
algebra, including an explicit bf16-operand emulation of the TPU MXU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from procgen_tpu.core import exact, rng


def _rand_u32(rs, n):
    return rs.randint(0, 2**32, size=(n,), dtype=np.uint64).astype(np.uint32)


def test_plane_roundtrip_u32():
    rs = np.random.RandomState(0)
    x = jnp.asarray(_rand_u32(rs, 257))
    np.testing.assert_array_equal(
        np.asarray(exact.from_planes(exact.to_planes(x), jnp.uint32)),
        np.asarray(x),
    )


def test_plane_roundtrip_f32():
    rs = np.random.RandomState(1)
    x = jnp.asarray((rs.randn(257) * 1e6).astype(np.float32))
    y = exact.from_planes(exact.to_planes(x), jnp.float32)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x))


def test_plane_roundtrip_i32_bool():
    rs = np.random.RandomState(2)
    x = jnp.asarray(rs.randint(-(2**31), 2**31 - 1, size=(99,)).astype(np.int32))
    np.testing.assert_array_equal(
        np.asarray(exact.from_planes(exact.to_planes(x), jnp.int32)),
        np.asarray(x),
    )
    b = jnp.asarray(rs.rand(64) > 0.5)
    np.testing.assert_array_equal(
        np.asarray(exact.from_planes(exact.to_planes(b), jnp.bool_)),
        np.asarray(b),
    )


def test_plane16_roundtrip():
    x = jnp.arange(-32768, 32768, 7, dtype=jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(exact.from_planes16(exact.to_planes16(x))), np.asarray(x)
    )


def _bf16_truncate(a):
    """Emulate the TPU MXU's operand truncation: f32 -> bf16 -> f32."""
    return np.asarray(
        jnp.asarray(a, jnp.float32).astype(jnp.bfloat16).astype(jnp.float32)
    )


def test_planes_exact_under_bf16_operands():
    """one-hot @ planes stays exact even with both operands truncated to
    bf16 and accumulated in f32 — exactly the TPU default-precision MXU."""
    rs = np.random.RandomState(3)
    vals = _rand_u32(rs, 128)
    planes = np.asarray(exact.to_planes(jnp.asarray(vals)))  # [128, 4]
    perm = rs.permutation(128)
    oh = np.eye(128, dtype=np.float32)[perm]
    out = _bf16_truncate(oh).astype(np.float32) @ _bf16_truncate(planes)
    got = np.asarray(
        exact.from_planes(jnp.asarray(out.astype(np.float32)), jnp.uint32)
    )
    np.testing.assert_array_equal(got, vals[perm])


def test_16bit_halves_NOT_exact_under_bf16_operands():
    """The scheme the planes replaced: 16-bit halves corrupt under bf16
    operands (this is the failure mode ADVICE r3 flagged)."""
    rs = np.random.RandomState(4)
    vals = _rand_u32(rs, 128)
    lo = (vals & 0xFFFF).astype(np.float32)
    perm = rs.permutation(128)
    oh = np.eye(128, dtype=np.float32)[perm]
    out = oh @ _bf16_truncate(lo)
    assert not np.array_equal(out.astype(np.uint32), vals[perm] & 0xFFFF)


def test_peek_at_matches_stream():
    """Draws.peek_at returns the exact tempered mt19937 words."""
    st = rng.seed(1234)
    draws, norm = rng.peek_block(st, 64)
    # reference: sequential checked draws
    ref = []
    s = rng.seed(1234)
    for _ in range(64):
        s, y = rng.next_u32(s)
        ref.append(int(y))
    got = np.asarray(draws.peek_at(jnp.arange(64)))
    np.testing.assert_array_equal(got, np.asarray(ref, np.uint32))


def test_extract_window_cross_boundary():
    """_extract_window across the twist boundary equals sequential draws."""
    st = rng.seed(77)
    # advance close to the block boundary
    for _ in range(600):
        st, _ = rng.next_u32(st)
    ref = []
    s = st
    for _ in range(96):
        s, y = rng.next_u32(s)
        ref.append(int(y))
    draws, norm = rng.peek_block(st, 96)
    got = np.asarray(draws.peek_at(jnp.arange(96)))
    np.testing.assert_array_equal(got, np.asarray(ref, np.uint32))


def test_entities_compact_exact():
    """compact's plane matmul preserves f32 bit patterns exactly."""
    from procgen_tpu.core.entities import Entities, default_fields

    e = Entities.zeros(16)
    rs = np.random.RandomState(5)
    for i in range(10):
        f = default_fields(
            float(rs.randn() * 100), float(rs.randn() * 100),
            float(rs.randn()), float(rs.randn()), 0.5, 0.5, 2 + i,
        )
        e = e.push(f)
    keep = jnp.asarray(rs.rand(16) > 0.4)
    out = jax.jit(lambda e, k: e.compact(k))(e, keep)
    # numpy reference: stable partition
    keep_np = np.asarray(keep & e.active)
    order = np.concatenate(
        [np.where(keep_np)[0], np.where(~keep_np)[0]]
    )
    for name in ("x", "y", "vx", "vy", "type", "will_erase"):
        ref = np.asarray(getattr(e, name))[order]
        np.testing.assert_array_equal(np.asarray(getattr(out, name)), ref)
    assert int(out.count) == int(keep_np.sum())
