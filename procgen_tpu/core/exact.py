"""Bit-exact one-hot matmuls under ANY XLA matmul precision.

XLA-TPU computes f32 ``dot_general``s with bf16-truncated operands by
default (8 mantissa bits), so a one-hot matmul only passes a value
through exactly when every contracted operand is an integer in
[0, 255]: ``1.0 * v`` with ``v <= 2**8`` is exact in bf16 and the MXU
accumulates in f32.  The engine's scatter-free gathers/scatters
(grid probes, entity compaction, mt19937 window extraction) previously
relied on true-f32 multiplies (16-bit-split or raw-f32 passthrough),
which silently corrupts on TPU under the default matmul precision
(ADVICE r3, medium).

Every load-bearing one-hot gather/scatter now funnels through the
plane helpers here: a 32-bit payload (f32 bitcast, int32, bool) is
split into four 8-bit planes before the dot and reassembled after,
making exactness independent of ``--jax_default_matmul_precision``,
the backend, and XLA lowering choices (even a reduce(mul)->dot rewrite
stays exact, because every contracted operand is an integer <= 255).

Requirement on callers: the one-hot operand must select AT MOST ONE
source per output element (true one-hot / permutation / disjoint
scatter masks) — plane reassembly assumes each output plane is a
single 0..255 integer, not a sum.

Grid object ids fit in 16 bits, so grid probes use the cheaper
two-plane i16 variant (bias +32768 then lo/hi bytes).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

u32 = jnp.uint32
i32 = jnp.int32
f32 = jnp.float32

N_PLANES = 4
_BIAS16 = 1 << 15


def _bits_of(x: jax.Array) -> jax.Array:
    """Reinterpret any 32-bit-or-smaller array as uint32 payload bits."""
    if x.dtype == jnp.float32:
        return lax.bitcast_convert_type(x, u32)
    if x.dtype == jnp.bool_:
        return x.astype(u32)
    if x.dtype == jnp.uint32:
        return x
    return x.astype(i32).astype(u32)  # two's complement for signed ints


def _from_bits(bits: jax.Array, dtype) -> jax.Array:
    if dtype == jnp.float32:
        return lax.bitcast_convert_type(bits, f32)
    if dtype == jnp.bool_:
        return bits != 0
    if dtype == jnp.uint32:
        return bits
    return bits.astype(i32).astype(dtype)


def to_planes(x: jax.Array) -> jax.Array:
    """[...]-shaped array (f32/i32/u32/bool) -> f32[..., 4] byte planes."""
    bits = _bits_of(x)
    return jnp.stack(
        [((bits >> u32(8 * p)) & u32(0xFF)).astype(f32) for p in range(N_PLANES)],
        axis=-1,
    )


def from_planes(p: jax.Array, dtype) -> jax.Array:
    """f32[..., 4] byte planes (exact ints in [0,255]) -> [...] of dtype."""
    bits = p[..., 0].astype(u32)
    for k in range(1, N_PLANES):
        bits = bits | (p[..., k].astype(u32) << u32(8 * k))
    return _from_bits(bits, dtype)


def to_planes16(x: jax.Array) -> jax.Array:
    """int array with values in [-32768, 32767] -> f32[..., 2] byte planes."""
    b = (x.astype(i32) + _BIAS16).astype(u32)
    return jnp.stack(
        [(b & u32(0xFF)).astype(f32), (b >> u32(8)).astype(f32)], axis=-1
    )


def from_planes16(p: jax.Array) -> jax.Array:
    """f32[..., 2] byte planes -> i32 values in [-32768, 32767].

    ``p0 + 256*p1`` stays an exact integer <= 65535 in f32.
    """
    return (p[..., 0] + 256.0 * p[..., 1]).astype(i32) - _BIAS16


def stack_planes(arrays) -> jax.Array:
    """Stack k same-shape arrays into one [..., k*4] plane matrix."""
    pl = jnp.stack([to_planes(a) for a in arrays], axis=-2)  # [..., k, 4]
    return pl.reshape(pl.shape[:-2] + (pl.shape[-2] * N_PLANES,))


def unstack_planes(mat: jax.Array, dtypes):
    """Inverse of ``stack_planes``: [..., k*4] -> tuple of k arrays."""
    k = len(dtypes)
    pl = mat.reshape(mat.shape[:-1] + (k, N_PLANES))
    return tuple(from_planes(pl[..., j, :], dt) for j, dt in enumerate(dtypes))
