"""MT19937-compatible, JAX-traceable RNG.

The reference funnels *all* level-generation and step randomness through
``RandGen`` over ``std::mt19937`` (reference: procgen/src/randgen.cpp).  For
trajectory-exactness against the C++ engine we implement the Mersenne Twister
itself as pure uint32 JAX ops, reproducing the exact draw order of every
helper:

  * ``randint(low, high)`` = ``low + x % (high - low)``   (randgen.cpp:6)
  * ``randn(high)``        = ``x % high``                  (randgen.cpp:13)
  * ``rand01()``           = ``float((double)x / (max+1))``(randgen.cpp:19)
  * ``randrange(lo, hi)``  = ``rand01() * (hi-lo) + lo``   (randgen.cpp:29)
  * ``randbool()``         = ``rand01() > .5``             (randgen.cpp:25)

``rand01``'s double divide by 2**32 followed by a float cast is bit-equal to
``uint32->f32 convert * 2**-32`` (division by an exact power of two commutes
with round-to-nearest-even), so no float64 is needed on TPU.

Two access patterns are provided:

  * ``next_u32`` — checked draw: twists lazily when the 624-word block is
    exhausted.  Under ``vmap`` the twist executes every draw (cond becomes
    select), so this path is reserved for the rare reset/level-gen code.
  * ``peek_block`` / ``commit`` — the hot-path pattern: materialise up to K
    tempered outputs once per step (paying at most ONE vectorised twist),
    hand out draws via a cheap cursor (``Draws``), then commit only the
    number of words actually consumed.  This keeps per-draw cost at a few
    VPU ops while preserving the exact mt19937 stream.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct

N = 624
M = 397
MATRIX_A = jnp.uint32(0x9908B0DF)
UPPER_MASK = jnp.uint32(0x80000000)
LOWER_MASK = jnp.uint32(0x7FFFFFFF)

u32 = jnp.uint32
i32 = jnp.int32


@struct.dataclass
class MTState:
    """One mt19937 stream: 624 state words + position in the current block.

    ``pos == N`` means the next draw must twist first (matches libstdc++'s
    freshly-seeded engine).  ``is_seeded`` only exists for serialization
    parity with RandGen (randgen.h:28).
    """

    mt: jax.Array  # uint32[N]
    pos: jax.Array  # int32 scalar
    is_seeded: jax.Array  # bool scalar


def seed(s) -> MTState:
    """Seed exactly like std::mt19937::seed (init_genrand)."""
    s = jnp.asarray(s, dtype=u32)

    def body(i, mt):
        prev = mt[i - 1]
        v = u32(1812433253) * (prev ^ (prev >> 30)) + i.astype(u32)
        return mt.at[i].set(v)

    mt0 = jnp.zeros((N,), dtype=u32).at[0].set(s)
    mt = jax.lax.fori_loop(1, N, body, mt0)
    return MTState(mt=mt, pos=jnp.asarray(N, i32), is_seeded=jnp.asarray(True))


def unseeded() -> MTState:
    """A default-constructed RandGen (never drawn from before seeding)."""
    st = seed(jnp.uint32(5489))  # std::mt19937 default_seed
    return st.replace(is_seeded=jnp.asarray(False))


def twist(mt: jax.Array) -> jax.Array:
    """One full MT19937 twist, vectorised as 3 dependency chunks + tail.

    The in-place C loop has a dependency distance of 227, so the 624 updates
    split into chunks A=[0,227), B=[227,454), C=[454,623) plus element 623,
    each fully data-parallel given the previous chunk.
    """
    up = mt & UPPER_MASK
    lo = mt & LOWER_MASK

    def mix(y, old_far):
        mag = jnp.where((y & u32(1)).astype(bool), MATRIX_A, u32(0))
        return old_far ^ (y >> 1) ^ mag

    y_a = up[0:227] | lo[1:228]
    new_a = mix(y_a, mt[M : M + 227])  # uses old mt[i+397]

    y_b = up[227:454] | lo[228:455]
    new_b = mix(y_b, new_a[0:227])  # new[i-227] from chunk A

    y_c = up[454:623] | lo[455:624]
    new_c = mix(y_c, new_b[0:169])  # new[i-227] from chunk B

    y_last = (mt[623] & UPPER_MASK) | (new_a[0] & LOWER_MASK)
    new_last = mix(y_last, new_b[169])  # new[396]

    return jnp.concatenate([new_a, new_b, new_c, new_last[None]])


def temper(y: jax.Array) -> jax.Array:
    y = y ^ (y >> 11)
    y = y ^ ((y << 7) & u32(0x9D2C5680))
    y = y ^ ((y << 15) & u32(0xEFC60000))
    y = y ^ (y >> 18)
    return y


# ---------------------------------------------------------------------------
# Checked per-draw path (reset / level-gen).
# ---------------------------------------------------------------------------


def next_u32(state: MTState) -> tuple[MTState, jax.Array]:
    """Draw one tempered 32-bit word, twisting when the block is exhausted."""
    needs = state.pos >= N
    mt = jnp.where(needs, twist(state.mt), state.mt)
    pos = jnp.where(needs, 0, state.pos)
    y = temper(jax.lax.dynamic_index_in_dim(mt, pos, keepdims=False))
    return state.replace(mt=mt, pos=pos + 1), y


def randint(state: MTState, low, high) -> tuple[MTState, jax.Array]:
    """low + x % (high - low), uint32 arithmetic (randgen.cpp:6-11)."""
    state, x = next_u32(state)
    return state, _randint_from(x, low, high)


def randn(state: MTState, high) -> tuple[MTState, jax.Array]:
    state, x = next_u32(state)
    return state, _randn_from(x, high)


def rand01(state: MTState) -> tuple[MTState, jax.Array]:
    state, x = next_u32(state)
    return state, _rand01_from(x)


def randbool(state: MTState) -> tuple[MTState, jax.Array]:
    state, f = rand01(state)
    return state, f > 0.5


def randrange(state: MTState, low, high) -> tuple[MTState, jax.Array]:
    state, f = rand01(state)
    return state, _randrange_from(f, low, high)


# ---------------------------------------------------------------------------
# Hot-path block draws: one twist per step, cheap cursor draws.
# ---------------------------------------------------------------------------


@struct.dataclass
class Draws:
    """A step-local window of pre-tempered outputs plus a consumption cursor.

    Created by ``peek_block``; does NOT advance the underlying stream until
    ``commit`` folds the consumed count back into ``MTState``.
    """

    block: jax.Array  # uint32[K] tempered outputs
    twisted: jax.Array  # uint32[N] the (possibly unused) post-twist state
    cursor: jax.Array  # int32 scalar, number of words consumed so far

    def take_u32(self) -> tuple["Draws", jax.Array]:
        # one-hot read (peek_at), not dynamic_index: a per-env traced-index
        # gather is SMEM-serialized under the env vmap on TPU
        y = self.peek_at(jnp.zeros((), i32))
        return self.replace(cursor=self.cursor + 1), y

    def randint(self, low, high):
        d, x = self.take_u32()
        return d, _randint_from(x, low, high)

    def randn(self, high):
        d, x = self.take_u32()
        return d, _randn_from(x, high)

    def rand01(self):
        d, x = self.take_u32()
        return d, _rand01_from(x)

    def randbool(self):
        d, f = self.rand01()
        return d, f > 0.5

    def randrange(self, low, high):
        d, f = self.rand01()
        return d, _randrange_from(f, low, high)

    # masked draws: consume a word only when ``cond`` (for short-circuited
    # C++ draw sites); the value is only meaningful when ``cond``.

    def take_u32_if(self, cond):
        y = self.peek_at(jnp.zeros((), i32))
        return (
            self.replace(cursor=self.cursor + jnp.asarray(cond).astype(i32)),
            y,
        )

    def randn_if(self, cond, high):
        d, x = self.take_u32_if(cond)
        return d, _randn_from(x, high)

    def randint_if(self, cond, low, high):
        d, x = self.take_u32_if(cond)
        return d, _randint_from(x, low, high)

    def rand01_if(self, cond):
        d, x = self.take_u32_if(cond)
        return d, _rand01_from(x)

    def randbool_if(self, cond):
        d, f = self.rand01_if(cond)
        return d, f > 0.5

    # vectorized draws: read many words at computed offsets at once, for
    # exact rewrites of sequential conditional-draw loops (e.g. the
    # reverse-slot enemy AI at dodgeball.cpp:398-443).  Per-lane offsets
    # come from a prefix sum over per-lane draw counts in the loop's
    # iteration order; lanes whose condition is false read a clipped
    # (garbage) word that the caller masks out, then the caller
    # ``advance``s the cursor by the total consumed count.

    def peek_at(self, offsets):
        """Tempered words at ``cursor + offsets`` (any shape), no advance.

        One-hot matmul instead of a gather — XLA-TPU serializes small
        gathers through SMEM; 32-bit exactness is kept by 8-bit plane
        split (core/exact.py), which stays exact even when XLA lowers
        f32 dots to bf16 operands.
        """
        from .exact import from_planes, to_planes

        offs = jnp.asarray(offsets, i32)
        K = self.block.shape[0]
        idx = jnp.clip(self.cursor + offs, 0, K - 1)
        oh = (idx[..., None] == jnp.arange(K)).astype(jnp.float32)
        pl = to_planes(self.block)  # [K, 4]
        y = jnp.einsum("...k,kp->...p", oh, pl)
        return from_planes(y, jnp.uint32)

    def advance(self, n) -> "Draws":
        """Consume ``n`` words previously read via ``peek_at``."""
        return self.replace(cursor=self.cursor + jnp.asarray(n, i32))


def normalize(state: MTState) -> MTState:
    """Fold a pending boundary twist so that pos < N.

    Called once per reset; ``commit`` preserves the invariant, letting the
    per-step ``peek_block`` pay a single twist instead of two.
    """
    needs = state.pos >= N
    mt = jnp.where(needs, twist(state.mt), state.mt)
    return state.replace(mt=mt, pos=jnp.where(needs, 0, state.pos))


_WIN_BS = 16  # window-extraction block size (two-level select below)


def _extract_window(mt: jax.Array, twisted: jax.Array, pos, k: int):
    """``concat(mt, twisted)[pos : pos + k]`` without a traced-index gather.

    A per-env fancy gather of the k-word window is SMEM-serialized on TPU
    (measured ~9ms at 4096 envs for k=96).  Two-level scheme instead:
    pick ceil(k/BS)+1 consecutive BS-word blocks starting at block
    ``pos // BS`` via an exact one-hot matmul (8-bit plane split,
    core/exact.py — exact under any XLA matmul precision), then resolve
    the residue ``pos % BS`` with BS static-slice selects.
    """
    from .exact import from_planes, to_planes

    BS = _WIN_BS
    cat = jnp.concatenate([mt, twisted])  # [2N]
    nblk = (2 * N) // BS
    kb = (k + BS - 1) // BS + 1
    q = pos // BS
    r = pos % BS
    blocks = cat.reshape(nblk, BS)
    oh = (
        jnp.arange(nblk)[None, :] == (q + jnp.arange(kb))[:, None]
    ).astype(jnp.float32)  # [kb, nblk]
    pl = to_planes(blocks).reshape(nblk, BS * 4)  # [nblk, BS*4]
    wpl = jnp.einsum("kn,nq->kq", oh, pl).reshape(kb, BS, 4)
    win = from_planes(wpl, u32).reshape(kb * BS)
    out = win[0:k]
    for t in range(1, BS):
        out = jnp.where(r == t, win[t : t + k], out)
    return out


def peek_block(state: MTState, k: int, assume_normalized: bool = False) -> Draws:
    """Materialise the next ``k`` tempered outputs without consuming them.

    Requires ``k <= N``; the window crosses at most one twist boundary, so a
    single vectorised twist covers every possible cursor position.
    """
    assert k <= N, "peek window larger than one MT block"
    if assume_normalized:
        mt = state.mt
        pos = state.pos
    else:
        # If pos == N the boundary twist happens *before* the first draw of
        # the window; normalise so 0 <= pos < N, twisting if needed.
        at_boundary = state.pos >= N
        twisted0 = twist(state.mt)
        mt = jnp.where(at_boundary, twisted0, state.mt)
        pos = jnp.where(at_boundary, 0, state.pos)
    # The twist that the window might cross mid-way.
    twisted = twist(mt)
    vals = _extract_window(mt, twisted, pos, k)
    return Draws(block=temper(vals), twisted=twisted, cursor=jnp.asarray(0, i32)), MTState(
        mt=mt, pos=pos, is_seeded=state.is_seeded
    )


def commit(norm_state: MTState, draws: Draws) -> MTState:
    """Advance the normalised stream by the number of words actually drawn."""
    pos = norm_state.pos + draws.cursor
    crossed = pos >= N
    mt = jnp.where(crossed, draws.twisted, norm_state.mt)
    pos = jnp.where(crossed, pos - N, pos)
    return norm_state.replace(mt=mt, pos=pos)


def draw_block(state: MTState, n_max: int):
    """Materialise the next ``n_max`` tempered outputs WITHOUT advancing.

    Returns (vals[u32 n_max], ctx); pass ctx to ``advance_block`` with the
    traced count actually consumed.  Pays ceil(n_max/624)+1 twists.
    """
    at_boundary = state.pos >= N
    twisted0 = twist(state.mt)
    mt = jnp.where(at_boundary, twisted0, state.mt)
    pos = jnp.where(at_boundary, 0, state.pos)

    k_blocks = (n_max + N - 1) // N + 1
    blocks = [mt]
    for _ in range(k_blocks):
        blocks.append(twist(blocks[-1]))
    all_out = temper(jnp.concatenate(blocks))  # [(k_blocks+1)*N]
    vals = jax.lax.dynamic_slice(all_out, (pos,), (n_max,))
    return vals, (jnp.stack(blocks), pos, k_blocks)


def advance_block(state: MTState, ctx, n) -> MTState:
    """Advance the stream by ``n`` (traced) words drawn from ``draw_block``."""
    mt_stack, pos, k_blocks = ctx
    new_pos_abs = pos + jnp.asarray(n, i32)
    blk = new_pos_abs // N
    new_pos = new_pos_abs % N
    new_mt = mt_stack[jnp.clip(blk, 0, k_blocks)]
    return state.replace(mt=new_mt, pos=new_pos)


def draw_n(state: MTState, n_max: int, n=None):
    """Materialise the next ``n_max`` tempered outputs and advance by ``n``
    (traced, <= n_max; defaults to n_max).

    Used for bulk draw sites (e.g. jumper's per-cell terrain rolls,
    jumper.cpp:246-256) — pays ceil(n_max/624)+1 twists instead of one per
    draw.
    """
    if n is None:
        n = n_max
    vals, ctx = draw_block(state, n_max)
    return advance_block(state, ctx, n), vals


# ---------------------------------------------------------------------------
# Shared helper arithmetic (uint32 / f32 semantics of RandGen).
# ---------------------------------------------------------------------------


def _randint_from(x: jax.Array, low, high) -> jax.Array:
    low = jnp.asarray(low, i32)
    high = jnp.asarray(high, i32)
    rng = (high - low).astype(u32)
    rng = jnp.maximum(rng, u32(1))  # C++ range==0 is UB; keep XLA well-defined
    return low + (x % rng).astype(i32)


def _randn_from(x: jax.Array, high) -> jax.Array:
    rng = jnp.asarray(high, i32).astype(u32)
    rng = jnp.maximum(rng, u32(1))
    return (x % rng).astype(i32)


def _rand01_from(x: jax.Array) -> jax.Array:
    # Bit-equal to float((double)x / 4294967296.0): /2**32 is an exact
    # exponent shift, so rounding happens only at the u32->f32 convert, which
    # is round-to-nearest-even in both places.
    return x.astype(jnp.float32) * jnp.float32(2.0**-32)


def _randrange_from(f01: jax.Array, low, high) -> jax.Array:
    low = jnp.asarray(low, jnp.float32)
    high = jnp.asarray(high, jnp.float32)
    # Separate mul then add, matching non-FMA x86 codegen of the reference.
    prod = _no_fma_mul(f01, high - low)
    return prod + low


def _no_fma_mul(a, b):
    # Prevent XLA from contracting the following add into an FMA by forcing
    # the product through an optimization barrier.
    return jax.lax.optimization_barrier(a * b)
