"""Entity storage as a fixed-capacity structure-of-arrays.

The reference keeps ``std::vector<std::shared_ptr<Entity>>`` and mutates /
erases mid-loop (entity.h, basic-abstract-game.cpp:1095-1107,757-765).  The
TPU design stores every field as a ``[cap]`` array; slots ``[0, count)`` are
live and keep the exact C++ vector order (the agent is always slot 0 —
pushed first in game_reset, basic-abstract-game.cpp:797-801, and never
erased).  Erase is a stable compaction so iteration-order-sensitive logic
(reverse scans, erase-mid-loop) stays faithful.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import struct

from .constants import EXPLOSION, EXPLOSION5, TRAIL

f32 = jnp.float32
i32 = jnp.int32
u32 = jnp.uint32


@struct.dataclass
class Entities:
    # float fields (entity.h:9-48)
    x: jax.Array
    y: jax.Array
    vx: jax.Array
    vy: jax.Array
    rx: jax.Array
    ry: jax.Array
    collision_margin: jax.Array
    rotation: jax.Array
    vrot: jax.Array
    friction: jax.Array
    alpha: jax.Array
    health: jax.Array
    theta: jax.Array
    grow_rate: jax.Array
    alpha_decay: jax.Array
    climber_spawn_x: jax.Array
    # int fields
    type: jax.Array
    image_type: jax.Array
    image_theme: jax.Array
    render_z: jax.Array
    fire_time: jax.Array
    spawn_time: jax.Array
    life_time: jax.Array
    expire_time: jax.Array
    # bool fields
    will_erase: jax.Array
    collides_with_entities: jax.Array
    is_reflected: jax.Array
    use_abs_coords: jax.Array
    smart_step: jax.Array
    avoids_collisions: jax.Array
    auto_erase: jax.Array
    # slot bookkeeping
    count: jax.Array  # i32 scalar; live slots are [0, count)

    @property
    def cap(self) -> int:
        return self.x.shape[0]

    @property
    def active(self) -> jax.Array:
        return jnp.arange(self.cap) < self.count

    # -- construction -------------------------------------------------------

    @classmethod
    def zeros(cls, cap: int) -> "Entities":
        def zf():
            return jnp.zeros((cap,), f32)

        def zi():
            return jnp.zeros((cap,), i32)

        def zb():
            return jnp.zeros((cap,), bool)

        return cls(
            x=zf(), y=zf(), vx=zf(), vy=zf(), rx=zf(), ry=zf(),
            collision_margin=zf(), rotation=zf(), vrot=zf(), friction=zf(),
            alpha=zf(), health=zf(), theta=zf(), grow_rate=zf(),
            alpha_decay=zf(), climber_spawn_x=zf(),
            type=zi(), image_type=zi(), image_theme=zi(), render_z=zi(),
            fire_time=zi(), spawn_time=zi(), life_time=zi(), expire_time=zi(),
            will_erase=zb(), collides_with_entities=zb(), is_reflected=zb(),
            use_abs_coords=zb(), smart_step=zb(), avoids_collisions=zb(),
            auto_erase=zb(),
            count=jnp.asarray(0, i32),
        )

    # -- slot updates -------------------------------------------------------

    def set_fields(self, slot, **fields) -> "Entities":
        """Functionally write scalar fields of one slot.

        Static slots use a (free) indexed update; traced slots use a
        one-hot masked select — a traced-index scatter is SMEM-serialized
        on TPU."""
        if isinstance(slot, int):
            upd = {}
            for k, v in fields.items():
                arr = getattr(self, k)
                upd[k] = arr.at[slot].set(jnp.asarray(v, arr.dtype))
            return self.replace(**upd)
        return self.set_fields_where(slot, True, **fields)

    def set_fields_where(self, slot, cond, **fields) -> "Entities":
        upd = {}
        if isinstance(slot, int):
            for k, v in fields.items():
                arr = getattr(self, k)
                new = jnp.asarray(v, arr.dtype)
                upd[k] = arr.at[slot].set(jnp.where(cond, new, arr[slot]))
        else:
            m = (jnp.arange(self.cap) == slot) & cond
            for k, v in fields.items():
                arr = getattr(self, k)
                new = jnp.broadcast_to(jnp.asarray(v, arr.dtype), arr.shape)
                upd[k] = jnp.where(m, new, arr)
        return self.replace(**upd)

    def push(self, fields: dict[str, Any], do=True) -> "Entities":
        """Append an entity at slot ``count`` (masked by ``do``).

        Silently drops on overflow like a bounded pool; capacities are sized
        from worst-case analysis per game so overflow is a bug, checked in
        tests via ``count < cap`` assertions.  Delegates to the one-hot
        ``push_many`` placement (a dynamic-index update here is a scatter
        XLA-TPU serializes through SMEM).
        """
        do = jnp.asarray(do, bool)
        return self.push_many(
            {k: jnp.asarray(v)[None] for k, v in fields.items()},
            do.reshape((1,)),
        )

    def push_many(self, fields: dict[str, Any], do) -> "Entities":
        """Append up to K entities in one batched placement per field.

        ``fields`` values are [K] arrays (or broadcastable scalars), ``do``
        is a [K] bool mask.  Pushed entities keep mask order — equivalent to
        K sequential ``push`` calls.

        Placement is a one-hot matmul, NOT a scatter: XLA-TPU lowers
        batched scatters to serialized SMEM stores (measured ~1.4ms per
        [4096, cap] field — 110ms/step on starpilot).  32-bit exactness is
        kept by splitting each value into four 8-bit planes (core/exact.py)
        so the einsums stay exact even when XLA lowers f32 dots to bf16
        operands (one nonzero integer <= 255 per output column).
        """
        from .exact import from_planes, to_planes

        do = jnp.asarray(do, bool)
        k = do.shape[0]
        offs = jnp.cumsum(do.astype(i32)) - 1
        slots = self.count + offs
        ok = do & (slots < self.cap)
        # M[j, c] = 1 iff push j lands in slot c (at most one j per c)
        M = (
            ok[:, None] & (slots[:, None] == jnp.arange(self.cap)[None, :])
        ).astype(jnp.float32)
        hit = jnp.max(M, axis=0) > 0.5  # [cap]

        def place(arr, vals):
            pl = to_planes(vals.astype(arr.dtype))  # [k, 4]
            placed = from_planes(jnp.einsum("kc,kp->cp", M, pl), arr.dtype)
            return jnp.where(hit, placed, arr)

        upd = {}
        for name, v in fields.items():
            arr = getattr(self, name)
            vals = jnp.broadcast_to(jnp.asarray(v, arr.dtype), (k,))
            upd[name] = place(arr, vals)
        return self.replace(
            count=self.count + jnp.sum(ok).astype(i32), **upd
        )

    # -- bulk ops -----------------------------------------------------------

    def step_all(self) -> "Entities":
        """Vectorised Entity::step for all live slots (entity.cpp:57-82)."""
        return self.step_masked(self.active)

    def step_masked(self, m: jax.Array) -> "Entities":
        """Entity::step applied only where ``m`` — one fused elementwise
        pass (a slot-0 backup/restore around step_all costs ~60 tiny
        gather/update ops per step under vmap)."""
        x = jnp.where(m & ~self.smart_step, self.x + self.vx, self.x)
        y = jnp.where(m & ~self.smart_step, self.y + self.vy, self.y)
        rotation = jnp.where(m, self.rotation + self.vrot, self.rotation)
        vx = jnp.where(m, self.vx * self.friction, self.vx)
        vy = jnp.where(m, self.vy * self.friction, self.vy)
        life = jnp.where(m, self.life_time + 1, self.life_time)
        expire = m & (self.expire_time > 0) & (life > self.expire_time)
        will_erase = self.will_erase | expire
        img = jnp.where(
            m & (self.type == EXPLOSION) & (self.image_type < EXPLOSION5),
            self.image_type + 1,
            self.image_type,
        )
        rx = jnp.where(m, self.rx * self.grow_rate, self.rx)
        ry = jnp.where(m, self.ry * self.grow_rate, self.ry)
        alpha = jnp.where(m, self.alpha * self.alpha_decay, self.alpha)
        return self.replace(
            x=x, y=y, rotation=rotation, vx=vx, vy=vy, life_time=life,
            will_erase=will_erase, image_type=img, rx=rx, ry=ry, alpha=alpha,
        )

    def compact(self, keep: jax.Array) -> "Entities":
        """Stable-erase slots where ``keep`` is False (live slots only).

        The permutation is applied as ONE one-hot matmul over all fields
        stacked into a [cap, nf*4] byte-plane matrix instead of per-field
        gathers: under vmap, batched gathers lower to serialized TPU ops
        (measured 3.6 ms per step at 4096 envs for a cap-2 pool), while the
        matmul form is a single MXU op.  The 8-bit plane split
        (core/exact.py) keeps every field bit-exact even when XLA lowers
        the f32 dot to bf16 operands.
        """
        from .exact import stack_planes, unstack_planes

        keep = keep & self.active
        new_count = jnp.sum(keep).astype(i32)
        # stable-partition permutation straight from prefix sums (argsort is
        # a multi-ms bitonic sort per env on TPU): kept slots pack to the
        # front in order, everything else follows in original order
        newpos = jnp.where(
            keep,
            jnp.cumsum(keep.astype(i32)) - 1,
            new_count + jnp.cumsum((~keep).astype(i32)) - 1,
        )
        names = [k for k in self.__dataclass_fields__ if k != "count"]
        F = stack_planes([getattr(self, k) for k in names])  # [cap, nf*4]
        P = (newpos[None, :] == jnp.arange(self.cap)[:, None]).astype(f32)
        G = P @ F  # [cap, nf*4]
        cols = unstack_planes(G, [getattr(self, k).dtype for k in names])
        return self.replace(
            count=new_count, **{k: cols[j] for j, k in enumerate(names)}
        )


def default_fields(x, y, vx, vy, rx, ry, type_) -> dict[str, Any]:
    """Entity constructor defaults (entity.cpp:8-52)."""
    if isinstance(type_, int):
        is_expl = type_ == EXPLOSION
        is_trail = type_ == TRAIL
        grow = 1.4 if is_expl else (1.05 if is_trail else 1.0)
        expire = 4 if is_expl else -1
        adecay = 0.8 if is_trail else 1.0
    else:
        t = jnp.asarray(type_, i32)
        is_expl = t == EXPLOSION
        is_trail = t == TRAIL
        grow = jnp.where(is_expl, 1.4, jnp.where(is_trail, 1.05, 1.0))
        expire = jnp.where(is_expl, 4, -1)
        adecay = jnp.where(is_trail, 0.8, 1.0)
    return dict(
        x=x, y=y, vx=vx, vy=vy, rx=rx, ry=ry, type=type_, image_type=type_,
        image_theme=0, will_erase=False, collides_with_entities=False,
        collision_margin=0.0, rotation=0.0, is_reflected=False, vrot=0.0,
        alpha=1.0, grow_rate=grow, alpha_decay=adecay, fire_time=-1,
        spawn_time=-1, expire_time=expire, life_time=0, health=1.0,
        theta=-100.0, friction=1.0, smart_step=False, avoids_collisions=False,
        auto_erase=True, render_z=0, use_abs_coords=False, climber_spawn_x=0.0,
    )
