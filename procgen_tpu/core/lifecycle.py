"""Episode lifecycle: Game::reset / Game::step as pure transitions.

Reference: procgen/src/game.cpp:109-171.  ``observe`` (rendering + info) is a
separate stage (render package); auto-reset is handled by the vector runtime
(parallel package) so that level generation cost is paid only for envs that
actually finished — the TPU replacement for "reset() inside step()".
"""

from __future__ import annotations

import jax.numpy as jnp

from . import rng
from .game import BasicAbstractGame, BasicState, tree_where
from .entities import Entities
from ..render import assetgen

f32 = jnp.float32
i32 = jnp.int32


def initial_state(game: BasicAbstractGame, lsrg_seed) -> BasicState:
    """A freshly-constructed Game (ctor defaults, pre-first-reset).

    ``lsrg_seed`` is this env's level_seed_rand_gen seed, drawn from the
    master seed generator (vecgame.cpp:363).
    """
    z32 = jnp.zeros((), i32)
    zf = jnp.zeros((), f32)
    return BasicState(
        level_seed_rand_gen=rng.seed(lsrg_seed),
        rand_gen=rng.unseeded(),
        current_level_seed=z32,
        prev_level_seed=z32,
        episodes_remaining=z32,
        episode_done=jnp.asarray(False),
        reward=zf,
        done=jnp.asarray(True),  # step_data.done = true at ctor (game.cpp:58)
        level_complete=jnp.asarray(False),
        action=z32,
        cur_time=z32,
        last_reward_timer=z32,
        last_reward=jnp.asarray(-1.0, f32),
        total_reward=zf,
        reset_count=z32,
        grid=jnp.zeros((game.WORLD_DIM_MAX[1], game.WORLD_DIM_MAX[0]), i32),
        main_width=jnp.asarray(game.WORLD_DIM_MAX[0], i32),
        main_height=jnp.asarray(game.WORLD_DIM_MAX[1], i32),
        ents=Entities.zeros(game.ENT_CAP),
        bg_pct_x=zf,
        background_index=z32,
        last_move_action=jnp.asarray(7, i32),  # cpp ctor (:39)
        move_action=z32,
        special_action=z32,
        mixrate=jnp.asarray(game.mixrate, f32),
        maxspeed=jnp.asarray(game.maxspeed, f32),
        max_jump=jnp.asarray(game.max_jump, f32),
        action_vx=zf,
        action_vy=zf,
        action_vrot=zf,
        step_rand_int=z32,
        visibility=jnp.asarray(game.visibility, f32),
        step_draws=z32,
        decor=Entities.zeros(game.DECOR_CAP) if game.DECOR_CAP else None,
        bg_canvas=(
            jnp.zeros((assetgen.CAN, assetgen.CAN, 3), jnp.uint8)
            if game.uses_procgen_background
            else None
        ),
        frame=(
            jnp.zeros((64, 64, 3), jnp.uint8) if game.static_prefix else None
        ),
        game=game.game_init_state(),
    )


def env_reset(game: BasicAbstractGame, s: BasicState) -> BasicState:
    """Game::reset (game.cpp:109-134)."""
    s = s.replace(reset_count=s.reset_count + 1)
    need_new = s.episodes_remaining == 0

    lsr2, drawn = rng.randint(
        s.level_seed_rand_gen, game.level_seed_low, game.level_seed_high
    )
    if game.options.use_sequential_levels:
        take_seq = s.level_complete
        new_seed = jnp.where(take_seq, s.current_level_seed + 997, drawn)
        lsr = tree_where(need_new & ~take_seq, lsr2, s.level_seed_rand_gen)
    else:
        new_seed = drawn
        lsr = tree_where(need_new, lsr2, s.level_seed_rand_gen)

    cur = jnp.where(need_new, new_seed, s.current_level_seed)
    s = s.replace(
        level_seed_rand_gen=lsr,
        current_level_seed=cur,
        episodes_remaining=jnp.where(need_new, 1, s.episodes_remaining),
        # the else-branch clears step_data; the new-seed branch keeps it
        # (so the final step's reward survives into observe) — game.cpp:117-126
        reward=jnp.where(need_new, s.reward, 0.0),
        done=jnp.where(need_new, s.done, False),
        level_complete=jnp.where(need_new, s.level_complete, False),
        rand_gen=rng.seed(cur.astype(jnp.uint32)),
    )
    s = game.game_reset(s)
    # normalize the stream so env_step's peek pays a single twist
    s = s.replace(rand_gen=rng.normalize(s.rand_gen))
    if game.static_prefix:
        # compose the per-level static render prefix once (bg + grid +
        # colored cells); the per-step render pays only the sprite suffix
        from ..render.renderer import render_obs

        s = s.replace(frame=render_obs(game, s, 64, prefix_only=True))
    return s.replace(
        cur_time=jnp.zeros((), i32),
        total_reward=jnp.zeros((), f32),
        episodes_remaining=s.episodes_remaining - 1,
        action=jnp.asarray(game.default_action, i32),
    )


def env_step(game: BasicAbstractGame, s: BasicState, action) -> tuple[BasicState, jnp.ndarray]:
    """Game::step (game.cpp:136-171) minus observe.

    Returns ``(state, needs_reset)`` — the caller must run the batched
    reset for envs where ``needs_reset`` and then observe.
    """
    s = s.replace(action=jnp.asarray(action, i32), cur_time=s.cur_time + 1)
    will_force = s.action == -1
    s = s.replace(
        action=jnp.where(will_force, game.default_action, s.action),
        reward=jnp.zeros((), f32),
        done=jnp.asarray(False),
        level_complete=jnp.asarray(False),
    )

    draws, norm_rg = rng.peek_block(
        s.rand_gen, game.MAX_STEP_DRAWS, assume_normalized=True
    )
    s = s.replace(rand_gen=norm_rg)
    s, draws = game.game_step(s, draws)
    s = s.replace(
        rand_gen=rng.commit(s.rand_gen, draws), step_draws=draws.cursor
    )

    done = s.done | will_force | (s.cur_time >= game.timeout)
    s = s.replace(done=done, total_reward=s.total_reward + s.reward)
    got_r = s.reward != 0
    s = s.replace(
        last_reward_timer=jnp.where(got_r, 10, s.last_reward_timer),
        last_reward=jnp.where(got_r, s.reward, s.last_reward),
        prev_level_seed=s.current_level_seed,
    )

    needs_reset = s.done
    if game.options.use_sequential_levels:
        s = s.replace(done=jnp.where(s.level_complete, False, s.done))
    s = s.replace(episode_done=s.done)
    return s, needs_reset
