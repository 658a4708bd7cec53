"""Game base classes: episode lifecycle + the shared 2D physics engine.

This is the TPU-native re-design of the reference's ``Game`` (game.cpp) and
``BasicAbstractGame`` (basic-abstract-game.cpp).  Key translation decisions:

* A game is a plain Python class holding only **static** configuration (the
  C++ virtual table becomes trace-time dispatch: XLA sees only the branches
  the concrete game can actually take).
* All dynamic per-env data lives in ``BasicState`` — a pytree of arrays with
  fixed shapes, so ``jit(vmap(step))`` compiles once per (game, options).
* Step-path randomness uses the one-twist-per-step ``Draws`` cursor; the
  reset path uses checked per-draw calls (resets are rare and batched).
* Iteration-order-sensitive loops (reverse entity scans, erase-mid-loop,
  push chains) are reproduced exactly with ``lax.scan``/``fori_loop`` over
  packed entity slots; order-insensitive work is vectorised.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

from . import rng
from .constants import (
    INVALID_OBJ,
    MAXVTHETA,
    MIXRATEROT,
    PLAYER,
    POS_EPS,
    SPACE,
    WALL_OBJ,
)
from .entities import Entities, default_fields
from .options import GameOptions

f32 = jnp.float32
i32 = jnp.int32


def onehot_select(si, *arrays):
    """Values of [cap] arrays at traced slot ``si`` via ONE one-hot matmul.

    The obvious ``arr[si]`` is a traced-index gather, which XLA-TPU
    serializes through SMEM (measured ~2.4ms per [4096, cap] lookup under
    the env vmap); the one-hot einsum is a single MXU/VPU op, kept
    bit-exact under any XLA matmul precision by the 8-bit plane split
    (core/exact.py).  Static slots take the plain (free) indexed read."""
    from .exact import stack_planes, unstack_planes

    if isinstance(si, int):
        return tuple(a[si] for a in arrays)
    cap = arrays[0].shape[0]
    oh = (jnp.arange(cap) == si).astype(f32)
    F = stack_planes(arrays)  # [cap, k*4]
    vals = jnp.einsum("c,cf->f", oh, F)
    return unstack_planes(vals, [a.dtype for a in arrays])


def tree_where(cond, a, b):
    """Leaf-wise select, skipping leaves the branch never touched.

    ``x is y`` means the branch carried the leaf through unchanged
    (struct.replace preserves untouched field objects), so the select is an
    identity — skipping it keeps full-state selects from dragging the
    [Hmax, Wmax] grid and entity pools through every masked scan iteration
    (the difference between 607ms and ~60ms per coinrun step at 4096 envs).
    """
    return jax.tree_util.tree_map(
        lambda x, y: x if x is y else jnp.where(cond, x, y), a, b
    )


@struct.dataclass
class BasicState:
    """All dynamic per-env state (Game + BasicAbstractGame fields)."""

    # Game (game.h:64-134)
    level_seed_rand_gen: rng.MTState
    rand_gen: rng.MTState
    current_level_seed: jax.Array
    prev_level_seed: jax.Array
    episodes_remaining: jax.Array
    episode_done: jax.Array
    reward: jax.Array  # step_data.reward
    done: jax.Array  # step_data.done
    level_complete: jax.Array  # step_data.level_complete
    action: jax.Array
    cur_time: jax.Array
    last_reward_timer: jax.Array
    last_reward: jax.Array
    total_reward: jax.Array
    reset_count: jax.Array
    # BasicAbstractGame (basic-abstract-game.h:121-168)
    grid: jax.Array  # i32[Hmax, Wmax]; live region is [:main_height, :main_width]
    main_width: jax.Array
    main_height: jax.Array
    ents: Entities
    bg_pct_x: jax.Array
    background_index: jax.Array
    last_move_action: jax.Array
    move_action: jax.Array
    special_action: jax.Array
    mixrate: jax.Array
    maxspeed: jax.Array
    max_jump: jax.Array
    action_vx: jax.Array
    action_vy: jax.Array
    action_vrot: jax.Array
    step_rand_int: jax.Array
    visibility: jax.Array
    # rand_gen words consumed by the last game_step (diagnostic: must stay
    # <= game.MAX_STEP_DRAWS or the mt19937 stream silently corrupts —
    # asserted by tests/test_draw_budget.py and the debug-mode runtime check)
    step_draws: jax.Array = None
    # decorative entities (trails, explosions): rendered + aged but excluded
    # from all collision logic.  The reference keeps them in the same vector;
    # splitting the pool keeps interactive-entity scans small (TPU-first) at
    # the cost of intra-z-level paint order among decoratives (documented).
    decor: Entities = None
    # cached static render prefix (bg + grid + colored cells composed at
    # reset, u8[64,64,3]); only for games with ``static_prefix`` — their
    # prefix layers are immutable within an episode, so the per-step render
    # pays only the dynamic z>=0 sprite suffix (render/renderer.py)
    frame: Any = None
    # procedurally generated per-level background (use_generated_assets /
    # use_procgen_background, cpp:778-782); u8[CAN, CAN, 3] or None
    bg_canvas: Any = None
    # per-game extension pytree
    game: Any = None


class BasicAbstractGame:
    """Static game definition + pure transition functions.

    Subclasses override the ``game_*`` hooks and the physics relations, then
    declare static capacities (``WORLD_DIM_MAX``, ``ENT_CAP``...).
    """

    name = "abstract"

    # -- static capacities (override per game) ------------------------------
    WORLD_DIM_MAX: tuple[int, int] = (64, 64)  # (Wmax, Hmax)
    ENT_CAP: int = 64
    MAX_STEP_DRAWS: int = 64  # words of rand_gen consumed per game_step
    MAX_SUB_STEPS: int = 8  # >= 4*sqrt(vx^2+vy^2) worst case
    GRID_COLLISION_RANGE: int = 2  # cells probed per axis in check_grid_collisions
    # static physics specialisation
    ENTITY_SCAN: bool = False  # sub_step scans entities (block/reflect pairs exist)
    ENTITY_SCAN_NONAGENT: bool = False  # non-agent smart entities also scan
    # (e.g. dodgeball enemies reflecting off wall entities); the override
    # must not mutate global state so vectorised smart stepping stays valid
    PUSH_DEPTH: int = 5  # push-chain recursion cap (C++ depth limit, :265)
    ONLY_AGENT_SMART: bool = True  # only slot 0 has smart_step
    SMART_VECTORIZABLE: bool = True  # non-agent smart entities don't read each
    # other's positions (no entity-entity block/reflect among them) — their
    # sub-stepped moves commute and run vmapped instead of sequentially
    DECOR_CAP: int = 0  # capacity of the decorative pool
    # Entity types this game routes to the decorative pool (the reference
    # keeps them in the one entities vector; the state bridge splits and
    # re-merges by this set, utils/refstate.py).  Shared EXPLOSION..TRAIL
    # ids by default (object-ids.h:18-25); games with their own
    # render-only types (bossfight LASER_TRAIL, caveflyer EXHAUST,
    # dodgeball DUST_CLOUD) extend it.
    DECOR_TYPES: frozenset = frozenset(range(54, 60))
    # static render_z levels each pool can contain (agent is always z=1,
    # cpp game_reset; miner's exit is z=-1).  The sprite pass builds one
    # canvas per level, so keeping this tight cuts render HBM traffic.
    ENT_Z_LEVELS: tuple = (0, 1)
    DECOR_Z_LEVELS: tuple = (0,)  # trails/explosions spawn at default z=0
    PALLAS_BG: str = "standard"  # background mode of the fused render
    # kernel: "standard" (crop / bg_tile_ratio tiling) or "scroll"
    # (starpilot's time-scrolled tiles)
    # The game's background/grid/colored-cell layers never change within an
    # episode as rendered: no mid-episode grid write is ever observed (e.g.
    # maze clears the cheese cell only on the terminal step, whose state is
    # replaced by auto-reset before observe).  Combined with a static
    # camera and no z<0 draws (``static_prefix`` below), the composed
    # prefix frame is cached in state at reset.  Guarded per game by
    # tests/test_static_frame.py's frame-vs-full-render rollouts.
    STATIC_RENDER_PREFIX: bool = False
    ANY_COLLIDES_WITH_ENTITIES: bool = False  # O(E^2) dispatch needed
    DISPATCH_VECTORIZED: bool = False  # all collision handlers commute: use
    # the phased vectorised dispatch (handle_agent_collision_vec + optional
    # dispatch_entity_pairs + agent-only grid probe) instead of the exact
    # reverse-order scan
    GRID_HANDLER_AGENT_ONLY: bool = True  # handle_grid_collision only acts
    # on the PLAYER (true for every reference game: "Right now obj is always
    # the agent", cpp:394-399)
    SEQUENTIAL_AGENT_HANDLERS: bool = False  # agent-collision handlers must run in
    # reverse entity order (order-sensitive side effects); else vectorised-safe
    # games may still get the sequential scan (default) — this flag reserved.

    @property
    def static_prefix(self) -> bool:
        """Cache the bg+grid+cell render prefix per level (see
        STATIC_RENDER_PREFIX).  Requires a static camera (not
        center_agent — maze memory mode forces it on) and no z<0 draws."""
        return (
            self.STATIC_RENDER_PREFIX
            and not self.center_agent
            and self.PALLAS_BG != "scroll"
            and all(z >= 0 for z in self.ENT_Z_LEVELS)
            and all(z >= 0 for z in self.DECOR_Z_LEVELS)
        )

    def __init__(self, options: GameOptions):
        self.options = options
        # Game ctor (game.cpp:46-60)
        self.timeout = 1000
        self.default_action = 0
        self.fixed_asset_seed = 0
        self.grid_step = False
        self.level_seed_low = 0
        self.level_seed_high = 1
        self.game_type = 0
        # BasicAbstractGame ctor (basic-abstract-game.cpp:22-46)
        self.char_dim = 5.0
        self.visibility = 16.0
        self.min_visibility = 0.0
        self.mixrate = 0.5
        self.maxspeed = 0.5
        self.max_jump = 0.5
        self.default_action = 4
        self.bg_tile_ratio = 0.0
        self.out_of_bounds_object = INVALID_OBJ
        self.has_useful_vel_info = True
        self.random_agent_start = True
        self.center_agent = options.center_agent

    # ------------------------------------------------------------------
    # capacities / derived statics
    # ------------------------------------------------------------------

    @property
    def grid_cap(self) -> int:
        return self.WORLD_DIM_MAX[0] * self.WORLD_DIM_MAX[1]

    @property
    def uses_procgen_background(self) -> bool:
        """game_init (cpp:54-66): generated assets (or a game with no
        background images) fall back to a single procedurally painted
        background regenerated every reset."""
        return self.options.use_generated_assets or not self.background_names()

    def num_backgrounds(self) -> int:
        """Static count of the game's background group (resources.cpp:828-953)."""
        if self.uses_procgen_background:
            return 1
        return len(self.background_names())

    def background_names(self) -> list[str]:
        """Override: list of background asset paths (load_background_images)."""
        return []

    # ------------------------------------------------------------------
    # virtual hooks (override per game)
    # ------------------------------------------------------------------

    def choose_world_dim(self, s: BasicState) -> BasicState:
        return s

    def game_reset(self, s: BasicState) -> BasicState:
        raise NotImplementedError

    def game_step(self, s: BasicState, d: rng.Draws):
        raise NotImplementedError

    def game_init_state(self) -> Any:
        """Initial value of the per-game extension pytree."""
        return None

    def is_blocked(self, s, src_type, target_type, is_horizontal):
        """basic-abstract-game.cpp:494-501."""
        blocked = target_type == WALL_OBJ
        blocked |= target_type == self.out_of_bounds_object
        return blocked

    def is_blocked_ents(self, s, rec, other, is_horizontal):
        """rec: the moving entity's record; other: target slot index."""
        return self.is_blocked(s, rec["type"], s.ents.type[other], is_horizontal)

    def will_reflect(self, src_type, target_type):
        return jnp.asarray(False)

    def handle_agent_collision(self, s, d, i):
        return s, d

    def handle_grid_collision(self, s, d, slot, type_, ix, iy):
        return s, d

    def handle_collision(self, s, d, src, target):
        return s, d

    def get_agent_acceleration_scale(self, s):
        return f32(1.0)

    def set_action_xy(self, s: BasicState, move_action) -> BasicState:
        """basic-abstract-game.cpp:667-671."""
        return s.replace(
            action_vx=(move_action // 3 - 1).astype(f32),
            action_vy=(move_action % 3 - 1).astype(f32),
            action_vrot=f32(0.0),
        )

    def update_agent_velocity(self, s: BasicState) -> BasicState:
        """basic-abstract-game.cpp:678-688."""
        v_scale = self.get_agent_acceleration_scale(s)
        vx = (1 - s.mixrate) * s.ents.vx[0]
        vy = (1 - s.mixrate) * s.ents.vy[0]
        vx += s.mixrate * s.maxspeed * s.action_vx * v_scale
        vy += s.mixrate * s.maxspeed * s.action_vy * v_scale
        s = s.replace(ents=s.ents.set_fields(0, vx=vx, vy=vy))
        return self.decay_agent_velocity(s)

    def decay_agent_velocity(self, s: BasicState) -> BasicState:
        return s.replace(
            ents=s.ents.set_fields(
                0, vx=f32(0.9) * s.ents.vx[0], vy=f32(0.9) * s.ents.vy[0]
            )
        )

    def choose_center(self, s: BasicState):
        return s.ents.x[0], s.ents.y[0]

    def camera(self, s: BasicState):
        """(cx, cy, visibility) when center_agent (prepare_for_drawing,
        cpp:828-847); games like climber/fruitbot override with scrolling
        cameras that also change visibility."""
        cx, cy = self.choose_center(s)
        return cx, cy, s.visibility

    def should_draw_entity_mask(self, s: BasicState):
        """Vectorised should_draw_entity; default draws everything."""
        return jnp.ones((self.ENT_CAP,), bool)

    def asset_for_type(self, type_: int) -> list[str]:
        """Static sprite paths per object type (names[theme])."""
        return []

    def use_block_asset(self, type_: int) -> bool:
        return False

    def image_for_type(self, s, type_):
        """cpp:446-448 (traced)."""
        return jnp.abs(type_)

    # -- asset metadata (static per type; cpp:79-123) -----------------------

    RESERVED_ASSETS = {
        54: ["misc_assets/explosion1.png"],
        55: ["misc_assets/explosion2.png"],
        56: ["misc_assets/explosion3.png"],
        57: ["misc_assets/explosion4.png"],
        58: ["misc_assets/explosion5.png"],
        59: ["misc_assets/iconCircle_white.png"],
    }

    def asset_names(self, type_: int) -> list[str]:
        if self.options.use_generated_assets:
            return []
        names = self.asset_for_type(type_)
        if not names:
            names = self.RESERVED_ASSETS.get(type_, [])
        return names

    def num_themes(self, type_: int) -> int:
        """asset_num_themes[type] (cpp:109-119); generated assets have 1."""
        names = self.asset_names(type_)
        return len(names) if names else 1

    def aspect_ratios(self, type_: int) -> jax.Array:
        """Per-theme aspect ratio table for a (static) type."""
        from ..render.assets import aspect_for

        names = self.asset_names(type_)
        if not names:
            return jnp.ones((1,), f32)
        return jnp.asarray([aspect_for(n) for n in names], f32)

    def choose_random_theme(self, s: BasicState, slot, type_: int):
        """cpp:1047-1050 — one randn draw on the reset stream."""
        s, th = self.randn(s, self.num_themes(type_))
        return s.replace(ents=s.ents.set_fields(slot, image_theme=th))

    def choose_random_theme_d(self, s: BasicState, d, slot, type_: int):
        """choose_random_theme on the step-path Draws cursor."""
        d, th = d.randn(self.num_themes(type_))
        return s.replace(ents=s.ents.set_fields(slot, image_theme=th)), d

    def choose_step_random_theme_value(self, s: BasicState, type_: int):
        """cpp:1052-1055 — step_rand_int % num_themes (no draw)."""
        return s.step_rand_int % self.num_themes(type_)

    def match_aspect_ratio(self, s: BasicState, slot, type_: int,
                           match_width: bool = True):
        """cpp:1023-1032; theme is the entity's current image_theme."""
        ar = self.aspect_ratios(type_)[
            jnp.clip(s.ents.image_theme[slot], 0, self.num_themes(type_) - 1)
        ]
        e = s.ents
        if match_width:
            return s.replace(ents=e.set_fields(slot, ry=e.rx[slot] / ar))
        return s.replace(ents=e.set_fields(slot, rx=e.ry[slot] * ar))

    def fit_aspect_ratio(self, s: BasicState, slot, type_: int):
        """cpp:1034-1045."""
        ar = self.aspect_ratios(type_)[
            jnp.clip(s.ents.image_theme[slot], 0, self.num_themes(type_) - 1)
        ]
        e = s.ents
        ry = jnp.where(ar > 1, e.rx[slot] / ar, e.ry[slot])
        rx = jnp.where(ar > 1, e.rx[slot], e.ry[slot] * ar)
        return s.replace(ents=e.set_fields(slot, rx=rx, ry=ry))

    def theme_for_grid_obj(self, s, type_):
        """cpp:450-452 (traced)."""
        return jnp.zeros_like(jnp.asarray(type_, i32))

    def render_overlay(self, s, obs, sx, sy, res, unit, vis):
        """Post-pass HUD overlays (game_draw additions after the base pipeline,
        e.g. ninja's jump-charge bar, jumper's compass).  sx/sy are pixel
        centers in screen coords; unit = res/visibility."""
        return obs

    def paint_background(self, s, res, sx, sy, bg_atlas):
        """Full background-pass override (games whose game_draw replaces
        draw_background, e.g. starpilot's time-scrolled tiling).  Return an
        [res, res, 3] i32 image, or None to use the standard pass."""
        return None

    def entity_tile_ratio(self, s, e):
        """get_tile_aspect_ratio (cpp:415-418): per-slot [cap] f32.  0 means
        stretch, >0 tiles horizontally, <0 tiles vertically within the
        entity rect (dodgeball lava walls, fruitbot barriers, leaper finish
        line)."""
        return jnp.zeros_like(e.x)

    def adjust_image_rect(self, img, x0, y0, w2, h2):
        """get_adjusted_image_rect (cpp:816-818): per-slot sprite rect tweak
        in screen coords (y down).  coinrun/leaper stretch the player sprite
        above its hitbox.  Returns (x0, y0, w2, h2)."""
        return x0, y0, w2, h2

    def grid_cell_colors(self, s, gtype, u, v):
        """Per-pixel grid coloring: (valid, r, g, b) given cell type and
        within-cell fractional coords (draw_grid_obj override point,
        e.g. chaser's small orbs, chaser.cpp:111-117)."""
        from .constants import INVALID_OBJ

        theme = self.theme_for_grid_obj(s, gtype)
        img = self.image_for_type(s, gtype)
        valid = (gtype != INVALID_OBJ) & (img >= 0) & (img != SPACE)
        r, g, b = self.color_for_type(img, theme)
        return valid, r, g, b

    def grid_cell_inset(self, s, gtype):
        """Centered sub-rect size for colored grid cells (cell fraction).

        The inset model is how the Pallas kernel expresses per-pixel cell
        patterns: a pixel is painted iff |u-0.5| < inset/2 and
        |v-0.5| < inset/2.  Default 2.0 covers the full cell for every
        u, v in [0, 1); chaser overrides for its small orbs
        (chaser.cpp:114-120)."""
        return jnp.full(jnp.shape(gtype), 2.0, jnp.float32)

    def color_for_type(self, type_, theme):
        """Flat color per (type, theme).

        Reference semantics: only defined for use_monochrome_assets or
        game-specific overrides (cpp:464-490).  Until the sprite atlas is
        wired in, the monochrome formula doubles as the placeholder palette
        for the asset path.
        """
        from ..render.assets import monochrome_color

        theme = self.mask_theme(type_, theme)
        return monochrome_color(jnp.asarray(type_, i32) % 64, theme)

    def should_preserve_type_themes(self, type_):
        """cpp:454-456 (traced over type): themes exempt from
        restrict_themes masking (heist keys/doors, leaper player, plunder
        ships)."""
        return jnp.zeros(jnp.shape(type_), bool)

    def mask_theme(self, type_, theme):
        """mask_theme_if_necessary (cpp:458-462), applied at every asset /
        color lookup (the stored image_theme keeps its drawn value)."""
        if not self.options.restrict_themes:
            return theme
        theme = jnp.asarray(theme, i32)
        return jnp.where(
            self.should_preserve_type_themes(type_), theme,
            jnp.zeros_like(theme),
        )

    def image_for_type_static(self) -> dict:
        """Optional static remap table; dynamic image_for_type handled in render."""
        return {}

    # ------------------------------------------------------------------
    # grid helpers
    # ------------------------------------------------------------------

    def get_obj(self, s: BasicState, x, y):
        """Bounds-checked grid read (basic-abstract-game.cpp:180-185).

        Flat 1-D take: the 2-D form ``grid[yc, xc]`` lowers to a serialized
        SMEM gather inside while loops on TPU (measured 2.4ms per [4096,48]
        lookup vs ~0.03ms for the flat form)."""
        x = jnp.asarray(x, i32)
        y = jnp.asarray(y, i32)
        inb = (x >= 0) & (x < s.main_width) & (y >= 0) & (y < s.main_height)
        xc = jnp.clip(x, 0, self.WORLD_DIM_MAX[0] - 1)
        yc = jnp.clip(y, 0, self.WORLD_DIM_MAX[1] - 1)
        from .exact import from_planes16, to_planes16

        wmax, hmax = self.WORLD_DIM_MAX
        oh_y = (yc[..., None] == jnp.arange(hmax)).astype(f32)
        oh_x = (xc[..., None] == jnp.arange(wmax)).astype(f32)
        # exact under any matmul precision: grid ids ride as 8-bit planes
        # (ids like KEY_OBJ=300 exceed bf16's 8-bit integer exactness)
        gp = to_planes16(s.grid)  # [H, W, 2]
        row = jnp.einsum("...h,hwp->...wp", oh_y, gp)
        val = from_planes16(jnp.einsum("...wp,...w->...p", row, oh_x))
        return jnp.where(inb, val, self.out_of_bounds_object)

    def get_obj_idx(self, s: BasicState, idx):
        """Flat-index read; flat semantics use dynamic stride main_width
        (grid.h:40-44)."""
        idx = jnp.asarray(idx, i32)
        inb = (idx >= 0) & (idx < s.main_width * s.main_height)
        mw = jnp.maximum(s.main_width, 1)
        return jnp.where(
            inb, self.get_obj(s, idx % mw, idx // mw), self.out_of_bounds_object
        )

    def set_obj(self, s: BasicState, x, y, v) -> BasicState:
        return s.replace(
            grid=s.grid.at[jnp.asarray(y, i32), jnp.asarray(x, i32)].set(
                jnp.asarray(v, i32)
            )
        )

    def set_obj_idx(self, s: BasicState, idx, v) -> BasicState:
        mw = jnp.maximum(s.main_width, 1)
        return self.set_obj(s, idx % mw, idx // mw, v)

    def get_obj_from_floats(self, s: BasicState, fx, fy):
        """basic-abstract-game.cpp:167-174."""
        neg = (fx < 0) | (fy < 0)
        x = jnp.floor(fx).astype(i32)
        y = jnp.floor(fy).astype(i32)
        return jnp.where(neg, self.out_of_bounds_object, self.get_obj(s, x, y))

    def get_obj_grid22(self, s: BasicState, fxs, fys):
        """get_obj_from_floats at the 2x2 outer grid of float coords
        ``fxs``=[...,2] x ``fys``=[...,2] in ONE separable one-hot pick
        (returns [..., 2(y), 2(x)]).  The sub-step corner probes share two
        distinct x and two distinct y values, so this replaces 4 full-grid
        lookups with one 2-row x 2-col sample."""
        fxs = jnp.asarray(fxs, f32)
        fys = jnp.asarray(fys, f32)
        x = jnp.floor(fxs).astype(i32)
        y = jnp.floor(fys).astype(i32)
        inb_x = (x >= 0) & (x < s.main_width)
        inb_y = (y >= 0) & (y < s.main_height)
        wmax, hmax = self.WORLD_DIM_MAX
        xc = jnp.clip(x, 0, wmax - 1)
        yc = jnp.clip(y, 0, hmax - 1)
        # stage 1: one einsum with the 2 y-values folded into the batch
        # dims (the fast layout: env rides the vector lanes); stage 2: two
        # masked elementwise dots (an explicit [2,K]x[K,2] dot lowers to
        # tiny MXU-padded batched matmuls, measured 100x slower)
        from .exact import from_planes16, to_planes16

        oh_y = (yc[..., None] == jnp.arange(hmax)).astype(f32)  # [...,2,H]
        gp = to_planes16(s.grid)  # [H, W, 2] byte planes (exact; see get_obj)
        rows = jnp.einsum("...h,hwp->...wp", oh_y, gp)  # [...,2,W,2]
        oh_x0 = (xc[..., 0:1] == jnp.arange(wmax)).astype(f32)  # [...,1,W]
        oh_x1 = (xc[..., 1:2] == jnp.arange(wmax)).astype(f32)
        v0 = from_planes16(jnp.sum(rows * oh_x0[..., None], axis=-2))
        v1 = from_planes16(jnp.sum(rows * oh_x1[..., None], axis=-2))
        vals = jnp.stack([v0, v1], axis=-1)  # [...,2(y),2(x)]
        ok = inb_y[..., :, None] & inb_x[..., None, :]
        neg = (fys < 0)[..., :, None] | (fxs < 0)[..., None, :]
        return jnp.where(ok & ~neg, vals, self.out_of_bounds_object)


    def fill_elem(self, s: BasicState, x, y, dx, dy, elem) -> BasicState:
        """Static-extent rectangle fill (basic-abstract-game.cpp:125-131).

        dx/dy may be traced; computed as a scatter-free masked select over the
        static [Hmax, Wmax] buffer.
        """
        gx = jnp.arange(self.WORLD_DIM_MAX[0])[None, :]
        gy = jnp.arange(self.WORLD_DIM_MAX[1])[:, None]
        m = (gx >= x) & (gx < x + dx) & (gy >= y) & (gy < y + dy)
        m &= (gx < s.main_width) & (gy < s.main_height)
        return s.replace(grid=jnp.where(m, jnp.asarray(elem, i32), s.grid))

    # ------------------------------------------------------------------
    # collision predicates (vectorisable)
    # ------------------------------------------------------------------

    def has_collision(self, s, a, b, margin=0.0):
        """AABB overlap of slots a,b (basic-abstract-game.cpp:1154-1159)."""
        e = s.ents
        tx = e.rx[a] + e.rx[b] + margin
        ty = e.ry[a] + e.ry[b] + margin
        return (jnp.abs(e.x[a] - e.x[b]) < tx) & (jnp.abs(e.y[a] - e.y[b]) < ty)

    def collision_mask_vs_slot(self, s, slot, margin):
        """has_collision(slot, i) for every live slot i."""
        e = s.ents
        tx = e.rx[slot] + e.rx + margin
        ty = e.ry[slot] + e.ry + margin
        m = (jnp.abs(e.x[slot] - e.x) < tx) & (jnp.abs(e.y[slot] - e.y) < ty)
        return m & e.active

    def has_agent_collision_mask(self, s):
        """has_agent_collision for every slot (cpp:1135-1140)."""
        e = s.ents
        m = self.collision_mask_vs_slot(s, 0, e.collision_margin)
        return m & (e.type != PLAYER)

    def is_out_of_bounds_mask(self, s):
        """cpp:1077-1093, vectorised over slots."""
        e = s.ents
        w = s.main_width.astype(f32)
        h = s.main_height.astype(f32)
        return (
            (e.x + e.rx < 0) | (e.y + e.ry < 0) | (e.x - e.rx > w) | (e.y - e.ry > h)
        )

    # ------------------------------------------------------------------
    # movement: sub_step / push_obj / basic_step_object (cpp:248-380,602-665)
    # ------------------------------------------------------------------

    # The movement core operates on per-entity *records* (dicts of scalars:
    # x, y, vx, vy, rx, ry, type, will_erase) so the same traced code serves
    # two execution styles:
    #   * the agent: sequential, with the entity scan able to mutate both
    #     the record and global state (push chains, is_on_crate-style flags);
    #   * non-agent smart entities: vmapped in one shot when
    #     SMART_VECTORIZABLE (they read only the grid + own record).

    @staticmethod
    def _rec_of(e: Entities, slot) -> dict:
        return {
            "x": e.x[slot], "y": e.y[slot], "vx": e.vx[slot], "vy": e.vy[slot],
            "rx": e.rx[slot], "ry": e.ry[slot], "type": e.type[slot],
            "will_erase": e.will_erase[slot],
        }

    def _sub_step_rec(self, s, rec, vx, vy, depth: int, is_agent: bool):
        """One axis-aligned micro-move (cpp:278-380).  Returns (s, rec, blocked).

        ``depth`` is a Python int — push recursion unrolls at trace time up
        to PUSH_DEPTH (C++ cap, cpp:263-267).  Corner cells come from the
        full-grid 2x2 separable sample ``get_obj_grid22``.
        """
        skip = rec["will_erase"]
        nx = rec["x"] + vx
        ny = rec["y"] + vy
        margin = f32(0.98)
        horiz = vx != 0

        # corner probes (4 lookups -> one 2x2 separable sample)
        pxs = jnp.stack([nx - rec["rx"] * margin, nx + rec["rx"] * margin])
        pys = jnp.stack([ny - rec["ry"] * margin, ny + rec["ry"] * margin])
        t22 = self.get_obj_grid22(s, pxs, pys)  # [2(y), 2(x)]
        block = jnp.any(self.is_blocked(s, rec["type"], t22, horiz))
        reflect = jnp.any(self.will_reflect(rec["type"], t22))

        rx_, ry_ = rec["rx"], rec["ry"]
        dx_ref = jnp.where(
            vx < 0, jnp.ceil(nx - rx_) - (nx - rx_), jnp.floor(nx + rx_) - (nx + rx_)
        )
        dy_ref = jnp.where(
            vy < 0, jnp.ceil(ny - ry_) - (ny - ry_), jnp.floor(ny + ry_) - (ny + ry_)
        )
        nx_ref = nx + 2 * dx_ref
        ny_ref = ny + 2 * dy_ref
        if self.grid_step:
            nx_blk, ny_blk = rec["x"], rec["y"]
        else:
            nx_blk = jnp.where(vx > 0, jnp.floor(nx + rx_) - rx_, jnp.ceil(nx - rx_) + rx_)
            ny_blk = jnp.where(vy > 0, jnp.floor(ny + ry_) - ry_, jnp.ceil(ny - ry_) + ry_)

        new = dict(rec)
        new["x"] = jnp.where(
            reflect, jnp.where(horiz, nx_ref, nx), jnp.where(block & horiz, nx_blk, nx)
        )
        vert = jnp.logical_not(horiz)
        new["y"] = jnp.where(
            reflect,
            jnp.where(horiz, ny, ny_ref),
            jnp.where(block & vert, ny_blk, ny),
        )
        new["vx"] = jnp.where(reflect & horiz, -rec["vx"], rec["vx"])
        new["vy"] = jnp.where(reflect & vert, -rec["vy"], rec["vy"])
        rec = tree_where(skip, rec, new)

        block2 = jnp.asarray(False)
        if (is_agent and self.ENTITY_SCAN) or (
            not is_agent and self.ENTITY_SCAN_NONAGENT
        ):
            s, rec, block2 = self._entity_scan(s, rec, vx, vy, depth)

        blocked = jnp.where(skip, False, block | block2)
        return s, rec, blocked

    def _entity_scan(self, s, rec, vx, vy, depth: int):
        """Reverse scan over entities: blocking pushes + reflections
        (cpp:343-379).  Sequential default; games override with vectorised
        equivalents when the interaction structure allows (e.g. coinrun's
        crate landing).  Only reached for the agent (slot 0)."""
        horiz = vx != 0
        cap = self.ENT_CAP

        def body(carry, j):
            s, rec, block2 = carry
            # reverse order over LIVE slots only: pools are contiguously
            # compacted, so the loop is bounded by e.count (under vmap the
            # fori_loop runs to the batch max, not ENT_CAP — coinrun
            # carries ~7 live of 48 slots at steady state)
            e = s.ents
            i = jnp.clip(e.count - 1 - j, 0, cap - 1)
            valid = (j < e.count) & (i != 0) & ~e.will_erase[i]
            tx = rec["rx"] + e.rx[i] + POS_EPS
            ty = rec["ry"] + e.ry[i] + POS_EPS
            coll = (jnp.abs(rec["x"] - e.x[i]) < tx) & (
                jnp.abs(rec["y"] - e.y[i]) < ty
            )
            coll &= valid & ~rec["will_erase"]
            blocked_e = self.is_blocked_ents(s, rec, i, horiz)
            refl = self.will_reflect(rec["type"], e.type[i])

            # reflection branch (cpp:357-369)
            do_refl = coll & ~blocked_e & refl
            delx = e.x[i] - rec["x"]
            dely = e.y[i] - rec["y"]
            rsumx = e.rx[i] + rec["rx"]
            rsumy = e.ry[i] + rec["ry"]
            bx = rec["x"] + jnp.where(vx > 0, -2 * (rsumx - delx), 2 * (rsumx + delx))
            by = rec["y"] + jnp.where(vy > 0, -2 * (rsumy - dely), 2 * (rsumy + dely))
            new = dict(rec)
            new["x"] = jnp.where(do_refl & horiz, bx, rec["x"])
            new["y"] = jnp.where(do_refl & ~horiz, by, rec["y"])
            new["vx"] = jnp.where(do_refl & horiz, -rec["vx"], rec["vx"])
            new["vy"] = jnp.where(do_refl & ~horiz, -rec["vy"], rec["vy"])
            rec = new

            # blocking branch: push chain (cpp:371-373)
            curr_block = coll & blocked_e
            s, rec = self._push_obj(s, i, rec, vx, vy, depth,
                                    do=curr_block)
            return (s, rec, block2 | curr_block), None

        def fbody(j, carry):
            carry, _ = body(carry, j)
            return carry

        s, rec, block2 = jax.lax.fori_loop(
            0, s.ents.count, fbody, (s, rec, jnp.asarray(False))
        )
        return s, rec, block2

    def _push_obj(self, s, src, rec, vx, vy, depth: int, do):
        """push_obj(src, target=rec) (cpp:248-276), masked by ``do``:
        displace the mover flush against slot ``src`` via recursive sub_step,
        then zero the pushed axis velocity."""
        e = s.ents
        horiz = vx != 0

        def sign(v):
            return jnp.where(v > 0, 1.0, jnp.where(v < 0, -1.0, 0.0))

        rsum = jnp.where(horiz, e.rx[src] + rec["rx"], e.ry[src] + rec["ry"])
        delx = rec["x"] - e.x[src]
        dely = rec["y"] - e.y[src]
        t_vx = jnp.where(horiz, e.x[src] + sign(delx) * rsum - rec["x"], 0.0)
        t_vy = jnp.where(horiz, 0.0, e.y[src] + sign(dely) * rsum - rec["y"])

        if depth < self.PUSH_DEPTH:
            s2, rec2, _blk = self._sub_step_rec(
                s, rec, t_vx, t_vy, depth + 1, True)
            s = tree_where(do, s2, s)
            rec = tree_where(do, rec2, rec)

        rec = dict(rec)
        rec["vx"] = jnp.where(do & horiz, 0.0, rec["vx"])
        rec["vy"] = jnp.where(do & ~horiz, 0.0, rec["vy"])
        return s, rec

    def _basic_step_rec(self, s, rec, is_agent: bool):
        """basic_step_object on a record (cpp:602-665)."""
        skip = rec["will_erase"]

        if self.grid_step:
            num_sub = jnp.asarray(1, i32)
            max_sub = 1
        else:
            speed = jnp.sqrt(rec["vx"] ** 2 + rec["vy"] ** 2)
            num_sub = jnp.maximum(4, (4 * speed).astype(i32))
            max_sub = self.MAX_SUB_STEPS
        pct = f32(1.0) / num_sub.astype(f32)

        cmp = jnp.abs(rec["vx"]) - jnp.abs(rec["vy"])
        step_x_first = jnp.where(cmp == 0, s.step_rand_int % 2 == 0, cmp > 0)
        is_player_t = rec["type"] == PLAYER
        step_x_first = jnp.where(
            is_player_t & (s.action_vx != 0), True, step_x_first
        )
        step_x_first = jnp.where(
            is_player_t & (s.action_vy != 0), False, step_x_first
        )

        # Only the agent's entity scan can mutate global state (push
        # side-flags like coinrun's is_on_crate); non-agent movers are pure
        # in s, so their substep scan carries just the record — carrying s
        # under the slot-vmap would materialize a per-slot copy of the
        # grid/pools every iteration (measured: 600+ ms/step at 4096
        # coinrun envs).
        carry_state = is_agent and self.ENTITY_SCAN

        def axis(s_, rec, horiz_axis):
            # C++ derives is_horizontal from _vx != 0, so a zero-velocity
            # x-axis call behaves as vertical — mirrored since vx_=0
            v = jnp.where(horiz_axis, rec["vx"] * pct, rec["vy"] * pct)
            vx_ = jnp.where(horiz_axis, v, 0.0)
            vy_ = jnp.where(horiz_axis, 0.0, v)
            return self._sub_step_rec(s_, rec, vx_, vy_, 0, is_agent)

        def sub_math(s, rec, vx_pct, vy_pct, broken, si):
            live = (si < num_sub) & ~broken
            # axis order is data-dependent and the axis math is branchless,
            # so ONE chain with a traced axis flag replaces computing both
            # orders (the per-env select between two full chains costs 2x)
            s2, r1, b1 = axis(s, rec, step_x_first)
            s2, rec2, b2 = axis(s2, r1, ~step_x_first)
            bx = jnp.where(step_x_first, b1, b2)
            by = jnp.where(step_x_first, b2, b1)

            s = tree_where(live, s2, s)
            rec = tree_where(live, rec2, rec)
            vx_pct += jnp.where(live & ~bx, 1.0, 0.0)
            vy_pct += jnp.where(live & ~by, 1.0, 0.0)
            broken |= live & bx & by
            return s, rec, vx_pct, vy_pct, broken

        # Dynamic trip count: the C++ runs num_sub = max(4, 4*|v|)
        # sub-steps per mover (cpp:602-616) but a static unroll pays
        # MAX_SUB_STEPS for everyone.  A while_loop under vmap runs to
        # the BATCH max of num_sub — typically 4 when no mover is fast —
        # with identical per-iteration masking, so trajectories are
        # unchanged.  max_sub stays as a hard safety clamp.
        if carry_state:
            def w_cond(carry):
                _s, _rec, _vx, _vy, broken, si = carry
                return (si < jnp.minimum(num_sub, max_sub)) & ~broken

            def w_body(carry):
                s, rec, vx_pct, vy_pct, broken, si = carry
                s, rec, vx_pct, vy_pct, broken = sub_math(
                    s, rec, vx_pct, vy_pct, broken, si
                )
                return (s, rec, vx_pct, vy_pct, broken, si + 1)

            (s, rec, vx_pct, vy_pct, _, _) = jax.lax.while_loop(
                w_cond, w_body,
                (s, rec, f32(0.0), f32(0.0), jnp.asarray(False),
                 jnp.asarray(0, i32)),
            )
        else:
            def w_cond(carry):
                _rec, _vx, _vy, broken, si = carry
                return (si < jnp.minimum(num_sub, max_sub)) & ~broken

            def w_body(carry):
                rec, vx_pct, vy_pct, broken, si = carry
                s2, rec, vx_pct, vy_pct, broken = sub_math(
                    s, rec, vx_pct, vy_pct, broken, si
                )
                # trace-time purity check (leaf identity: tree_where skips
                # untouched leaves, so mutation shows as a fresh leaf)
                if any(
                    a is not b
                    for a, b in zip(
                        jax.tree_util.tree_leaves(s2),
                        jax.tree_util.tree_leaves(s),
                    )
                ):
                    raise AssertionError(
                        f"{self.name}: non-state-carrying mover mutated "
                        "state; it must run with the state-carrying scan"
                    )
                return (rec, vx_pct, vy_pct, broken, si + 1)

            (rec, vx_pct, vy_pct, _, _) = jax.lax.while_loop(
                w_cond, w_body,
                (rec, f32(0.0), f32(0.0), jnp.asarray(False),
                 jnp.asarray(0, i32)),
            )
        rec = dict(rec)
        rec["vx"] = rec["vx"] * (vx_pct / num_sub.astype(f32))
        rec["vy"] = rec["vy"] * (vy_pct / num_sub.astype(f32))
        # C++ early-returns on will_erase; callers re-select the original
        # record under `skip`, and `skip` suppresses all scan side effects.
        del skip
        return s, rec

    def basic_step_object_agent(self, s: BasicState) -> BasicState:
        """Move the agent (slot 0) with full sequential semantics."""
        rec0 = self._rec_of(s.ents, 0)
        s, rec = self._basic_step_rec(s, rec0, is_agent=True)
        skip = rec0["will_erase"]
        rec = tree_where(skip, rec0, rec)
        return s.replace(
            ents=s.ents.set_fields(
                0, x=rec["x"], y=rec["y"], vx=rec["vx"], vy=rec["vy"]
            )
        )

    # Max non-agent smart movers alive at once (None = no bound).  When set,
    # the vmapped stepper runs over a compacted [MAX_SMART] record batch
    # instead of all ENT_CAP slots — the sub-step probe work is the hot
    # per-slot cost, so a pool where only ~1/4 of slots are smart steps ~4x
    # faster.  MUST upper-bound the game's true simultaneous smart count:
    # overflow movers (compacted position >= MAX_SMART) freeze in place for
    # the step (the scatter below masks them out).  Guarded by worst-case
    # rollouts in tests/test_env.py::test_max_smart_bound and, in
    # debug_mode, by the runtime check in parallel/vec.py (smart-mover
    # count is exported via ``count_smart_movers``).
    MAX_SMART: Optional[int] = None

    def spawn_blocked(self, s: BasicState, x, y, rx, ry, margin=0.0):
        """has_any_collision for a spawn candidate (cpp:1123-1133), over
        BOTH pools: C++ keeps explosions/trails in the same entity vector
        and they do NOT set avoids_collisions, so decoratives block spawns
        too (the plunder_volley adversarial recording caught an explosion
        failing to suppress the next lane ship)."""
        def pool_hit(e):
            return jnp.any(
                (jnp.abs(jnp.asarray(x, f32) - e.x) < rx + e.rx + margin)
                & (jnp.abs(jnp.asarray(y, f32) - e.y) < ry + e.ry + margin)
                & e.active
                & ~e.avoids_collisions
            )

        hit = pool_hit(s.ents)
        if self.DECOR_CAP:
            hit = hit | pool_hit(s.decor)
        return hit

    def count_smart_movers(self, s: BasicState) -> jax.Array:
        """Live non-agent smart movers this step (the quantity MAX_SMART
        must bound)."""
        e = s.ents
        slots = jnp.arange(self.ENT_CAP)
        do = e.active & e.smart_step & (slots != 0) & ~e.will_erase
        return jnp.sum(do.astype(i32))

    def step_smart_entities_vectorized(self, s: BasicState) -> BasicState:
        """Move all non-agent smart entities in one vmap (SMART_VECTORIZABLE:
        they read only the grid + own record, so the C++ reverse-sequential
        order commutes)."""
        from .exact import from_planes, stack_planes, to_planes, unstack_planes

        e = s.ents
        slots = jnp.arange(self.ENT_CAP)
        do = e.active & e.smart_step & (slots != 0) & ~e.will_erase

        M = self.MAX_SMART
        if M is not None and M < self.ENT_CAP:
            # compact gather (one-hot matmul; 8-bit plane split keeps it
            # bit-exact under any XLA matmul precision, core/exact.py)
            pos = jnp.cumsum(do.astype(i32)) - 1
            C = (
                (pos[None, :] == jnp.arange(M)[:, None]) & do[None, :]
            ).astype(f32)  # [M, cap]

            fields = ("x", "y", "vx", "vy", "rx", "ry", "type")
            F = stack_planes([getattr(e, k) for k in fields])  # [cap, 7*4]
            G = C @ F  # [M, 7*4]
            vals = unstack_planes(G, [getattr(e, k).dtype for k in fields])
            rec = dict(zip(fields, vals))
            rec["will_erase"] = jnp.zeros((M,), bool)

            def move_rec(r):
                _, r2 = self._basic_step_rec(s, r, is_agent=False)
                return r2

            recs = jax.vmap(move_rec)(rec)
            # scatter back; movers that overflowed the bound (pos >= M have
            # an all-zero column in C) keep their old fields — frozen, not
            # teleported to the origin (ADVICE r3)
            ok = do & (pos < M)
            upd = {}
            for k in ("x", "y", "vx", "vy"):
                newp = jnp.einsum("mc,mp->cp", C, to_planes(recs[k]))
                newv = from_planes(newp, getattr(e, k).dtype)
                upd[k] = jnp.where(ok, newv, getattr(e, k))
            return s.replace(ents=e.replace(**upd))

        def move_one(slot):
            rec = self._rec_of(e, slot)
            _, rec2 = self._basic_step_rec(s, rec, is_agent=False)
            return rec2

        recs = jax.vmap(move_one)(slots)
        upd = {}
        for k in ("x", "y", "vx", "vy"):
            upd[k] = jnp.where(do, recs[k], getattr(e, k))
        return s.replace(ents=e.replace(**upd))

    # ------------------------------------------------------------------
    # per-step pipeline (cpp:695-755)
    # ------------------------------------------------------------------

    def step_entities(self, s: BasicState):
        """cpp:1095-1107: reverse order — smart moves then Entity::step.

        Non-agent entities first (vector), agent last, exactly as the C++
        reverse loop orders slot 0.
        """
        if not self.ONLY_AGENT_SMART:
            if not self.SMART_VECTORIZABLE:
                raise NotImplementedError(
                    "sequential multi-smart stepping not enabled for "
                    f"{self.name}; set SMART_VECTORIZABLE or add an override"
                )
            s = self.step_smart_entities_vectorized(s)

        # Entity::step for all non-agent slots (order-independent)
        nonagent = jnp.arange(s.ents.cap) != 0
        s = s.replace(ents=s.ents.step_masked(s.ents.active & nonagent))
        if self.DECOR_CAP:
            s = s.replace(decor=s.decor.step_all())
        # agent: move then step, last (slot 0 in the reverse loop)
        s = self.basic_step_object_agent(s)
        s = s.replace(ents=s.ents.step_masked(s.ents.active & ~nonagent))
        return s

    def check_grid_collisions(self, s: BasicState, d, slot):
        """cpp:145-165 — probe the entity's AABB cells and dispatch."""
        e = s.ents
        ax, ay, arx, ary = onehot_select(slot, e.x, e.y, e.rx, e.ry)
        min_x = jnp.trunc(ax - (arx + POS_EPS)).astype(i32)
        max_x = jnp.trunc(ax + (arx + POS_EPS)).astype(i32)
        min_y = jnp.trunc(ay - (ary + POS_EPS)).astype(i32)
        max_y = jnp.trunc(ay + (ary + POS_EPS)).astype(i32)
        r = self.GRID_COLLISION_RANGE
        for dx in range(r):
            for dy in range(r):
                x = min_x + dx
                y = min_y + dy
                in_range = (x <= max_x) & (y <= max_y)
                gtype = self.get_obj_from_floats(s, x.astype(f32), y.astype(f32))
                hit = in_range & (gtype != SPACE)
                s2, d2 = self.handle_grid_collision(s, d, slot, gtype, x, y)
                s = tree_where(hit, s2, s)
                d = tree_where(hit, d2, d)
        return s, d

    def handle_agent_collision_vec(self, s, d, hit):
        """Vectorised agent-collision handler: ``hit`` is the [cap] mask of
        entities overlapping the agent.  Games with commuting handler
        effects override this (DISPATCH_VECTORIZED)."""
        return s, d

    def dispatch_entity_pairs(self, s, d):
        """Entity-entity collision dispatch for DISPATCH_VECTORIZED games
        with ANY_COLLIDES_WITH_ENTITIES; override per game."""
        return s, d

    def dispatch_grid_vec(self, s, d):
        """Vectorised grid-collision dispatch for DISPATCH_VECTORIZED games
        whose grid handler acts on non-agent smart entities too (override
        per game, reproducing the reverse-slot sequential semantics)."""
        raise NotImplementedError(
            f"{self.name}: DISPATCH_VECTORIZED without GRID_HANDLER_AGENT_ONLY "
            "requires a dispatch_grid_vec override"
        )

    def probe_cells(self, s):
        """The 2x2 grid cells check_grid_collisions probes, for ALL slots
        at once (cpp:145-165): returns (ix, iy, in_range, gtype) each
        [cap, GRID_COLLISION_RANGE**2] in (dx, dy) probe order."""
        e = s.ents
        ax, ay = e.x, e.y
        arx, ary = e.rx, e.ry
        min_x = jnp.trunc(ax - (arx + POS_EPS)).astype(i32)
        max_x = jnp.trunc(ax + (arx + POS_EPS)).astype(i32)
        min_y = jnp.trunc(ay - (ary + POS_EPS)).astype(i32)
        max_y = jnp.trunc(ay + (ary + POS_EPS)).astype(i32)
        r = self.GRID_COLLISION_RANGE
        ix, iy, inr = [], [], []
        for dx in range(r):
            for dy in range(r):
                x = min_x + dx
                y = min_y + dy
                ix.append(x)
                iy.append(y)
                inr.append((x <= max_x) & (y <= max_y))
        ix = jnp.stack(ix, axis=-1)
        iy = jnp.stack(iy, axis=-1)
        inr = jnp.stack(inr, axis=-1)
        gtype = self.get_obj_from_floats(s, ix.astype(f32), iy.astype(f32))
        return ix, iy, inr, gtype

    def dispatch_collisions(self, s: BasicState, d):
        """cpp:728-750: agent / entity-pair / grid collision dispatch.

        Exact reverse-order interleaved scan by default; games whose handler
        effects commute opt into the phased vectorised path."""
        if self.DISPATCH_VECTORIZED:
            hit = self.has_agent_collision_mask(s)
            s, d = self.handle_agent_collision_vec(s, d, hit)
            if self.ANY_COLLIDES_WITH_ENTITIES:
                s, d = self.dispatch_entity_pairs(s, d)
            if (
                type(self).handle_grid_collision
                is not BasicAbstractGame.handle_grid_collision
            ):
                if self.GRID_HANDLER_AGENT_ONLY:
                    s2, d2 = self.check_grid_collisions(s, d, 0)
                    do = s.ents.smart_step[0] & (s.ents.count > 0)
                    s = tree_where(do, s2, s)
                    d = tree_where(do, d2, d)
                else:
                    # game-specific vectorised equivalent of the reverse
                    # per-smart-slot grid dispatch (must be overridden)
                    s, d = self.dispatch_grid_vec(s, d)
            return s, d

        cap = self.ENT_CAP

        # Sequential reverse scan (handler effects are order-sensitive).
        # All per-slot reads avoid traced-index gathers (XLA-TPU serializes
        # them through SMEM): [cap]-mask one-hots for scalars, onehot_select
        # inside game handlers, one-hot masked writes in set_fields_where.
        def body(carry, j):
            s, d = carry
            i = cap - 1 - j
            oh_i = jnp.arange(cap) == i
            live = i < s.ents.count

            hit_agent = (
                jnp.any(self.has_agent_collision_mask(s) & oh_i) & live
            )
            s2, d2 = self.handle_agent_collision(s, d, i)
            s = tree_where(hit_agent, s2, s)
            d = tree_where(hit_agent, d2, d)

            if self.ANY_COLLIDES_WITH_ENTITIES:
                # geometry is static during dispatch; will_erase is NOT
                # (handlers set it mid-loop, cpp:735-745) so it reads live
                e = s.ents
                xi, yi, rxi, ryi, margin = onehot_select(
                    i, e.x, e.y, e.rx, e.ry, e.collision_margin
                )
                coll_geo = (
                    (jnp.abs(xi - e.x) < rxi + e.rx + margin)
                    & (jnp.abs(yi - e.y) < ryi + e.ry + margin)
                ) & live

                def inner(carry, jj):
                    s, d = carry
                    k = cap - 1 - jj
                    oh_k = jnp.arange(cap) == k
                    e2 = s.ents
                    we = e2.will_erase
                    live2 = (k < e2.count) & (k != i)
                    hit = (
                        live2
                        & jnp.any(coll_geo & oh_k)
                        & jnp.any(e2.collides_with_entities & oh_i)
                        & ~jnp.any(we & oh_i)
                        & ~jnp.any(we & oh_k)
                    )
                    s3, d3 = self.handle_collision(s, d, i, k)
                    s = tree_where(hit, s3, s)
                    d = tree_where(hit, d3, d)
                    return (s, d), None

                (s, d), _ = jax.lax.scan(inner, (s, d), jnp.arange(cap))

            do_grid = live & jnp.any(s.ents.smart_step & oh_i)
            s4, d4 = self.check_grid_collisions(s, d, i)
            s = tree_where(do_grid, s4, s)
            d = tree_where(do_grid, d4, d)
            return (s, d), None

        (s, d), _ = jax.lax.scan(body, (s, d), jnp.arange(cap))
        return s, d

    def erase_if_needed(self, s: BasicState) -> BasicState:
        """cpp:757-765 (interactive + decorative pools)."""
        e = s.ents
        oob = self.is_out_of_bounds_mask(s)
        keep = ~(e.will_erase | (e.auto_erase & oob))
        s = s.replace(ents=e.compact(keep))
        if self.DECOR_CAP:
            d = s.decor
            w = s.main_width.astype(f32)
            h = s.main_height.astype(f32)
            oob_d = (
                (d.x + d.rx < 0) | (d.y + d.ry < 0)
                | (d.x - d.rx > w) | (d.y - d.ry > h)
            )
            s = s.replace(decor=d.compact(~(d.will_erase | (d.auto_erase & oob_d))))
        return s

    def add_decor(self, s: BasicState, fields: dict, do=True) -> BasicState:
        """Push a decorative entity (trail/explosion)."""
        assert self.DECOR_CAP > 0, f"{self.name} has no decor pool"
        return s.replace(decor=s.decor.push(fields, do=do))

    def game_step_base(self, s: BasicState, d: rng.Draws):
        """BasicAbstractGame::game_step head + movement + dispatch
        (cpp:695-755).  Games call this from their ``game_step``."""
        d, sri = d.randint(0, 1000000)
        s = s.replace(step_rand_int=sri)

        move_action = s.action % 9
        special = jnp.where(s.action >= 9, s.action - 8, 0)
        move_action = jnp.where(s.action >= 9, 4, move_action)
        last_move = jnp.where(move_action != 4, move_action, s.last_move_action)
        s = s.replace(
            move_action=move_action,
            special_action=special,
            last_move_action=last_move,
            action_vrot=f32(0.0),
            action_vx=f32(0.0),
            action_vy=f32(0.0),
        )
        s = self.set_action_xy(s, move_action)

        if self.grid_step:
            s = s.replace(
                ents=s.ents.set_fields(0, vx=s.action_vx, vy=s.action_vy)
            )
        else:
            s = self.update_agent_velocity(s)
            vrot = MIXRATEROT * s.ents.vrot[0] + MIXRATEROT * MAXVTHETA * s.action_vrot
            s = s.replace(ents=s.ents.set_fields(0, vrot=vrot))

        s = self.step_entities(s)
        s, d = self.dispatch_collisions(s, d)
        s = self.erase_if_needed(s)
        s = s.replace(done=s.done | self.is_out_of_bounds_mask(s)[0])
        return s, d

    # ------------------------------------------------------------------
    # reset-path helpers (checked RNG)
    # ------------------------------------------------------------------

    def rand01(self, s: BasicState):
        g, v = rng.rand01(s.rand_gen)
        return s.replace(rand_gen=g), v

    def randn(self, s: BasicState, n):
        g, v = rng.randn(s.rand_gen, n)
        return s.replace(rand_gen=g), v

    def randint(self, s: BasicState, lo, hi):
        g, v = rng.randint(s.rand_gen, lo, hi)
        return s.replace(rand_gen=g), v

    def randbool(self, s: BasicState):
        g, v = rng.randbool(s.rand_gen)
        return s.replace(rand_gen=g), v

    def randrange(self, s: BasicState, lo, hi):
        g, v = rng.randrange(s.rand_gen, lo, hi)
        return s.replace(rand_gen=g), v

    def rand_pos(self, s: BasicState, r, lo, hi):
        """cpp:1109-1117: draws ONLY when the span exceeds 2r."""
        g, pos = _rand_pos_raw(s.rand_gen, r, lo, hi)
        return s.replace(rand_gen=g), pos

    def reposition(self, s, fields: dict, x, y, w, h, check_collisions: bool,
                   max_tries: int = 100):
        """cpp:550-568 rejection placement.  Returns (s, fields) with x/y set.

        The candidate entity is not yet in the pool, so collision checks run
        against current slots + the agent.
        """
        rx = fields["rx"]
        ry = fields["ry"]

        def try_place(g):
            g2, px = _rand_pos_raw(g, rx, x, x + w)
            g2, py = _rand_pos_raw(g2, ry, y, y + h)
            return g2, px, py

        def collides(px, py):
            e = s.ents
            overlap = (jnp.abs(px - e.x) < (rx + e.rx)) & (
                jnp.abs(py - e.y) < (ry + e.ry)
            )
            overlap &= e.active
            # has_agent_collision skips PLAYER-typed candidates (cpp:1135-1140)
            agent_hit = jnp.where(
                jnp.asarray(fields["type"], i32) == PLAYER, False, overlap[0]
            )
            if check_collisions:
                return agent_hit | jnp.any(overlap & ~e.avoids_collisions)
            return agent_hit

        g = s.rand_gen
        g, px, py = try_place(g)

        def cond(carry):
            g, px, py, cnt = carry
            return collides(px, py) & (cnt < max_tries)

        def body(carry):
            g, px, py, cnt = carry
            g, px2, py2 = try_place(g)
            return (g, px2, py2, cnt + 1)

        g, px, py, _ = jax.lax.while_loop(cond, body, (g, px, py, jnp.asarray(0, i32)))
        fields = dict(fields)
        fields["x"] = px
        fields["y"] = py
        return s.replace(rand_gen=g), fields

    def spawn_entity_rxy(self, s, rx, ry, type_, x, y, w, h, check_collisions=True):
        """cpp:520-528."""
        fields = default_fields(0.0, 0.0, 0.0, 0.0, rx, ry, type_)
        s, fields = self.reposition(s, fields, x, y, w, h, check_collisions)
        return s.replace(ents=s.ents.push(fields))

    def spawn_entity(self, s, r, type_, x, y, w, h, check_collisions=True):
        return self.spawn_entity_rxy(s, r, r, type_, x, y, w, h, check_collisions)

    def spawn_entities(self, s, n: int, r, type_, x, y, w, h):
        for _ in range(n):
            s = self.spawn_entity(s, r, type_, x, y, w, h)
        return s

    def add_entity(self, s, x, y, vx, vy, r, type_, **extra):
        fields = default_fields(x, y, vx, vy, r, r, type_)
        fields.update(extra)
        return s.replace(ents=s.ents.push(fields))

    def add_entity_rxy(self, s, x, y, vx, vy, rx, ry, type_, **extra):
        fields = default_fields(x, y, vx, vy, rx, ry, type_)
        fields.update(extra)
        return s.replace(ents=s.ents.push(fields))

    def spawn_entity_at_idx(self, s, idx, r, type_):
        x = (idx % s.main_width).astype(f32) + 0.5
        y = (idx // s.main_width).astype(f32) + 0.5
        return self.add_entity(s, x, y, 0.0, 0.0, r, type_)

    def game_reset_base(self, s: BasicState) -> BasicState:
        """BasicAbstractGame::game_reset (cpp:767-806)."""
        s = self.choose_world_dim(s)
        s, bg_pct = self.rand01(s)
        s = s.replace(
            bg_pct_x=bg_pct,
            grid=jnp.zeros((self.WORLD_DIM_MAX[1], self.WORLD_DIM_MAX[0]), i32),
            mixrate=f32(self.mixrate),
            maxspeed=f32(self.maxspeed),
            max_jump=f32(self.max_jump),
            visibility=f32(self.visibility),
        )
        s, bgi = self.randn(s, self.num_backgrounds())
        s = s.replace(background_index=bgi)
        if self.uses_procgen_background:
            # use_procgen_background: AssetGen regenerates the background
            # every reset from the level rand_gen (cpp:776-782) — the exact
            # draw sequence AND the painted canvas, kept in state.bg_canvas.
            from ..render import assetgen

            s = assetgen.consume_background_draws(self, s)

        ents = Entities.zeros(self.ENT_CAP)
        if self.DECOR_CAP:
            s = s.replace(decor=Entities.zeros(self.DECOR_CAP))
        a_r = f32(0.4)
        if self.random_agent_start:
            s, r1 = self.rand01(s)
            s, r2 = self.rand01(s)
            ax = r1 * (s.main_width.astype(f32) - 2 * a_r) + a_r
            ay = r2 * (s.main_height.astype(f32) - 2 * a_r) + a_r
        else:
            ax = a_r
            ay = a_r
        agent = default_fields(ax, ay, 0.0, 0.0, a_r, a_r, PLAYER)
        agent["smart_step"] = True
        agent["render_z"] = 1
        ents = ents.push(agent)
        s = s.replace(ents=ents)
        s = self.fill_elem(s, 0, 0, s.main_width, s.main_height, SPACE)
        return s

    # ------------------------------------------------------------------
    # misc queries used by games
    # ------------------------------------------------------------------

    def get_agent_index(self, s):
        """int(agent.y) * main_width + int(agent.x) (cpp:176-178)."""
        e = s.ents
        return e.y[0].astype(i32) * s.main_width + e.x[0].astype(i32)

    def cells_with_type_mask(self, s, type_):
        """[Hmax, Wmax] bool mask of in-bounds cells with the given type."""
        gx = jnp.arange(self.WORLD_DIM_MAX[0])[None, :]
        gy = jnp.arange(self.WORLD_DIM_MAX[1])[:, None]
        inb = (gx < s.main_width) & (gy < s.main_height)
        return inb & (s.grid == type_)


def _entity_step_slot(e: Entities, i) -> Entities:
    """Entity::step for a single slot (entity.cpp:57-82)."""
    from .constants import EXPLOSION, EXPLOSION5

    smart = e.smart_step[i]
    x = jnp.where(smart, e.x[i], e.x[i] + e.vx[i])
    y = jnp.where(smart, e.y[i], e.y[i] + e.vy[i])
    life = e.life_time[i] + 1
    will_erase = e.will_erase[i] | ((e.expire_time[i] > 0) & (life > e.expire_time[i]))
    img = jnp.where(
        (e.type[i] == EXPLOSION) & (e.image_type[i] < EXPLOSION5),
        e.image_type[i] + 1,
        e.image_type[i],
    )
    return e.set_fields(
        i,
        x=x,
        y=y,
        rotation=e.rotation[i] + e.vrot[i],
        vx=e.vx[i] * e.friction[i],
        vy=e.vy[i] * e.friction[i],
        life_time=life,
        will_erase=will_erase,
        image_type=img,
        rx=e.rx[i] * e.grow_rate[i],
        ry=e.ry[i] * e.grow_rate[i],
        alpha=e.alpha[i] * e.alpha_decay[i],
    )


def _rand_pos_raw(g: rng.MTState, r, lo, hi):
    """rand_pos on a bare MTState (draws only when span > 2r)."""
    need = (hi - lo) > 2 * r
    g2, v = rng.rand01(g)
    g2 = tree_where(need, g2, g)
    pos = jnp.where(need, (hi - lo - 2 * r) * v + r + lo, (hi + lo) / 2)
    return g2, pos

