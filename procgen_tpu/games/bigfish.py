"""Bigfish: eat smaller fish (+1 each), die to bigger ones; 30 fish ⇒ +10.

Reference: procgen/src/games/bigfish.cpp.  No grid obstacles — validates the
continuous physics core (update_agent_velocity, sub-stepping) and the
order-sensitive agent-collision dispatch (eating grows the agent mid-scan).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from ..core.constants import EASY_MODE, PLAYER
from ..core.entities import default_fields
from ..core.game import BasicAbstractGame, BasicState, onehot_select, tree_where
from .registry import register

i32 = jnp.int32
f32 = jnp.float32

COMPLETION_BONUS = 10.0
POSITIVE_REWARD = 1.0
FISH = 2
FISH_MIN_R = 0.25
FISH_MAX_R = 2.0
FISH_QUOTA = 30


@struct.dataclass
class BigfishState:
    fish_eaten: jnp.ndarray
    r_inc: jnp.ndarray


@register("bigfish")
class Bigfish(BasicAbstractGame):
    name = "bigfish"
    WORLD_DIM_MAX = (20, 20)
    ENT_CAP = 40  # fish lifetime ~20/vx steps at spawn rate 0.1 ⇒ E[alive]≈15
    # no grid objects at all; bg is the only prefix layer; the render prefix is composed once per level
    # (tests/test_static_frame.py guards frame-vs-full equality)
    STATIC_RENDER_PREFIX = True
    MAX_STEP_DRAWS = 16
    MAX_SUB_STEPS = 6

    def __init__(self, options):
        super().__init__(options)
        self.timeout = 6000  # bigfish.cpp:25
        self.center_agent = False  # forced at reset (bigfish.cpp:69)

    def background_names(self):
        from ..render.assets import WATER_BACKGROUNDS

        return WATER_BACKGROUNDS

    def asset_for_type(self, type_):
        if type_ == PLAYER:
            return ["misc_assets/fishTile_072.png"]
        if type_ == FISH:
            return [
                "misc_assets/fishTile_074.png",
                "misc_assets/fishTile_078.png",
                "misc_assets/fishTile_080.png",
            ]
        return []

    def game_init_state(self):
        return BigfishState(
            fish_eaten=jnp.zeros((), i32), r_inc=jnp.zeros((), f32)
        )

    def choose_world_dim(self, s):
        # set in the C++ ctor (bigfish.cpp:26-27)
        return s.replace(
            main_width=jnp.asarray(20, i32), main_height=jnp.asarray(20, i32)
        )

    def handle_agent_collision(self, s: BasicState, d, i):
        """bigfish.cpp:46-59 — die to bigger fish, eat smaller ones."""
        e = s.ents
        ti, rxi = onehot_select(i, e.type, e.rx)
        is_fish = ti == FISH
        bigger = rxi > e.rx[0]
        die = is_fish & bigger
        eat = is_fish & ~bigger
        g = s.game
        ents = e.set_fields_where(i, eat, will_erase=True)
        ents = ents.set_fields_where(
            0, eat, rx=e.rx[0] + g.r_inc, ry=e.ry[0] + g.r_inc
        )
        s = s.replace(
            done=s.done | die,
            reward=s.reward + jnp.where(eat, f32(POSITIVE_REWARD), 0.0),
            ents=ents,
            game=g.replace(
                fish_eaten=g.fish_eaten + jnp.where(eat, 1, 0)
            ),
        )
        return s, d

    def game_reset(self, s: BasicState) -> BasicState:
        s = self.game_reset_base(s)
        start_r = 1.0 if self.options.distribution_mode == EASY_MODE else 0.5
        r_inc = (FISH_MAX_R - start_r) / FISH_QUOTA
        s = s.replace(
            game=BigfishState(
                fish_eaten=jnp.zeros((), i32), r_inc=jnp.asarray(r_inc, f32)
            ),
            ents=s.ents.set_fields(
                0, rx=start_r, ry=start_r, y=1.0 + start_r
            ),
        )
        return s

    def game_step(self, s: BasicState, d):
        s, d = self.game_step_base(s, d)

        # stochastic fish spawn (bigfish.cpp:83-95): inner draws consumed
        # only when the spawn roll hits
        d1, roll = d.randn(10)
        spawn = roll == 1
        d2, r01 = d1.rand01()
        ent_r = (FISH_MAX_R - FISH_MIN_R) * jnp.power(r01, f32(1.4)) + FISH_MIN_R
        d2, y01 = d2.rand01()
        ent_y = y01 * (s.main_height.astype(f32) - 2 * ent_r)
        d2, m01 = d2.rand01()
        moves_right = m01 < 0.5
        d2, v01 = d2.rand01()
        ent_vx = (0.15 + v01 * 0.25) * jnp.where(moves_right, 1.0, -1.0)
        ent_x = jnp.where(
            moves_right, -ent_r, s.main_width.astype(f32) + ent_r
        )
        d2, theme = d2.randn(self.num_themes(FISH))
        ar = self.aspect_ratios(FISH)[jnp.clip(theme, 0, self.num_themes(FISH) - 1)]
        fields = default_fields(ent_x, ent_y, ent_vx, 0.0, ent_r, ent_r, FISH)
        fields["image_theme"] = theme
        fields["ry"] = ent_r / ar  # match_aspect_ratio (bigfish.cpp:92)
        fields["is_reflected"] = ~moves_right
        s = s.replace(ents=s.ents.push(fields, do=spawn))
        d = tree_where(spawn, d2, d1)

        complete = s.game.fish_eaten >= FISH_QUOTA
        s = s.replace(
            done=s.done | complete,
            reward=s.reward + jnp.where(complete, f32(COMPLETION_BONUS), 0.0),
            level_complete=s.level_complete | complete,
        )

        refl = jnp.where(
            s.action_vx > 0,
            False,
            jnp.where(s.action_vx < 0, True, s.ents.is_reflected[0]),
        )
        s = s.replace(ents=s.ents.set_fields(0, is_reflected=refl))
        return s, d
