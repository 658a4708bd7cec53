"""Trajectory conformance vs the C++ reference oracle (the north star).

Replays checked-in recordings produced by the logic-only reference build
(tools/refharness) and asserts EXACT equality of rewards / firsts /
level seeds / prev-level info / maze+miner latent grids at every step.

Recordings: tests/data/conformance/*.json (64 steps, 2 envs, easy+hard per
game).  Regenerate after an oracle change with:

    python tools/refharness/build.py
    python tools/refharness/gen_test_recordings.py
"""

import glob
import json
import os
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REC_DIR = os.path.join(HERE, "data", "conformance")
RECORDINGS = sorted(glob.glob(os.path.join(REC_DIR, "*.json")))


def _param(path):
    """extreme/memory rows go to -m slow: every game keeps easy+hard in
    the default gate (the per-commit budget, VERDICT r4 weak #3), and the
    extra modes stay covered there plus in the 1000-step deep gate."""
    rec_id = os.path.basename(path)[:-5]
    slow = rec_id.rsplit("_", 1)[-1] in ("extreme", "memory") or (
        # joint replays step per-dispatch through JointJaxVecGame (no
        # fused rollout across sub-games) — minutes each on CPU
        rec_id.startswith("joint_")
    )
    if slow:
        return pytest.param(path, id=rec_id, marks=pytest.mark.slow)
    return pytest.param(path, id=rec_id)


@pytest.mark.parametrize("path", [_param(p) for p in RECORDINGS])
def test_trajectory_exact_vs_reference(path):
    sys.path.insert(0, os.path.join(HERE, "..", "tools"))
    import conformance

    rec = json.load(open(path))
    r = conformance.replay(rec)
    assert r["first_divergence"] is None, r["first_divergence"]
    assert r["checked"] == len(rec["actions"])


def test_recordings_present():
    assert len(RECORDINGS) >= 32, (
        f"expected >=32 conformance recordings, found {len(RECORDINGS)} — "
        "run tools/refharness/gen_test_recordings.py"
    )
