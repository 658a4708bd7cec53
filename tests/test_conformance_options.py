"""Option-matrix + adversarial conformance vs the C++ reference oracle.

Recordings: tests/data/conformance_opts/*.json — non-default option
configurations (use_sequential_levels / use_generated_assets /
restrict_themes / use_monochrome_assets / no-backgrounds+vel-info) whose
RNG draw patterns differ from the default gate, plus adversarial
recordings stressing the documented divergence-risk sites (coinrun crate
push chains, dodgeball/plunder bullet volleys; 8 envs x 500 steps).

Regenerate after an oracle change with:

    python tools/refharness/build.py
    python tools/refharness/gen_option_recordings.py

The long recordings (>=500 steps or >=8 envs) run under ``-m slow``; the
64-step option rows stay in the default gate.
"""

import glob
import json
import os
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REC_DIR = os.path.join(HERE, "data", "conformance_opts")
RECORDINGS = sorted(glob.glob(os.path.join(REC_DIR, "*.json")))


def _is_slow(path):
    rec = json.load(open(path))
    return len(rec["actions"]) >= 500 or len(rec["actions"][0]) >= 8


def _replay(path):
    sys.path.insert(0, os.path.join(HERE, "..", "tools"))
    import conformance

    rec = json.load(open(path))
    r = conformance.replay(rec)
    assert r["first_divergence"] is None, r["first_divergence"]
    assert r["checked"] == len(rec["actions"])


FAST = [p for p in RECORDINGS if not _is_slow(p)]
SLOW = [p for p in RECORDINGS if _is_slow(p)]


@pytest.mark.parametrize(
    "path", FAST, ids=[os.path.basename(p)[:-5] for p in FAST]
)
def test_option_matrix_exact(path):
    _replay(path)


@pytest.mark.slow
@pytest.mark.parametrize(
    "path", SLOW, ids=[os.path.basename(p)[:-5] for p in SLOW]
)
def test_adversarial_exact(path):
    _replay(path)


def test_option_recordings_present():
    assert len(RECORDINGS) >= 12, (
        f"expected >=12 option/adversarial recordings, found "
        f"{len(RECORDINGS)} — run tools/refharness/gen_option_recordings.py"
    )
