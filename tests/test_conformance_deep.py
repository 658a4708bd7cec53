"""Deep conformance gate: 1000 steps x 42 (game, mode) configs vs the
reference oracle, reproducible from a fresh checkout (``-m slow``).

Checked-in artifact: tests/data/conformance_digests.json — sha256 of each
oracle recording's canonical JSON (tools/refharness/gen_digests.py).  The
test (a) builds the oracle from the reference sources if needed,
(b) regenerates the recording and asserts its digest matches the
checked-in one (the oracle reproduces the exact bytes the digests were
made from), then (c) replays all 1000 steps through the TPU engine and
requires exact equality at every step.
"""

import json
import os
import subprocess
import sys

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
DIGESTS = json.load(open(os.path.join(HERE, "data", "conformance_digests.json")))

sys.path.insert(0, os.path.join(REPO, "tools"))
sys.path.insert(0, os.path.join(REPO, "tools", "refharness"))


def _ensure_engine():
    engine = os.path.join(REPO, ".refbuild", "refengine")
    if not os.path.exists(engine):
        subprocess.run(
            [sys.executable, os.path.join(REPO, "tools", "refharness", "build.py")],
            check=True,
        )
    return engine


@pytest.mark.slow
@pytest.mark.parametrize("config", sorted(DIGESTS["digests"]))
def test_deep_conformance_1000_steps(config):
    _ensure_engine()
    import conformance
    from gen_digests import digest, record_config

    game, mode = config.rsplit("_", 1)
    rec = record_config(game, mode)
    assert digest(rec) == DIGESTS["digests"][config], (
        f"oracle drift: {config} no longer reproduces the checked-in digest"
    )
    r = conformance.replay(rec)
    assert r["first_divergence"] is None, r["first_divergence"]
    assert r["checked"] == DIGESTS["steps"]
