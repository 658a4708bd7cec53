"""Build the logic-only reference engine (the conformance oracle).

Copies the reference sources from /root/reference/procgen/src into a
scratch tree (.refbuild/, gitignored), swaps in the native replacement files
from this directory (recording state.h, restored buffer.h, native
VecOptions, generated resources stub, native cheerputils), and compiles
everything with g++ against the no-op Qt/cheerp shim headers in shim/.

The output binary .refbuild/refengine speaks the stdin/stdout protocol
documented in main.cpp and is driven by tools/refharness/record.py.

Usage:  python tools/refharness/build.py
"""

from __future__ import annotations

import os
import shutil
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))
REF_SRC = "/root/reference/procgen/src"
BUILD = os.path.join(REPO, ".refbuild")
SRC = os.path.join(BUILD, "src")

# Translation units that must not be compiled: Cheerp-only runtime files the
# driver replaces, plus cheerputils.cpp which miner.cpp #includes directly
# (compiling it standalone would duplicate createData).
EXCLUDE = {
    "cheerpgame.cpp",
    "loadinghelper.cpp",
    "vecgame.cpp",
    "cheerputils.cpp",
}

# Files swapped in over the copied reference tree.
REPLACEMENTS = {
    "state.h": "state.h",
    "buffer.h": "buffer.h",
    "vecoptions.h": "vecoptions.h",
    "vecoptions.cpp": "vecoptions.cpp",
    "cheerputils.cpp": "cheerputils.cpp",
}


def main() -> str:
    if os.path.exists(SRC):
        shutil.rmtree(SRC)
    os.makedirs(os.path.join(SRC, "games"), exist_ok=True)

    for fn in os.listdir(REF_SRC):
        p = os.path.join(REF_SRC, fn)
        if os.path.isfile(p):
            shutil.copy(p, os.path.join(SRC, fn))
    for fn in os.listdir(os.path.join(REF_SRC, "games")):
        shutil.copy(
            os.path.join(REF_SRC, "games", fn), os.path.join(SRC, "games", fn)
        )

    for dst, src in REPLACEMENTS.items():
        shutil.copy(os.path.join(HERE, src), os.path.join(SRC, dst))

    subprocess.check_call(
        [
            sys.executable,
            os.path.join(HERE, "gen_resources_stub.py"),
            os.path.join(REF_SRC, "resources.cpp"),
            os.path.join(SRC, "resources.cpp"),
        ]
    )

    sources = [os.path.join(HERE, "main.cpp")]
    for fn in sorted(os.listdir(SRC)):
        if fn.endswith(".cpp") and fn not in EXCLUDE:
            sources.append(os.path.join(SRC, fn))
    for fn in sorted(os.listdir(os.path.join(SRC, "games"))):
        if fn.endswith(".cpp"):
            sources.append(os.path.join(SRC, "games", fn))

    out = os.path.join(BUILD, "refengine")
    cmd = (
        ["g++", "-O2", "-std=c++17", "-I", os.path.join(HERE, "shim"), "-I", SRC]
        + sources
        + ["-o", out]
    )
    print(" ".join(cmd))
    subprocess.check_call(cmd)
    print(f"built {out}")
    return out


if __name__ == "__main__":
    main()
