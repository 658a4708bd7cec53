"""Wheel build for procgen-tpu.

Mirrors the reference's packaging strategy (setup.py:54-84 ships a
prebuilt libenv.so as package data; procgen-build/build_package.py drives
cibuildwheel): the native state codec (native/statecodec.cpp) is compiled
during the wheel build and shipped inside the package at
``procgen_tpu/data/libstatecodec.so`` alongside the baked asset artifact,
so an installed wheel needs no toolchain at runtime (the ctypes loader
falls back to NumPy if the platform lib is unusable).

    bash tools/build_wheel.sh     # build + verify + smoke-test the wheel
"""

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py

HERE = os.path.dirname(os.path.abspath(__file__))


class BuildPyWithNative(build_py):
    def run(self):
        native_dir = os.path.join(HERE, "native")
        lib = os.path.join(native_dir, "libstatecodec.so")
        if os.path.exists(os.path.join(native_dir, "Makefile")):
            try:
                subprocess.run(
                    ["make", "-C", native_dir], check=True, capture_output=True
                )
            except Exception as exc:  # toolchain-less build hosts
                print(f"warning: native codec build skipped: {exc}")
        if os.path.exists(lib):
            dst = os.path.join(HERE, "procgen_tpu", "data", "libstatecodec.so")
            shutil.copy2(lib, dst)
        super().run()


setup(cmdclass={"build_py": BuildPyWithNative})
