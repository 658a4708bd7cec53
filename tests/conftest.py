"""Test configuration: force a virtual 8-device CPU mesh.

The image ships JAX_PLATFORMS=axon (TPU tunnel); tests must run on host CPU
with 8 virtual devices for sharding coverage.  The axon plugin wins over the
env var, so the platform is forced via jax.config after import.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.cache/procgen_tpu_xla")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
