"""Test configuration: run on a virtual 8-device CPU mesh with float64.

Multi-chip sharding paths are validated on host CPU devices
(``xla_force_host_platform_device_count``); real-TPU benchmarking happens in
``bench.py`` instead. Must run before the first ``import jax``.
"""

import os

# The session env presets JAX_PLATFORMS=axon (TPU tunnel) and a
# sitecustomize pre-imports jax, so plain env vars are too late here —
# jax.config.update is the effective switch.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# persistent compilation cache: the suite is dominated by XLA compiles on
# this 1-core host; cached executables cut reruns dramatically
import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
from morbit_tpu.utils.compile_cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.path.join(os.path.dirname(__file__), ".jax_cache"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(1234)
