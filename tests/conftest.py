"""Test configuration: force an 8-device virtual CPU mesh.

Tests never require real TPU hardware; multi-chip sharding paths are
exercised on a virtual 8-device CPU platform, per the framework's test
strategy (multi-host correctness = shard-merged results equal single-host
results).
"""

import os

# Must be set before jax is imported anywhere.  Forced (not setdefault):
# the ambient environment may point JAX at a real TPU, but unit tests always
# run on the virtual CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
# force the 8-device count (replacing any ambient value: mesh tests
# require exactly 8 virtual devices)
flags = [f for f in os.environ.get("XLA_FLAGS", "").split()
         if "xla_force_host_platform_device_count" not in f]
flags.append("--xla_force_host_platform_device_count=8")
os.environ["XLA_FLAGS"] = " ".join(flags)
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment's site customization can pin jax_platforms to the TPU
# plugin regardless of JAX_PLATFORMS; override it before any backend init.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


# build the native extension once per session so its tests and fast paths
# are exercised rather than skipped (ignored if no toolchain)
def pytest_configure(config):
    from hsearch_tpu import native_ext
    if not native_ext.available():
        native_ext.build()
