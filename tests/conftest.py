"""Test env: run everything on a virtual 8-device CPU mesh.

The driver benches on the one real TPU chip; tests stand in for "multi-chip
without a cluster" via `xla_force_host_platform_device_count` (see SURVEY.md §4.3).
"""

import os

# SAGS_TEST_TPU=1 opts out of the CPU force so the TPU-only parity suite
# (tests/test_pallas_tpu.py) can run against the real chip:
#   SAGS_TEST_TPU=1 PYTHONPATH=.:/root/.axon_site pytest tests/test_pallas_tpu.py
_use_tpu = os.environ.get("SAGS_TEST_TPU", "") == "1"

if not _use_tpu:
    os.environ["JAX_PLATFORMS"] = "cpu"  # force: the session env may point at a TPU tunnel
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

# Persistent compilation cache: the CLI smoke tests spawn subprocesses that
# would each recompile the full SLAM step from scratch (minutes on a 1-CPU
# box). Env vars (not config calls) so child processes inherit it.
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax  # noqa: E402

# The axon sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon already captured; override via config (backends are not
# initialized until first use, so this still wins).
if not _use_tpu:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
