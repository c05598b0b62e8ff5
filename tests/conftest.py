"""Test configuration: force an 8-device virtual CPU mesh.

Multi-chip sharding (DP calibration, TP serving) is tested without TPU pods
by exposing 8 virtual CPU devices (SURVEY.md §4).

The session image installs a sitecustomize (PYTHONPATH=/root/.axon_site)
that registers the 'axon' TPU-tunnel PJRT plugin at interpreter start and
pins jax.config.jax_platforms to "axon,cpu"; env vars alone cannot override
that, so we update the config directly before any backend initializes.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# NOTE: do NOT enable the persistent compilation cache here. CPU AOT
# executables are not reliably deserializable across processes (observed
# segfaults in compilation_cache.get_executable_and_time); the cache is
# TPU-only and lives in bench.py / profile_decode.py.

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound live compiled executables: the full suite jits hundreds of
    programs and XLA:CPU has been observed to abort (Fatal Python error
    inside backend_compile_and_load) late in a long single-process run.
    Dropping executables between modules keeps the process small; within
    a module the tracing/executable caches still amortize."""
    yield
    jax.clear_caches()
