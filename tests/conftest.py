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

# Persistent compile cache: the suite jits hundreds of programs; caching
# them across runs cuts a full-suite run from >20 min to a few minutes.
# Keyed by backend so CPU artifacts never mix with the TPU cache.
_cache_root = os.environ.get("JAX_CACHE_DIR",
                             os.path.join(os.path.dirname(__file__), "..",
                                          ".jax_cache"))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.abspath(_cache_root), "cpu"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
