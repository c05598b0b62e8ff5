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
