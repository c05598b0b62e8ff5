"""Multi-host initialization and mesh construction.

The TPU-native communication stack (SURVEY.md §5.8): one
``jax.distributed.initialize`` per host process, a single global mesh with
('data', 'model') axes laid out so the 'model' (tensor-parallel) axis
stays within a slice (ICI) and 'data' spans hosts (DCN), and
GSPMD-inserted collectives - no hand-written backend.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
from jax.experimental import mesh_utils
from jax.sharding import Mesh


def initialize_multihost(coordinator_address: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> None:
    """Initialize the JAX distributed runtime when running multi-host.

    On Cloud TPU the arguments auto-detect from the metadata environment;
    they can be forced explicitly (or via JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID) for other clusters. Safe no-op in
    single-process runs.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("JAX_PROCESS_ID", "0")),
    )


def global_mesh(model_parallel: int = 1) -> Mesh:
    """Global ('data', 'model') mesh over all devices of all hosts.

    ``model_parallel`` devices form the TP axis; mesh_utils lays the mesh
    out so the faster (ICI) links carry the 'model' axis - TP collectives
    (all-reduce around row-parallel matmuls every layer) ride ICI while
    the 'data' axis (statistics psum once per calibration batch, no
    serving-time traffic) can span DCN.
    """
    n = jax.device_count()
    assert n % model_parallel == 0, (n, model_parallel)
    arr = mesh_utils.create_device_mesh((n // model_parallel, model_parallel))
    return Mesh(arr, ("data", "model"))
