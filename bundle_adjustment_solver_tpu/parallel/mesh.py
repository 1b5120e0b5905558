"""Device mesh helpers for the distributed solvers.

The reference has no distributed layer at all (SURVEY.md §2: its only
parallelism is AVX within one core); this module provides the TPU-native
equivalent: a 1-D `jax.sharding.Mesh` over the data axis (observations +
landmarks), with pose state replicated -- collectives ride ICI within a
slice and DCN across slices.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

DATA_AXIS = "data"


def data_mesh(num_devices: int | None = None, devices=None) -> Mesh:
    """Build a 1-D mesh over `num_devices` (default: all local devices)."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Multi-host entry: thin wrapper over `jax.distributed.initialize`.

    On TPU pods the arguments are discovered from the environment; pass them
    explicitly only for manual/CPU rigs. Safe to call once per process before
    any JAX computation.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
