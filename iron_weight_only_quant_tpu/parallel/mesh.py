"""Logical device mesh construction + multi-host initialization."""

from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh

from ..config import MeshConfig

AXES = ("data", "model")


def make_mesh(cfg: MeshConfig, devices: Optional[Sequence] = None) -> Mesh:
    """Build a ``(data, model)`` mesh.

    The model (tensor-parallel) axis is laid out over adjacent devices so TP
    collectives ride ICI neighbors; the data axis spans the remaining
    dimension (and DCN when multi-host).
    """
    devices = list(devices if devices is not None else jax.devices())
    need = cfg.data * cfg.model
    if len(devices) < need:
        raise ValueError(f"need {need} devices, have {len(devices)}")
    arr = np.array(devices[:need]).reshape(cfg.data, cfg.model)
    return Mesh(arr, AXES)


def multihost_init(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX distributed for a multi-host pod slice.

    No-ops when single-process (the common dev path).  Arguments default to
    the standard env vars used by TPU pod launches.
    """
    if num_processes is None:
        num_processes = int(os.environ.get("IWOQ_NUM_PROCESSES", "1"))
    if num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator or os.environ.get("IWOQ_COORDINATOR"),
        num_processes=num_processes,
        process_id=process_id
        if process_id is not None
        else int(os.environ.get("IWOQ_PROCESS_ID", "0")),
    )
