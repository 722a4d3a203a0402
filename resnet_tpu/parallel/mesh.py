"""Device mesh construction and placement helpers.

New capability: the reference is strictly single-GPU/single-process
(SURVEY.md section 2.7 — no NCCL/MPI anywhere). On TPU the distributed layer
is jax.sharding over an ICI mesh; these helpers build the 1-D data-parallel
mesh used for the v5e-8 target and keep axis names open for wider meshes
(tp/pp axes can be added without touching callers).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: int = 0,
    axis: str = "data",
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if num_devices and num_devices > 0:
        if num_devices > len(devices):
            raise ValueError(
                f"mesh wants {num_devices} devices, only {len(devices)} available"
            )
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch dict onto the mesh, sharded along the batch dim."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
