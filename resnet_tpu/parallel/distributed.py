"""Multi-host coordination.

New capability (the reference is one process / one GPU, SURVEY.md 2.7).
On a multi-host TPU pod slice each host runs this same program;
jax.distributed.initialize wires them into one JAX runtime, after which
jax.devices() spans the slice and the mesh/pjit layer works unchanged.
Data loading splits the global batch across hosts (each host feeds its
local chips via its own loader cursor offset).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize multi-host JAX. No-ops when single-process (TPU metadata
    auto-detection handles GCE TPU VMs with no explicit arguments)."""
    if num_processes is not None and num_processes <= 1:
        return
    kwargs = {}
    if coordinator_address:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)


def host_batch_slice(global_batch_size: int) -> tuple:
    """(host_batch_size, host_offset_batches): this host's share of the
    global batch, for offsetting its shard-loader cursor."""
    n = jax.process_count()
    i = jax.process_index()
    if global_batch_size % n:
        raise ValueError(f"global batch {global_batch_size} not divisible by {n} hosts")
    per = global_batch_size // n
    return per, i


def local_device_count() -> int:
    return jax.local_device_count()
