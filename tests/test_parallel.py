"""Parallel-layer unit tests (mesh helpers, distributed utilities).
Multi-device DP equivalence lives in test_train.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.parallel import host_batch_slice, initialize_distributed, make_mesh, replicate, shard_batch


def test_make_mesh_sizes():
    m8 = make_mesh(8)
    assert m8.devices.shape == (8,)
    m2 = make_mesh(2)
    assert m2.devices.shape == (2,)
    assert m8.axis_names == ("data",)


def test_shard_batch_and_replicate():
    mesh = make_mesh(8)
    batch = {
        "images": np.zeros((16, 4, 4, 3), np.float32),
        "labels": np.zeros((16,), np.int32),
    }
    sharded = shard_batch(batch, mesh)
    assert sharded["images"].sharding.spec == jax.sharding.PartitionSpec("data")
    tree = replicate({"w": jnp.ones((4,))}, mesh)
    assert tree["w"].sharding.spec == jax.sharding.PartitionSpec()


def test_host_batch_slice_single_process():
    per, idx = host_batch_slice(256)
    assert per == 256 and idx == 0


def test_initialize_distributed_noop():
    # single-process: explicit num_processes=1 is a no-op
    initialize_distributed(num_processes=1)
