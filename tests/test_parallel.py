"""Parallel-layer behavior tests: mesh construction limits, uneven-batch
sharding failures, multi-host batch/cursor arithmetic. Multi-device DP
numerics equivalence lives in test_train.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.parallel import (
    host_batch_slice,
    initialize_distributed,
    make_mesh,
    replicate,
    shard_batch,
)


def test_make_mesh_sizes():
    m8 = make_mesh(8)
    assert m8.devices.shape == (8,)
    m2 = make_mesh(2)
    assert m2.devices.shape == (2,)
    assert m8.axis_names == ("data",)


def test_make_mesh_more_than_available_raises():
    with pytest.raises(ValueError, match="devices"):
        make_mesh(16)  # only 8 virtual devices in the test harness


def test_shard_batch_and_replicate():
    mesh = make_mesh(8)
    batch = {
        "images": np.zeros((16, 4, 4, 3), np.float32),
        "labels": np.zeros((16,), np.int32),
    }
    sharded = shard_batch(batch, mesh)
    assert sharded["images"].sharding.spec == jax.sharding.PartitionSpec("data")
    # each device holds exactly global/8 rows
    shard_shapes = {s.data.shape for s in sharded["images"].addressable_shards}
    assert shard_shapes == {(2, 4, 4, 3)}
    tree = replicate({"w": jnp.ones((4,))}, mesh)
    assert tree["w"].sharding.spec == jax.sharding.PartitionSpec()


def test_shard_batch_uneven_raises():
    """A global batch not divisible by the mesh must fail loudly at
    placement time, not silently mis-shard."""
    mesh = make_mesh(8)
    batch = {"labels": np.zeros((10,), np.int32)}
    with pytest.raises(ValueError):
        jax.block_until_ready(shard_batch(batch, mesh))


def test_host_batch_slice_single_process():
    per, idx = host_batch_slice(256)
    assert per == 256 and idx == 0


def test_host_batch_slice_multi_host(monkeypatch):
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "process_index", lambda: 3)
    per, idx = host_batch_slice(256)
    assert per == 64 and idx == 3
    with pytest.raises(ValueError, match="divisible"):
        host_batch_slice(255)


def test_multi_host_shard_stream_offsets(monkeypatch, tmp_path):
    """Each host's loader starts num_shards/n_hosts shards in
    (trainer._build_data): host 1 of 2 with 4 shards starts at shard 2."""
    from resnet_tpu.config import (
        DataConfig,
        ExecutionConfig,
        OptimizerConfig,
        TrainConfig,
        tiny_model_config,
    )
    from resnet_tpu.data import write_shard
    from resnet_tpu.train import Trainer

    rng = np.random.default_rng(0)
    mcfg = tiny_model_config()
    d = mcfg.input_dim
    shard_dir = str(tmp_path / "shards")
    for s in range(4):
        write_shard(
            shard_dir, s,
            rng.normal(0, 50, (8, 3, d, d)).astype(np.float32),
            np.full((8,), s, np.int32) % mcfg.num_classes,
        )

    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    cfg = TrainConfig(
        model=mcfg,
        execution=ExecutionConfig(),
        optimizer=OptimizerConfig(),
        data=DataConfig(shard_dir=shard_dir, batch_size=8, shard_images=8,
                        num_shards=4, layout="NCHW"),
        checkpoint_dir="",
    )
    trainer = Trainer(cfg, use_mesh=False)
    batch = next(trainer._host_iter)
    # host 1's stream begins at shard 2: labels are the shard id
    assert int(batch["labels"][0]) == 2 % mcfg.num_classes
    # post-batch cursor: python iterator reports (2, 1), the native loader
    # eagerly normalizes to (3, 0) — same stream position
    cur = batch["cursor"]
    assert (cur.shard, cur.batch_in_shard) in ((2, 1), (3, 0))


def test_initialize_distributed_noop():
    # single-process: explicit num_processes=1 is a no-op
    initialize_distributed(num_processes=1)


def test_composite_mesh_fc_tensor_parallel_matches_single_device(rng):
    """(data x model) mesh: FC head sharded over the model axis, batch over
    data — one step must reproduce 1-device numerics (the partitioner's
    derived collectives are semantically invisible)."""
    from resnet_tpu.config import (
        DataConfig,
        ExecutionConfig,
        OptimizerConfig,
        TrainConfig,
        tiny_model_config,
    )
    from resnet_tpu.parallel import composite_shardings, make_mesh_2d
    from resnet_tpu.train import init_train_state, make_train_step

    mesh = make_mesh_2d(4, 2)
    assert mesh.axis_names == ("data", "model")
    cfg = TrainConfig(
        model=tiny_model_config(),
        execution=ExecutionConfig(),
        # SGD: the param delta is lr*grad, so tolerances compare gradients
        # directly (Adam's first-step update is ~lr*sign(g), which flips on
        # fp-reassociation noise for near-zero gradients)
        optimizer=OptimizerConfig(name="sgd", learning_rate=1e-3),
        data=DataConfig(batch_size=8, synthetic=True),
    )
    state = init_train_state(cfg)
    shardings = composite_shardings(state, mesh)
    # the FC kernel (and its Adam moments) actually land sharded
    assert shardings.params["fc"]["w"].spec == jax.sharding.PartitionSpec(
        None, "model"
    )
    assert shardings.params["blocks"][0]["bn_reduce"]["gamma"].spec == (
        jax.sharding.PartitionSpec()
    )

    d = cfg.model.input_dim
    batch = {
        "images": rng.normal(0, 50, (8, d, d, 3)).astype(np.float32),
        "labels": rng.integers(0, cfg.model.num_classes, (8,)).astype(np.int32),
    }

    placed = jax.device_put(state, shardings)
    step = make_train_step(cfg, mesh, donate=False, state_shardings=shardings)
    new_state, metrics = step(placed, shard_batch(batch, mesh))
    assert new_state.params["fc"]["w"].sharding.spec == (
        jax.sharding.PartitionSpec(None, "model")
    )

    step1 = make_train_step(cfg, donate=False)
    ref_state, ref_metrics = step1(state, batch)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["grad_norm"]), float(ref_metrics["grad_norm"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree.leaves(new_state.params), jax.tree.leaves(ref_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_spatial_partition_matches_single_device(rng):
    """(data x spatial) mesh: the image HEIGHT dim sharded across devices.
    The SPMD partitioner must derive conv/pool halo exchanges and BN's
    cross-shard spatial psums such that one train step reproduces
    1-device numerics exactly (the large-image scaling lever)."""
    from resnet_tpu.config import (
        DataConfig,
        ExecutionConfig,
        OptimizerConfig,
        TrainConfig,
        tiny_model_config,
    )
    from resnet_tpu.parallel import make_mesh_2d, replicate, spatial_shard_batch
    from resnet_tpu.train import init_train_state, make_train_step

    mesh = make_mesh_2d(4, 2, axes=("data", "spatial"))
    cfg = TrainConfig(
        model=tiny_model_config(),
        execution=ExecutionConfig(),
        optimizer=OptimizerConfig(name="sgd", learning_rate=1e-3),
        data=DataConfig(batch_size=8, synthetic=True),
    )
    state = init_train_state(cfg)

    d = cfg.model.input_dim
    batch = {
        "images": rng.normal(0, 50, (8, d, d, 3)).astype(np.float32),
        "labels": rng.integers(0, cfg.model.num_classes, (8,)).astype(np.int32),
    }

    placed_batch = spatial_shard_batch(batch, mesh)
    assert placed_batch["images"].sharding.spec == jax.sharding.PartitionSpec(
        "data", "spatial"
    )
    # each device holds a (batch/4, H/2) tile of the input
    shard_shapes = {
        s.data.shape for s in placed_batch["images"].addressable_shards
    }
    assert shard_shapes == {(2, d // 2, d, 3)}

    placed = replicate(state, mesh)
    step = make_train_step(
        cfg, mesh, donate=False,
        batch_shardings={
            "images": placed_batch["images"].sharding,
            "labels": placed_batch["labels"].sharding,
        },
    )
    new_state, metrics = step(placed, placed_batch)

    step1 = make_train_step(cfg, donate=False)
    ref_state, ref_metrics = step1(state, batch)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["grad_norm"]), float(ref_metrics["grad_norm"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree.leaves(new_state.params), jax.tree.leaves(ref_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_trainer_spatial_devices_end_to_end(rng, tmp_path):
    """ParallelConfig(spatial_devices=2) through the real Trainer: mesh
    construction, per-key batch shardings in the prefetcher, train step,
    and eval — metrics must match the plain data-parallel Trainer on the
    same data stream."""
    import itertools

    from resnet_tpu.config import (
        DataConfig,
        ExecutionConfig,
        OptimizerConfig,
        ParallelConfig,
        TrainConfig,
        tiny_model_config,
    )
    from resnet_tpu.train import Trainer

    d = tiny_model_config().input_dim
    batches = [
        {
            "images": rng.normal(0, 50, (8, d, d, 3)).astype(np.float32),
            "labels": rng.integers(0, 10, (8,)).astype(np.int32),
        }
        for _ in range(3)
    ]

    def cfg(spatial):
        return TrainConfig(
            model=tiny_model_config(),
            execution=ExecutionConfig(),
            optimizer=OptimizerConfig(name="sgd", learning_rate=1e-3),
            data=DataConfig(batch_size=8, synthetic=True),
            parallel=ParallelConfig(spatial_devices=spatial),
            checkpoint_dir="",
            log_every=0,
        )

    results = {}
    for spatial in (1, 2):
        tr = Trainer(cfg(spatial), data_source=itertools.cycle(batches))
        if spatial > 1:
            assert tr.mesh.axis_names == ("data", "spatial")
            assert tr.mesh.shape["spatial"] == 2
        m = tr.run(2)
        ev = tr.evaluate(iter(batches), 2)
        tr.finalize()
        results[spatial] = (m["loss"], ev["loss"], ev["accuracy"])

    a, b = results[1], results[2]
    np.testing.assert_allclose(a[0], b[0], rtol=1e-4)
    np.testing.assert_allclose(a[1], b[1], rtol=1e-4)
    np.testing.assert_allclose(a[2], b[2], rtol=1e-6)


def test_trainer_spatial_devices_rejects_shard_map():
    from resnet_tpu.config import (
        DataConfig,
        ParallelConfig,
        TrainConfig,
        tiny_model_config,
    )
    from resnet_tpu.train import Trainer

    cfg = TrainConfig(
        model=tiny_model_config(),
        data=DataConfig(batch_size=8, synthetic=True),
        parallel=ParallelConfig(mode="shard_map", spatial_devices=2),
        checkpoint_dir="",
    )
    with pytest.raises(ValueError, match="shard_map|auto"):
        Trainer(cfg)


def test_trainer_shard_map_rejects_grad_accum():
    """mode='shard_map' computes single-pass gradients: grad_accum > 1
    would be silently ignored, so the Trainer must reject it loudly
    (same ethos as the spatial/blockfused guards)."""
    from resnet_tpu.config import (
        DataConfig,
        ExecutionConfig,
        ParallelConfig,
        TrainConfig,
        tiny_model_config,
    )
    from resnet_tpu.train import Trainer

    cfg = TrainConfig(
        model=tiny_model_config(),
        execution=ExecutionConfig(grad_accum=2),
        data=DataConfig(batch_size=8, synthetic=True),
        parallel=ParallelConfig(mode="shard_map"),
        checkpoint_dir="",
    )
    with pytest.raises(ValueError, match="grad_accum"):
        Trainer(cfg)


def test_trainer_spatial_rejects_grad_accum():
    """spatial_devices > 1 + grad_accum > 1 is the known-miscompiling
    combination (see train/step.py:make_train_step) — config-level
    rejection with the knobs named."""
    from resnet_tpu.config import (
        DataConfig,
        ExecutionConfig,
        ParallelConfig,
        TrainConfig,
        tiny_model_config,
    )
    from resnet_tpu.train import Trainer

    cfg = TrainConfig(
        model=tiny_model_config(),
        execution=ExecutionConfig(grad_accum=2),
        data=DataConfig(batch_size=8, synthetic=True),
        parallel=ParallelConfig(spatial_devices=2),
        checkpoint_dir="",
    )
    with pytest.raises(ValueError, match="grad_accum"):
        Trainer(cfg)


def test_zero_shardings_match_single_device(rng):
    """ZeRO-style state sharding: params/moments sharded across 'data',
    the partitioner all-gathers for compute — one step must reproduce
    1-device numerics, and the big leaves must actually land sharded."""
    from resnet_tpu.config import (
        DataConfig,
        ExecutionConfig,
        OptimizerConfig,
        TrainConfig,
        tiny_model_config,
    )
    from resnet_tpu.parallel import make_mesh, zero_shardings
    from resnet_tpu.train import init_train_state, make_train_step

    mesh = make_mesh(8)
    cfg = TrainConfig(
        model=tiny_model_config(),
        execution=ExecutionConfig(),
        # SGD: the param delta is lr*grad, so tolerances compare gradients
        # directly (Adam's first-step update is ~lr*sign(g), which flips
        # on fp-reassociation noise — same rationale as the sibling tests)
        optimizer=OptimizerConfig(name="sgd", learning_rate=1e-3),
        data=DataConfig(batch_size=8, synthetic=True),
    )
    state = init_train_state(cfg)
    shardings = zero_shardings(state, mesh, min_bytes=1024)

    # at least the FC weight (and its momentum buffer) shard on a real axis
    fc_spec = shardings.params["fc"]["w"].spec
    assert "data" in fc_spec
    assert shardings.opt_state.momentum_buf["fc"]["w"].spec == fc_spec
    # scalars stay replicated
    assert shardings.step.spec == jax.sharding.PartitionSpec()

    d = cfg.model.input_dim
    batch = {
        "images": rng.normal(0, 50, (8, d, d, 3)).astype(np.float32),
        "labels": rng.integers(0, cfg.model.num_classes, (8,)).astype(np.int32),
    }
    placed = jax.device_put(state, shardings)
    step = make_train_step(cfg, mesh, donate=False, state_shardings=shardings)
    new_state, metrics = step(placed, shard_batch(batch, mesh))
    # state stays ZeRO-sharded across steps
    assert new_state.params["fc"]["w"].sharding.spec == fc_spec

    step1 = make_train_step(cfg, donate=False)
    ref_state, ref_metrics = step1(state, batch)
    np.testing.assert_allclose(
        float(metrics["loss"]), float(ref_metrics["loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["grad_norm"]), float(ref_metrics["grad_norm"]), rtol=1e-4
    )
    for a, b in zip(
        jax.tree.leaves(new_state.params), jax.tree.leaves(ref_state.params)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=2e-6
        )


def test_trainer_zero_sharding_end_to_end(rng, tmp_path):
    """ParallelConfig(zero_sharding=True) through the real Trainer:
    sharded persistent state, matching metrics, and a checkpoint
    dump/resume round-trip of the ZeRO-sharded state."""
    import itertools

    from resnet_tpu.config import (
        RESUME_LATEST,
        DataConfig,
        ExecutionConfig,
        OptimizerConfig,
        ParallelConfig,
        TrainConfig,
        tiny_model_config,
    )
    from resnet_tpu.train import Trainer

    d = tiny_model_config().input_dim
    batches = [
        {
            "images": rng.normal(0, 50, (8, d, d, 3)).astype(np.float32),
            "labels": rng.integers(0, 10, (8,)).astype(np.int32),
        }
        for _ in range(3)
    ]

    def cfg(zero, resume=None):
        return TrainConfig(
            model=tiny_model_config(),
            execution=ExecutionConfig(),
            optimizer=OptimizerConfig(name="sgd", learning_rate=1e-3),
            data=DataConfig(batch_size=8, synthetic=True),
            parallel=ParallelConfig(zero_sharding=zero, zero_min_bytes=1024),
            checkpoint_dir=str(tmp_path / ("z" if zero else "r")),
            log_every=0,
            resume_from=resume,
        )

    results = {}
    for zero in (False, True):
        tr = Trainer(cfg(zero), data_source=itertools.cycle(batches))
        if zero:
            spec = tr.state.params["fc"]["w"].sharding.spec
            assert "data" in spec, f"FC weight not ZeRO-sharded: {spec}"
        m = tr.run(2)
        ev = tr.evaluate(iter(batches), 2)
        tr.finalize()
        results[zero] = (m["loss"], ev["loss"])

    np.testing.assert_allclose(results[False][0], results[True][0], rtol=1e-4)
    np.testing.assert_allclose(results[False][1], results[True][1], rtol=1e-4)

    # resume the ZeRO run: restored state re-lands sharded and continues
    tr = Trainer(cfg(True, resume=RESUME_LATEST),
                 data_source=itertools.cycle(batches))
    assert int(jax.device_get(tr.state.step)) == 2
    assert "data" in tr.state.params["fc"]["w"].sharding.spec
    tr.run(1)
    tr.finalize()


def test_spatial_specs_layout_aware_and_loud_failures():
    """NCHW puts H at dim 2 (the spec must skip C); spatial/ZeRO configs
    without a mesh, and indivisible dims, fail loudly at construction."""
    from resnet_tpu.config import (
        DataConfig,
        ExecutionConfig,
        ParallelConfig,
        TrainConfig,
        tiny_model_config,
    )
    from resnet_tpu.parallel import spatial_batch_specs
    from resnet_tpu.train import Trainer

    P = jax.sharding.PartitionSpec
    assert spatial_batch_specs(layout="NHWC")[0] == P("data", "spatial")
    assert spatial_batch_specs(layout="NCHW")[0] == P("data", None, "spatial")
    with pytest.raises(ValueError, match="layout"):
        spatial_batch_specs(layout="CHWN")

    def cfg(**kw):
        parallel = ParallelConfig(**kw.pop("parallel", {}))
        return TrainConfig(
            model=tiny_model_config(),
            execution=ExecutionConfig(**kw.pop("execution", {})),
            data=DataConfig(batch_size=kw.pop("batch", 8), synthetic=True),
            parallel=parallel,
            checkpoint_dir="",
        )

    # NCHW production path: the trainer's derived image spec skips C
    tr = Trainer(
        cfg(execution={"layout": "NCHW"}, parallel={"spatial_devices": 2}),
        use_mesh=True,
    )
    assert tr._batch_shardings["images"].spec == P("data", None, "spatial")
    tr.finalize()

    # silently-unsharded runs are rejected
    with pytest.raises(ValueError, match="mesh"):
        Trainer(cfg(parallel={"spatial_devices": 2}), use_mesh=False)
    with pytest.raises(ValueError, match="mesh"):
        Trainer(cfg(parallel={"zero_sharding": True}), use_mesh=False)
    # indivisible batch/dims get named-knob messages at construction
    with pytest.raises(ValueError, match="batch_size"):
        Trainer(cfg(batch=6, parallel={"spatial_devices": 2}), use_mesh=True)
    with pytest.raises(ValueError, match="spatial_devices"):
        Trainer(cfg(parallel={"spatial_devices": 3}), use_mesh=True)


def test_grad_accum_composes_with_spatial_and_zero(rng):
    """grad_accum's in-step microbatch scan must compose with spatial
    batch sharding and ZeRO state sharding — same numerics as the plain
    accumulated step."""
    from resnet_tpu.config import (
        DataConfig,
        ExecutionConfig,
        OptimizerConfig,
        TrainConfig,
        tiny_model_config,
    )
    from resnet_tpu.parallel import (
        make_mesh,
        make_mesh_2d,
        replicate,
        shard_batch,
        spatial_shard_batch,
        zero_shardings,
    )
    from resnet_tpu.train import init_train_state, make_train_step

    cfg = TrainConfig(
        model=tiny_model_config(),
        execution=ExecutionConfig(grad_accum=2),
        optimizer=OptimizerConfig(name="sgd", learning_rate=1e-3),
        data=DataConfig(batch_size=8, synthetic=True),
    )
    state = init_train_state(cfg)
    d = cfg.model.input_dim
    batch = {
        "images": rng.normal(0, 50, (8, d, d, 3)).astype(np.float32),
        "labels": rng.integers(0, cfg.model.num_classes, (8,)).astype(np.int32),
    }
    _, ref = make_train_step(cfg, donate=False)(state, batch)
    ref_loss = float(ref["loss"])
    ref_gnorm = float(ref["grad_norm"])

    # Spatial sharding x grad_accum is REJECTED at config level: jax
    # 0.9.0's SPMD partitioner miscompiles the microbatched gradient
    # collectives for spatially-sharded inputs (stem filter-grad
    # over-counted by the accum factor, BN beta grads under-reduced by
    # the data-axis size) while keeping the loss exact — a loss-only
    # assertion was blind to it. Sharding-constraint pins on the
    # reshaped stack, on the scanned slice, and a dynamic-slice
    # formulation all still miscompile, so the combination fails loudly
    # (make_train_step) instead of training on corrupt gradients.
    mesh_sp = make_mesh_2d(4, 2, axes=("data", "spatial"))
    sp_batch = spatial_shard_batch(batch, mesh_sp)
    with pytest.raises(ValueError, match="grad_accum"):
        make_train_step(
            cfg, mesh_sp, donate=False,
            batch_shardings={k: v.sharding for k, v in sp_batch.items()},
        )

    # ZeRO state sharding composes with grad_accum and must match BOTH
    # loss and grad_norm (the gradient-corruption class above is only
    # catchable through grads).
    mesh_z = make_mesh(8)
    zsh = zero_shardings(state, mesh_z, min_bytes=1024)
    step_z = make_train_step(cfg, mesh_z, donate=False, state_shardings=zsh)
    _, m_z = step_z(jax.device_put(state, zsh), shard_batch(batch, mesh_z))
    np.testing.assert_allclose(float(m_z["loss"]), ref_loss, rtol=1e-4)
    np.testing.assert_allclose(float(m_z["grad_norm"]), ref_gnorm, rtol=1e-3)
