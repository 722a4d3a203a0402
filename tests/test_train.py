"""Trainer-engine tests: loss decreases on a tiny model, DP (pjit-auto and
shard_map) matches single-device numerics, checkpoint round-trips."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.config import (
    DataConfig,
    ExecutionConfig,
    OptimizerConfig,
    TrainConfig,
    tiny_model_config,
)
from resnet_tpu.data import ShardCursor, SyntheticDataset
from resnet_tpu.parallel import make_mesh, make_shard_map_train_step
from resnet_tpu.train import Trainer, init_train_state, make_train_step
from resnet_tpu.train.checkpoint import (
    restore_checkpoint,
    restore_npz,
    save_checkpoint,
    save_npz,
)


def tiny_cfg(**kw):
    defaults = dict(
        model=tiny_model_config(),
        execution=ExecutionConfig(),
        optimizer=OptimizerConfig(learning_rate=1e-3),
        data=DataConfig(batch_size=8, synthetic=True),
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def make_batch(rng, cfg, n=None):
    n = n or cfg.data.batch_size
    d = cfg.model.input_dim
    return {
        "images": jnp.asarray(rng.normal(0, 50, (n, d, d, 3)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, cfg.model.num_classes, (n,)).astype(np.int32)),
    }


def test_train_step_reduces_loss(rng):
    cfg = tiny_cfg()
    state = init_train_state(cfg)
    step = make_train_step(cfg, donate=False)
    batch = make_batch(rng, cfg)
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses[::10]
    assert int(state.step) == 30
    assert np.all(np.isfinite(losses))


def test_train_step_metrics_semantics(rng):
    """Reported loss is batch-mean of -log p; loss_sum is the summed CE the
    gradient is actually taken of (resnet.cu:1806-1811, 3360-3380)."""
    cfg = tiny_cfg()
    state = init_train_state(cfg)
    step = make_train_step(cfg, donate=False)
    batch = make_batch(rng, cfg)
    _, metrics = step(state, batch)
    n = cfg.data.batch_size
    assert float(metrics["loss_sum"]) == pytest.approx(float(metrics["loss"]) * n, rel=1e-5)
    assert 0.0 <= float(metrics["accuracy"]) <= 1.0
    # fresh random model on 8 classes: loss near log(8)
    assert float(metrics["loss"]) == pytest.approx(np.log(8), abs=0.5)


def test_data_parallel_matches_single_device(rng):
    """The pjit-auto DP step over 8 virtual devices must produce the same
    updated params as the single-device step on the same global batch.

    SGD is used for the param comparison: its update is linear in the
    gradient, so cross-device reduction-order epsilon stays epsilon (Adam's
    first step is ~ sign(g) * lr, which amplifies any near-zero-gradient
    reduction difference to 2*lr)."""
    cfg = tiny_cfg(optimizer=OptimizerConfig(name="sgd", learning_rate=1e-3))
    batch = make_batch(rng, cfg, n=16)

    state1 = init_train_state(cfg)
    s1, m1 = make_train_step(cfg, donate=False)(state1, batch)

    mesh = make_mesh(8)
    state8 = init_train_state(cfg)
    s8, m8 = make_train_step(cfg, mesh, donate=False)(state8, batch)

    assert float(m1["loss"]) == pytest.approx(float(m8["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
        # atol covers fp32 reduction-order noise in the 8-way gradient sum
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-5)


def test_shard_map_matches_auto(rng):
    """Explicit-psum shard_map DP equals the auto-partitioned path.

    BN is per-device in shard_map (local batch stats) vs global in auto, so
    run with a batch where each shard is the full distribution — per-device
    vs global stats differ; we only check loss is finite and params update,
    plus exact agreement of the optimizer/step plumbing on a 1-device mesh.
    """
    cfg = tiny_cfg()
    batch = make_batch(rng, cfg, n=16)

    mesh1 = make_mesh(1)
    sa = init_train_state(cfg)
    sb = init_train_state(cfg)
    s_auto, m_auto = make_train_step(cfg, mesh1, donate=False)(sa, batch)
    s_sm, m_sm = make_shard_map_train_step(cfg, mesh1, donate=False)(sb, batch)
    assert float(m_auto["loss"]) == pytest.approx(float(m_sm["loss"]), rel=1e-5)
    for a, b in zip(jax.tree.leaves(s_auto.params), jax.tree.leaves(s_sm.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)

    # 8-device shard_map: runs, loss finite, matches auto loss closely
    # (local-BN vs global-BN divergence only)
    mesh8 = make_mesh(8)
    sc = init_train_state(cfg)
    s8, m8 = make_shard_map_train_step(cfg, mesh8, donate=False)(sc, batch)
    assert np.isfinite(float(m8["loss"]))
    assert int(s8.step) == 1


def test_checkpoint_roundtrip(tmp_path, rng):
    cfg = tiny_cfg()
    state = init_train_state(cfg)
    step = make_train_step(cfg, donate=False)
    batch = make_batch(rng, cfg)
    for _ in range(3):
        state, _ = step(state, batch)

    cursor = ShardCursor(shard=2, batch_in_shard=17, epoch=1)
    save_checkpoint(str(tmp_path), 3000, state, cursor, metadata={"note": "test"})

    template = init_train_state(cfg)
    restored, rcursor = restore_checkpoint(str(tmp_path), 3000, template)
    assert (rcursor.shard, rcursor.batch_in_shard, rcursor.epoch) == (2, 17, 1)
    assert int(restored.step) == int(state.step)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(state.opt_state.means), jax.tree.leaves(restored.opt_state.means)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(restored.opt_state.mean_decay_prod) == pytest.approx(
        float(state.opt_state.mean_decay_prod)
    )

    # resumed training continues identically
    s_cont, m_cont = step(state, batch)
    r_cont, rm_cont = step(restored, batch)
    assert float(m_cont["loss"]) == pytest.approx(float(rm_cont["loss"]), rel=1e-6)

    # registry file is self-describing
    reg = (tmp_path / "00003000" / "registry.txt").read_text().splitlines()
    assert len(reg) == len(jax.tree.leaves(state.params))
    assert "init_conv" in reg[0] or any("init_conv" in l for l in reg)


def test_restore_actual_reference_dump_format(tmp_path, rng):
    """An actual reference dump — bare positional trainer_checkpoint.txt
    (resnet.cu:2743-2751), buffers in init-registry order
    (resnet.cu:805-949), conv weights OIHW — must restore into our pytree."""
    from resnet_tpu.train.checkpoint import (
        flat_registry,
        reference_registry_order,
        restore_checkpoint,
    )

    cfg = tiny_cfg()
    state = init_train_state(cfg)
    by_name = dict(flat_registry(jax.device_get(state.params)))
    order = reference_registry_order(state.params)
    assert order[-1] == "fc/w" and set(order) == set(by_name)

    root = tmp_path / "00001000"
    for sub, tree in (
        ("model_params", state.params),
        ("means", state.opt_state.means),
        ("vars", state.opt_state.vars),
    ):
        d = root / sub
        d.mkdir(parents=True)
        named = dict(flat_registry(jax.device_get(tree)))
        for i, name in enumerate(order):
            leaf = np.asarray(named[name], np.float32)
            if leaf.ndim == 4:  # our HWIO -> reference OIHW
                leaf = leaf.transpose(3, 2, 0, 1)
            np.ascontiguousarray(leaf).tofile(d / f"{i:03d}.buffer")
    # positional checkpoint: shard, batch_in_shard, mean_decay, var_decay,
    # dump_id, epoch
    (root / "trainer_checkpoint.txt").write_text(
        "3\n17\n0.99\n0.9975\n1000\n2\n"
    )

    restored, cursor = restore_checkpoint(str(tmp_path), 1000, init_train_state(cfg))
    assert (cursor.shard, cursor.batch_in_shard, cursor.epoch) == (3, 17, 2)
    assert int(restored.step) == 1000
    assert float(restored.opt_state.mean_decay_prod) == pytest.approx(0.99)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(
        jax.tree.leaves(state.opt_state.vars), jax.tree.leaves(restored.opt_state.vars)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_checkpoint_roundtrip(tmp_path, rng):
    cfg = tiny_cfg()
    state = init_train_state(cfg)
    step = make_train_step(cfg, donate=False)
    batch = make_batch(rng, cfg)
    state, _ = step(state, batch)
    p = str(tmp_path / "ckpt.npz")
    save_npz(p, state, ShardCursor(1, 2, 3))
    restored, cur = restore_npz(p, init_train_state(cfg))
    assert (cur.shard, cur.batch_in_shard, cur.epoch) == (1, 2, 3)
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_end_to_end(tmp_path):
    cfg = tiny_cfg(
        checkpoint_dir=str(tmp_path / "dumps"),
        checkpoint_every=4,
        log_every=0,
    )
    trainer = Trainer(cfg, use_mesh=False)
    last = trainer.run(8)
    assert np.isfinite(last["loss"])
    trainer.finalize()
    # periodic dumps at steps 0 and 4 + final sentinel
    assert os.path.isdir(tmp_path / "dumps" / "00000000")
    assert os.path.isdir(tmp_path / "dumps" / "00000004")
    assert os.path.isdir(tmp_path / "dumps" / "77777777")
    # avg_loss_log.txt has one line per step (resnet.cu:3386-3389)
    lines = (tmp_path / "dumps" / "avg_loss_log.txt").read_text().splitlines()
    assert len(lines) == 8


def test_trainer_mesh_end_to_end(tmp_path):
    cfg = tiny_cfg(checkpoint_dir="", log_every=0)
    trainer = Trainer(cfg, use_mesh=True)
    last = trainer.run(4)
    assert np.isfinite(last["loss"])


def test_remat_matches_no_remat(rng):
    """jax.checkpoint memory policy must not change numerics
    (resnet_clean.cu recompute strategy, SURVEY.md appendix)."""
    cfg_cache = tiny_cfg(execution=ExecutionConfig(remat="none"))
    cfg_remat = tiny_cfg(execution=ExecutionConfig(remat="block"))
    batch = make_batch(rng, cfg_cache)
    s1 = init_train_state(cfg_cache)
    s2 = init_train_state(cfg_remat)
    s1n, m1 = make_train_step(cfg_cache, donate=False)(s1, batch)
    s2n, m2 = make_train_step(cfg_remat, donate=False)(s2, batch)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
    for a, b in zip(jax.tree.leaves(s1n.params), jax.tree.leaves(s2n.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_trainer_with_real_shards(tmp_path, rng):
    """Trainer end-to-end from on-disk shards (native loader when built),
    including mid-training checkpoint + resume continuing the batch stream."""
    import numpy as np
    from resnet_tpu.data import write_shard
    from resnet_tpu.config import ModelConfig

    shard_dir = str(tmp_path / "shards")
    mcfg = tiny_model_config()
    for s in range(2):
        imgs = rng.normal(0, 50, (16, 3, mcfg.input_dim, mcfg.input_dim)).astype(np.float32)
        labels = rng.integers(0, mcfg.num_classes, (16,)).astype(np.int32)
        write_shard(shard_dir, s, imgs, labels)

    cfg = tiny_cfg(
        data=DataConfig(
            shard_dir=shard_dir, batch_size=8, shard_images=16, num_shards=2,
            layout="NCHW",
        ),
        checkpoint_dir=str(tmp_path / "dumps"),
        checkpoint_every=2,
        log_every=0,
    )
    trainer = Trainer(cfg, use_mesh=False)
    last = trainer.run(3)
    assert np.isfinite(last["loss"])
    trainer.finalize()

    import dataclasses
    cfg2 = dataclasses.replace(cfg, resume_from=2)
    trainer2 = Trainer(cfg2, use_mesh=False)
    assert int(jax.device_get(trainer2.state.step)) == 2
    last2 = trainer2.run(2)
    assert np.isfinite(last2["loss"])


def test_checkpoint_cursor_not_skewed_by_prefetch(tmp_path, rng):
    """The prefetch worker runs several batches ahead of training; a
    checkpoint must record the stream position of the last *trained* batch
    (reference dumps the cursor synchronously inside update_parameters,
    resnet.cu:2947-2950), so that resume re-reads exactly the first
    untrained batch — no silent skips."""
    from resnet_tpu.data import ShardDataset, ShardIterator, write_shard
    from resnet_tpu.train.checkpoint import restore_checkpoint

    shard_dir = str(tmp_path / "shards")
    mcfg = tiny_model_config()
    d = mcfg.input_dim
    # labels encode the global sample index so batches are identifiable
    for s in range(2):
        imgs = rng.normal(0, 50, (16, 3, d, d)).astype(np.float32)
        labels = (np.arange(16) + 16 * s).astype(np.int32) % mcfg.num_classes
        write_shard(shard_dir, s, imgs, labels)

    dcfg = DataConfig(
        shard_dir=shard_dir, batch_size=8, shard_images=16, num_shards=2,
        layout="NCHW", prefetch=2,
    )
    cfg = tiny_cfg(
        data=dcfg,
        checkpoint_dir=str(tmp_path / "dumps"),
        checkpoint_every=2,
        log_every=0,
    )
    trainer = Trainer(cfg, use_mesh=False)
    trainer.run(3)  # dump at step 2 happens BEFORE training batch 2
    trainer.finalize()

    template = init_train_state(cfg)
    _, cursor = restore_checkpoint(str(tmp_path / "dumps"), 2, template)

    # with prefetch depth 2 the live iterator was ~2 batches ahead; the
    # dumped cursor must still point at batch 2 (= shard 1, batch 0)
    ds = ShardDataset(shard_dir, num_shards=2, shard_images=16,
                      image_dim=d, disk_layout="NCHW")
    resumed = ShardIterator(ds, batch_size=8, cursor=cursor)
    labels = next(resumed)["labels"]
    np.testing.assert_array_equal(
        labels, (np.arange(8) + 16).astype(np.int32) % mcfg.num_classes
    )
    # trainer's own cursor advanced to the last trained batch (batch 2)
    assert (trainer.cursor.shard, trainer.cursor.batch_in_shard) in ((1, 1), (0, 3))


def test_stage_remat_matches(rng):
    """'stage' remat (whole-stage recompute) must not change numerics."""
    cfg_none = tiny_cfg(execution=ExecutionConfig(remat="none"))
    cfg_stage = tiny_cfg(execution=ExecutionConfig(remat="stage"))
    batch = make_batch(rng, cfg_none)
    s1, m1 = make_train_step(cfg_none, donate=False)(init_train_state(cfg_none), batch)
    s2, m2 = make_train_step(cfg_stage, donate=False)(init_train_state(cfg_stage), batch)
    assert float(m1["loss"]) == pytest.approx(float(m2["loss"]), rel=1e-6)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7)


def test_bf16_training_reduces_loss(rng):
    """The 'fast' precision policy (bf16 compute, fp32 params/stats) must
    train: loss falls and stays finite."""
    cfg = tiny_cfg(
        execution=ExecutionConfig(
            compute_dtype="bfloat16", matmul_precision="default"
        ),
        optimizer=OptimizerConfig(learning_rate=1e-3),
    )
    state = init_train_state(cfg)
    step = make_train_step(cfg, donate=False)
    batch = make_batch(rng, cfg)
    losses = []
    for _ in range(20):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert np.all(np.isfinite(losses))
    assert losses[-1] < losses[0]
    # params remain fp32 master copies
    assert all(
        np.asarray(p).dtype == np.float32 for p in jax.tree.leaves(state.params)
    )


def test_save_checkpoint_atomic_on_failure(tmp_path, monkeypatch):
    # a dump that dies mid-write must not be visible to restore/discovery,
    # and must not clobber the previous dump (save_checkpoint writes into a
    # temp sibling and publishes by rename)
    import resnet_tpu.train.checkpoint as ckpt_mod
    from resnet_tpu.train.checkpoint import discover_latest_dump

    cfg = tiny_cfg()
    state = init_train_state(cfg)
    cursor = ShardCursor()
    save_checkpoint(str(tmp_path), 1000, state, cursor)

    orig = ckpt_mod._write_buffers
    calls = {"n": 0}

    def failing_write(directory, registry):
        calls["n"] += 1
        if calls["n"] > 1:
            raise IOError("disk full")
        orig(directory, registry)

    monkeypatch.setattr(ckpt_mod, "_write_buffers", failing_write)
    with pytest.raises(IOError):
        save_checkpoint(str(tmp_path), 2000, state, cursor)
    monkeypatch.setattr(ckpt_mod, "_write_buffers", orig)

    assert not (tmp_path / "00002000").exists()
    assert not any(".tmp-" in name for name in os.listdir(tmp_path))
    assert discover_latest_dump(str(tmp_path)) == 1000
    restored, _ = restore_checkpoint(str(tmp_path), 1000, init_train_state(cfg))
    assert int(restored.step) == int(state.step)


def test_discover_latest_dump(tmp_path):
    from resnet_tpu.train.checkpoint import (
        FINAL_DUMP_ID,
        NAN_DUMP_ID,
        discover_latest_dump,
    )

    assert discover_latest_dump(str(tmp_path)) is None
    cfg = tiny_cfg()
    state = init_train_state(cfg)
    cursor = ShardCursor()
    save_checkpoint(str(tmp_path), 0, state, cursor)
    save_checkpoint(str(tmp_path), 1000, state, cursor)
    assert discover_latest_dump(str(tmp_path)) == 1000
    # the non-finite forensic sentinel is never resumable state
    save_checkpoint(str(tmp_path), NAN_DUMP_ID, state, cursor)
    assert discover_latest_dump(str(tmp_path)) == 1000
    # the final sentinel IS (a finished run's last state)
    save_checkpoint(str(tmp_path), FINAL_DUMP_ID, state, cursor)
    assert discover_latest_dump(str(tmp_path)) == FINAL_DUMP_ID
    # incomplete dirs (no trainer_checkpoint.txt) are invisible
    (tmp_path / "99999998").mkdir()
    assert discover_latest_dump(str(tmp_path)) == FINAL_DUMP_ID


def test_async_checkpointer_matches_sync(tmp_path, rng):
    from resnet_tpu.train.checkpoint import AsyncCheckpointer

    cfg = tiny_cfg()
    state = init_train_state(cfg)
    step = make_train_step(cfg, donate=False)
    state, _ = step(state, make_batch(rng, cfg))
    cursor = ShardCursor(shard=1, batch_in_shard=2, epoch=0)

    save_checkpoint(str(tmp_path / "sync"), 100, state, cursor)
    ac = AsyncCheckpointer()
    ac.save(str(tmp_path / "async"), 100, state, cursor)
    ac.close()

    sync_root = tmp_path / "sync" / "00000100"
    async_root = tmp_path / "async" / "00000100"
    for sub in ("model_params", "means", "vars"):
        files = sorted(os.listdir(sync_root / sub))
        assert files and files == sorted(os.listdir(async_root / sub))
        for fn in files:
            assert (sync_root / sub / fn).read_bytes() == (
                async_root / sub / fn
            ).read_bytes(), fn
    assert (sync_root / "trainer_checkpoint.txt").read_text() == (
        async_root / "trainer_checkpoint.txt"
    ).read_text()


def test_trainer_async_checkpoint_and_resume_latest(tmp_path):
    import dataclasses

    from resnet_tpu.config import RESUME_LATEST
    from resnet_tpu.train.checkpoint import FINAL_DUMP_ID, discover_latest_dump

    dumps = str(tmp_path / "dumps")
    cfg = tiny_cfg(
        checkpoint_dir=dumps, checkpoint_every=2, log_every=0,
        async_checkpoint=True,
    )
    trainer = Trainer(cfg, use_mesh=False)
    trainer.run(5)
    trainer.checkpointer.wait()
    for d in ("00000000", "00000002", "00000004"):
        assert os.path.isdir(tmp_path / "dumps" / d), d
    assert discover_latest_dump(dumps) == 4

    # resume 'latest' finds the newest periodic dump
    cfg2 = dataclasses.replace(cfg, resume_from=RESUME_LATEST, async_checkpoint=False)
    t2 = Trainer(cfg2, use_mesh=False)
    assert int(t2.state.step) == 4

    # after finalize the final sentinel wins
    trainer.finalize()
    assert discover_latest_dump(dumps) == FINAL_DUMP_ID

    # latest on an empty dir is a loud error
    cfg3 = dataclasses.replace(
        cfg, resume_from=RESUME_LATEST, checkpoint_dir=str(tmp_path / "nowhere")
    )
    with pytest.raises(FileNotFoundError):
        Trainer(cfg3, use_mesh=False)


def test_synthetic_device_batches_cycle():
    """device_batches=K stages K distinct device-resident batches and
    cycles them with no per-step transfer (the soak-mode input path)."""
    import numpy as np

    from resnet_tpu.config import (
        DataConfig,
        ExecutionConfig,
        OptimizerConfig,
        TrainConfig,
        tiny_model_config,
    )
    from resnet_tpu.train import Trainer

    cfg = TrainConfig(
        model=tiny_model_config(),
        execution=ExecutionConfig(),
        optimizer=OptimizerConfig(),
        data=DataConfig(batch_size=4, synthetic=True, device_batches=3),
        checkpoint_dir="",
    )
    tr = Trainer(cfg, use_mesh=False)
    it = tr._device_iter()
    sums = [float(jnp.sum(next(it)["images"])) for _ in range(4)]
    assert len({round(s, 3) for s in sums[:3]}) == 3, sums
    assert sums[3] == sums[0]
    tr.finalize()
