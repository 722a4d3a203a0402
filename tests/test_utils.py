"""Utility-layer tests: finite-state scanning (check_errors analogue),
metrics logging, NaN-sentinel trainer behavior, top-k accuracy."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.ops import topk_accuracy
from resnet_tpu.utils import MetricsLogger, check_state_finite, nonfinite_report


def test_check_state_finite():
    good = {"a": jnp.ones((4,)), "b": [jnp.zeros((2, 2)), jnp.int32(3)]}
    assert bool(check_state_finite(good))
    bad = {"a": jnp.asarray([1.0, jnp.nan]), "b": jnp.ones((2,))}
    assert not bool(check_state_finite(bad))
    inf = {"a": jnp.asarray([1.0, jnp.inf])}
    assert not bool(check_state_finite(inf))


def test_nonfinite_report():
    tree = {
        "clean": jnp.ones((4,)),
        "dirty": jnp.asarray([1.0, jnp.nan, jnp.inf, 2.0]),
        "ints": jnp.arange(3),
    }
    report = nonfinite_report(tree)
    assert len(report) == 1
    assert "dirty" in report[0] and "1 NaN" in report[0] and "1 Inf" in report[0]


def test_metrics_logger(tmp_path):
    log = MetricsLogger(str(tmp_path), print_every=0)
    for s in range(3):
        log.log_step(s, {"loss": 2.0 - s * 0.1, "accuracy": 0.1 * s}, epoch=0)
    summary = log.epoch_summary(0, 3)
    assert summary["avg_loss"] == pytest.approx(1.9, abs=1e-6)
    log.close()
    lines = (tmp_path / "avg_loss_log.txt").read_text().splitlines()
    assert len(lines) == 3  # one flushed line per step (resnet.cu:3386-3389)
    import json

    recs = [json.loads(l) for l in (tmp_path / "metrics.jsonl").read_text().splitlines()]
    assert recs[2]["step"] == 2


def test_topk_accuracy():
    logits = jnp.asarray([
        [0.1, 0.5, 0.3, 0.2],  # top1=1; top2={1,2}
        [0.9, 0.0, 0.1, 0.0],  # top1=0
    ])
    labels = jnp.asarray([2, 0])
    assert float(topk_accuracy(logits, labels, 1)) == pytest.approx(0.5)
    assert float(topk_accuracy(logits, labels, 2)) == pytest.approx(1.0)


def test_trainer_nan_sentinel(tmp_path, rng):
    """check_errors trip: non-finite params dump to sentinel 99999999 and
    abort (check_errors semantics, resnet.cu:2879-2907)."""
    from resnet_tpu.config import DataConfig, OptimizerConfig, TrainConfig, tiny_model_config
    from resnet_tpu.train import Trainer
    from resnet_tpu.train.trainer import NonFiniteError

    cfg = TrainConfig(
        model=tiny_model_config(),
        optimizer=OptimizerConfig(learning_rate=1e-3, nonfinite_guard=False),
        data=DataConfig(batch_size=4, synthetic=True),
        checkpoint_dir=str(tmp_path / "dumps"),
        checkpoint_every=0,
        log_every=0,
        check_errors=True,
    )
    trainer = Trainer(cfg, use_mesh=False)
    # poison a param
    params = trainer.state.params
    w = np.asarray(params["fc"]["w"]).copy()
    w[0, 0] = np.nan
    params["fc"]["w"] = jnp.asarray(w)
    trainer.state = trainer.state._replace(params=params)
    with pytest.raises(NonFiniteError):
        trainer.run(2)
    assert os.path.isdir(tmp_path / "dumps" / "99999999")


def test_debug_print_tensor(monkeypatch, capfd):
    """printDeviceData equivalent: no-op unless the env gate is set."""
    import resnet_tpu.utils.debug as dbg

    x = jnp.arange(6.0).reshape(2, 3)
    monkeypatch.setattr(dbg, "DEBUG_PRINT", False)
    dbg.debug_print_tensor("quiet", x)  # no-op
    monkeypatch.setattr(dbg, "DEBUG_PRINT", True)
    jax.jit(lambda x: (dbg.debug_print_tensor("loud", x), x * 2)[1])(x).block_until_ready()
    out = capfd.readouterr().out + capfd.readouterr().err
    assert "loud" in out


def test_time_fn_slope_timer():
    """time_fn/time_grad_fn return sane positive per-call times."""
    import jax.numpy as jnp
    from resnet_tpu.utils.profiling import time_fn, time_grad_fn

    import numpy as np

    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (256, 256)), jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).normal(0, 1, (256, 256)), jnp.float32)
    dt = time_fn(lambda a, b: a @ b, (x, w), iters=8, repeats=1)
    assert 0 < dt < 1.0
    dt2 = time_grad_fn(lambda a, b: a @ b, (x, w), iters=8, repeats=1)
    assert 0 < dt2 < 1.0
