"""Fused execution path (kernels='fused'): full-model parity with the
standard XLA path — forward logits, BN statistics, and gradients."""

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
from resnet_tpu.models import forward, init_params
from resnet_tpu.train import init_train_state, make_train_step
from resnet_tpu.train.step import _loss_fn


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    mcfg = tiny_model_config()
    params = init_params(jax.random.PRNGKey(0), mcfg)
    x = jnp.asarray(rng.normal(0, 50, (4, 16, 16, 3)).astype(np.float32))
    exla = ExecutionConfig(kernels="xla")
    efus = ExecutionConfig(kernels="fused", pallas_interpret=True)
    return mcfg, params, x, exla, efus


def test_forward_parity(setup):
    mcfg, params, x, exla, efus = setup
    lx, ax = forward(params, x, mcfg, exla, train=True)
    lf, af = forward(params, x, mcfg, efus, train=True)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lf), rtol=1e-3, atol=1e-4)
    # BN stats (mean, var) match per layer
    mx, vx = ax["bn_stats"]["init_bn"]
    mf, vf = af["bn_stats"]["init_bn"]
    np.testing.assert_allclose(np.asarray(mx), np.asarray(mf), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vf), rtol=1e-3, atol=1e-3)
    for bx, bf in zip(ax["bn_stats"]["blocks"], af["bn_stats"]["blocks"]):
        assert set(bx) == set(bf)
        for k in bx:
            np.testing.assert_allclose(
                np.asarray(bx[k][0]), np.asarray(bf[k][0]), rtol=1e-3, atol=1e-3
            )


def test_gradient_parity(setup, rng):
    mcfg, params, x, exla, efus = setup
    labels = jnp.asarray(rng.integers(0, 8, (4,)).astype(np.int32))
    batch = {"images": x, "labels": labels}
    cx = TrainConfig(model=mcfg, execution=exla, data=DataConfig(batch_size=4))
    cf = TrainConfig(model=mcfg, execution=efus, data=DataConfig(batch_size=4))
    gx = jax.grad(lambda p: _loss_fn(p, batch, None, cx)[0])(params)
    gf = jax.grad(lambda p: _loss_fn(p, batch, None, cf)[0])(params)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gf)):
        scale = max(1e-3, float(np.max(np.abs(np.asarray(a)))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=2e-3, atol=5e-4
        )


def test_train_step_runs_and_learns(rng):
    cfg = TrainConfig(
        model=tiny_model_config(),
        execution=ExecutionConfig(kernels="fused", pallas_interpret=True),
        optimizer=OptimizerConfig(learning_rate=1e-3),
        data=DataConfig(batch_size=8, synthetic=True),
    )
    state = init_train_state(cfg)
    step = make_train_step(cfg, donate=False)
    batch = {
        "images": jnp.asarray(rng.normal(0, 50, (8, 16, 16, 3)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 8, (8,)).astype(np.int32)),
    }
    losses = []
    for _ in range(10):
        state, m = step(state, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert np.all(np.isfinite(losses))


def test_relu_cap_parity(setup, rng):
    """relu_cap (the fast variant's clipped ReLU, cap 10,
    resnet_cudnn_fast.cu:1143-1145) must produce identical forward logits
    and gradients on the fused engine as on the XLA path — both the caps
    in the BN activations and in the residual joins."""
    mcfg, params, x, _, _ = setup
    # small cap so the clip actually engages on this data
    exla = ExecutionConfig(kernels="xla", relu_cap=2.0)
    efus = ExecutionConfig(kernels="fused", pallas_interpret=True, relu_cap=2.0)
    lx, _ = forward(params, x, mcfg, exla, train=True)
    lf, _ = forward(params, x, mcfg, efus, train=True)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lf), rtol=1e-3, atol=1e-4)
    # capped vs uncapped must differ (the cap engages)
    lu, _ = forward(params, x, mcfg, ExecutionConfig(kernels="xla"), train=True)
    assert not np.allclose(np.asarray(lu), np.asarray(lx))

    labels = jnp.asarray(rng.integers(0, 8, (4,)).astype(np.int32))
    batch = {"images": x, "labels": labels}
    cx = TrainConfig(model=mcfg, execution=exla, data=DataConfig(batch_size=4))
    cf = TrainConfig(model=mcfg, execution=efus, data=DataConfig(batch_size=4))
    gx = jax.grad(lambda p: _loss_fn(p, batch, None, cx)[0])(params)
    gf = jax.grad(lambda p: _loss_fn(p, batch, None, cf)[0])(params)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gf)):
        scale = max(1e-3, float(np.max(np.abs(np.asarray(a)))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=2e-3, atol=5e-4
        )


def test_basic_block_fused_parity(rng):
    """Fused path on a basic-block (resnet18-style) tiny model."""
    mcfg = tiny_model_config(bottleneck=False, expansion=1)
    params = init_params(jax.random.PRNGKey(0), mcfg)
    x = jnp.asarray(rng.normal(0, 50, (4, 16, 16, 3)).astype(np.float32))
    lx, _ = forward(params, x, mcfg, ExecutionConfig(kernels="xla"), train=True)
    lf, _ = forward(
        params, x, mcfg,
        ExecutionConfig(kernels="fused", pallas_interpret=True), train=True,
    )
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lf), rtol=1e-3, atol=1e-4)


def test_hybrid_forward_and_grad_parity(setup, rng):
    """kernels='hybrid' (per-layer measured dispatch between the Pallas
    fused conv and the XLA chain) must match the standard path exactly
    like 'fused' does — regardless of which engine each site picks."""
    mcfg, params, x, exla, _ = setup
    ehyb = ExecutionConfig(kernels="hybrid", pallas_interpret=True)
    lx, _ = forward(params, x, mcfg, exla, train=True)
    lh, _ = forward(params, x, mcfg, ehyb, train=True)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lh), rtol=1e-3, atol=1e-4)

    labels = jnp.asarray(rng.integers(0, 8, (4,)).astype(np.int32))
    batch = {"images": x, "labels": labels}
    cx = TrainConfig(model=mcfg, execution=exla, data=DataConfig(batch_size=4))
    ch = TrainConfig(model=mcfg, execution=ehyb, data=DataConfig(batch_size=4))
    gx = jax.grad(lambda p: _loss_fn(p, batch, None, cx)[0])(params)
    gh = jax.grad(lambda p: _loss_fn(p, batch, None, ch)[0])(params)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gh)):
        scale = max(1e-3, float(np.max(np.abs(np.asarray(a)))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=2e-3, atol=5e-4
        )


def test_fusedxla_forward_and_grad_parity(setup, rng):
    """kernels='fusedxla' (the fused dataflow realized entirely with XLA
    ops — the zero-custom-call control for attributing custom-call layout
    fixup cost) must also match the standard path."""
    mcfg, params, x, exla, _ = setup
    efx = ExecutionConfig(kernels="fusedxla")
    lx, _ = forward(params, x, mcfg, exla, train=True)
    lf, _ = forward(params, x, mcfg, efx, train=True)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lf), rtol=1e-3, atol=1e-4)

    labels = jnp.asarray(rng.integers(0, 8, (4,)).astype(np.int32))
    batch = {"images": x, "labels": labels}
    cx = TrainConfig(model=mcfg, execution=exla, data=DataConfig(batch_size=4))
    cf = TrainConfig(model=mcfg, execution=efx, data=DataConfig(batch_size=4))
    gx = jax.grad(lambda p: _loss_fn(p, batch, None, cx)[0])(params)
    gf = jax.grad(lambda p: _loss_fn(p, batch, None, cf)[0])(params)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gf)):
        scale = max(1e-3, float(np.max(np.abs(np.asarray(a)))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=2e-3, atol=5e-4
        )
