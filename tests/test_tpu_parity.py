"""Compiled-Mosaic parity suite (@pytest.mark.tpu).

The regular CI suite runs every Pallas kernel in interpret mode on CPU;
this file re-runs the same parity assertions through the COMPILED Mosaic
path so the claims hold on real hardware, re-verifiable by anyone with a
chip (round-2 verdict: "compiled-Mosaic paths are untested by CI").

Run with a real TPU visible:

    RESNET_TPU_TEST_PLATFORM=tpu python -m pytest tests/test_tpu_parity.py -m tpu
    # over the axon tunnel: RESNET_TPU_TEST_PLATFORM=axon,cpu

Skipped automatically everywhere else (conftest pins tests to CPU by
default).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = [
    pytest.mark.tpu,
    pytest.mark.skipif(
        jax.devices()[0].platform != "tpu",
        reason="needs a real TPU (set RESNET_TPU_TEST_PLATFORM)",
    ),
]


@pytest.fixture(scope="module")
def rng_m():
    return np.random.default_rng(7)


def _nhwc(rng, b, h, c, scale=1.0):
    return jnp.asarray(rng.normal(0, scale, (b, h, h, c)).astype(np.float32))


def test_matmul_compiled_parity(rng_m):
    from resnet_tpu.kernels.matmul import matmul

    a = jnp.asarray(rng_m.normal(0, 1, (256, 384)).astype(np.float32))
    b = jnp.asarray(rng_m.normal(0, 1, (384, 512)).astype(np.float32))
    got = jax.jit(functools.partial(matmul, interpret=False))(a, b)
    want = a @ b
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)

    # backward through the custom VJP, compiled
    ct = jnp.asarray(rng_m.normal(0, 1, (256, 512)).astype(np.float32))
    ga = jax.jit(
        jax.grad(lambda a_: jnp.vdot(matmul(a_, b, interpret=False), ct))
    )(a)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ct @ b.T), rtol=1e-4, atol=1e-3)


def test_moments_compiled_parity(rng_m):
    from resnet_tpu.kernels.bn import moments

    x = jnp.asarray(rng_m.normal(3, 5, (4096, 192)).astype(np.float32))
    mean, var = jax.jit(functools.partial(moments, interpret=False))(x)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(x.mean(0)), rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(x.var(0)), rtol=1e-4, atol=1e-3
    )


def test_fused_join_compiled_parity(rng_m):
    from resnet_tpu.kernels.fused_conv import fused_join

    c = 128
    e = _nhwc(rng_m, 8, 14, c)
    r = _nhwc(rng_m, 8, 14, c)
    sc_e = jnp.asarray(rng_m.normal(1, 0.2, (c,)).astype(np.float32))
    sh_e = jnp.asarray(rng_m.normal(0, 0.2, (c,)).astype(np.float32))
    sc_r = jnp.asarray(rng_m.normal(1, 0.2, (c,)).astype(np.float32))
    sh_r = jnp.asarray(rng_m.normal(0, 0.2, (c,)).astype(np.float32))
    cap = 10.0
    got = jax.jit(
        lambda *a: fused_join(*a, False, cap)
    )(e, sc_e, sh_e, r, sc_r, sh_r)
    want = jnp.clip(
        e.astype(jnp.float32) * sc_e + sh_e + r.astype(jnp.float32) * sc_r + sh_r,
        0.0,
        cap,
    ).astype(e.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize(
    "hw,cin,cout,k,stride,prologue,relu",
    [
        (14, 128, 128, 1, 1, False, False),   # bare 1x1
        (14, 128, 256, 1, 1, True, True),     # 1x1 with BN prologue + ReLU
        (14, 128, 128, 3, 1, True, True),     # 3x3 s1
        (14, 128, 128, 3, 2, True, True),     # 3x3 s2: phase-plane path
        (14, 128, 256, 1, 2, False, False),   # 1x1 s2 (standard projection)
    ],
)
def test_fused_conv_compiled_parity(rng_m, hw, cin, cout, k, stride, prologue, relu):
    """Compiled fused conv (epilogue stats + optional affine prologue)
    against the plain-XLA realization of the same contract."""
    from resnet_tpu.kernels.fused_conv import conv_chain_xla, fused_conv

    x = _nhwc(rng_m, 8, hw, cin)
    w = jnp.asarray(
        rng_m.normal(0, 0.05, (k, k, cin, cout)).astype(np.float32)
    )
    scale = jnp.asarray(rng_m.normal(1, 0.2, (cin,)).astype(np.float32))
    shift = jnp.asarray(rng_m.normal(0, 0.2, (cin,)).astype(np.float32))
    cap = 10.0 if relu else None

    got_y, got_sums = jax.jit(
        lambda x_, w_, sc, sh: fused_conv(
            x_, w_, sc, sh, stride, None, prologue, relu, False, cap
        )
    )(x, w, scale, shift)
    want_y, want_sums = jax.jit(
        lambda x_, w_, sc, sh: conv_chain_xla(
            x_, w_, sc, sh, stride, prologue, relu, cap, "highest"
        )
    )(x, w, scale, shift)
    np.testing.assert_allclose(
        np.asarray(got_y), np.asarray(want_y), rtol=1e-4, atol=1e-3
    )
    for g, wnt in zip(got_sums, want_sums):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wnt), rtol=1e-4, atol=1e-2
        )


def test_block_fused_compiled_parity(rng_m):
    """Compiled whole-block kernel (emit_pipeline staged DMA) vs its jnp
    mirror — values, intermediates, and statistics."""
    from resnet_tpu.kernels.block_fused import (
        _block_fused_fwd_jnp,
        _block_fused_fwd_raw,
    )

    n, h, w, c4, c = 8, 14, 14, 1024, 256
    dt = jnp.bfloat16
    x = jnp.asarray(np.maximum(rng_m.normal(0, 1, (n, h, w, c4)), 0)).astype(dt)
    w1 = jnp.asarray(rng_m.normal(0, 0.05, (c4, c))).astype(dt)
    w2 = jnp.asarray(rng_m.normal(0, 0.05, (3, 3, c, c))).astype(dt)
    w3 = jnp.asarray(rng_m.normal(0, 0.05, (c, c4))).astype(dt)
    g1, b1 = jnp.ones((c,), jnp.float32), jnp.zeros((c,), jnp.float32)
    g2, b2 = jnp.full((c,), 1.1, jnp.float32), jnp.full((c,), 0.1, jnp.float32)
    g3, b3 = jnp.ones((c4,), jnp.float32), jnp.zeros((c4,), jnp.float32)
    from resnet_tpu.ops.conv import _PRECISION

    kw = dict(eps=1e-7, cap=10.0, prec=_PRECISION["default"])
    P = jax.jit(lambda *a: _block_fused_fwd_raw(*a, interpret=False, **kw))(
        x, w1, w2, w3, g1, b1, g2, b2, g3, b3
    )
    J = jax.jit(lambda *a: _block_fused_fwd_jnp(*a, **kw))(
        x, w1, w2, w3, g1, b1, g2, b2, g3, b3
    )
    names = ("out", "r", "s", "e", "sums_r", "sums_s", "sums_e")
    for name, a, b in zip(names, P, J):
        af = np.asarray(a, np.float32)
        bf = np.asarray(b, np.float32)
        scale = max(1.0, np.abs(bf).max())
        np.testing.assert_allclose(
            af / scale, bf / scale, rtol=0, atol=2e-2, err_msg=name
        )


def test_fused_model_forward_compiled(rng_m):
    """Whole-model fused forward, compiled Mosaic kernels, vs the XLA
    engine — the tiny topology with TPU-tile-friendly widths."""
    from resnet_tpu.config import ExecutionConfig, tiny_model_config
    from resnet_tpu.models import forward, init_params

    mcfg = tiny_model_config(init_filters=32, input_dim=32)
    params = init_params(jax.random.PRNGKey(0), mcfg)
    x = _nhwc(rng_m, 8, 32, 3, scale=50.0)
    exla = ExecutionConfig(kernels="xla")
    efus = ExecutionConfig(kernels="fused", pallas_interpret=False)
    lx, ax = jax.jit(
        lambda p, x_: forward(p, x_, mcfg, exla, train=True)
    )(params, x)
    lf, af = jax.jit(
        lambda p, x_: forward(p, x_, mcfg, efus, train=True)
    )(params, x)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lf), rtol=1e-3, atol=1e-3)
    mx, vx = ax["bn_stats"]["init_bn"]
    mf, vf = af["bn_stats"]["init_bn"]
    np.testing.assert_allclose(np.asarray(mx), np.asarray(mf), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(vx), np.asarray(vf), rtol=1e-2, atol=1e-2)


def test_int8_quantized_forward_on_chip(rng_m):
    """The W8A8 path's int8 convs (int32 MXU accumulation) produce the
    same logits compiled on TPU as the CPU test suite verifies: compare
    the on-chip quantized forward against its own fp folded model with
    the CI thresholds (quantize.py is backend-agnostic jnp/lax — this
    pins the TPU int8 lowering specifically)."""
    from resnet_tpu.config import tiny_model_config
    from resnet_tpu.models import init_bn_state, init_params
    from resnet_tpu.quantize import (
        fold_bn_inference,
        folded_forward,
        quantize_model,
        quantized_forward,
    )

    mcfg = tiny_model_config(init_filters=32, input_dim=32)
    params = init_params(jax.random.PRNGKey(1234), mcfg)
    bn_state = jax.tree.map(lambda a: a + 0.1, init_bn_state(mcfg))
    calib = _nhwc(rng_m, 8, 32, 3, scale=50.0)
    qparams, scales = quantize_model(params, bn_state, mcfg, calib)
    x = _nhwc(rng_m, 16, 32, 3, scale=50.0)
    q = np.asarray(
        jax.jit(lambda qp, xx: quantized_forward(qp, scales, xx, mcfg))(
            qparams, x
        )
    )
    fp = np.asarray(
        folded_forward(fold_bn_inference(params, bn_state, mcfg), x, mcfg)
    )
    assert np.all(np.isfinite(q))
    corr = np.corrcoef(fp.ravel(), q.ravel())[0, 1]
    assert corr > 0.98, corr
