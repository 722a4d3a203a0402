"""Whole-block fused kernel (kernels='blockfused'): parity of the
interpret-mode math and the hand-written closed-form VJP against plain-jnp
autodiff, plus whole-model engine parity.

The compiled Mosaic kernel itself is covered by tests/test_tpu_parity.py
(emit_pipeline cannot run under the CPU interpreter)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from resnet_tpu.config import DataConfig, ExecutionConfig, TrainConfig, tiny_model_config
from resnet_tpu.kernels.block_fused import block_fused, bn_stats_from_sums
from resnet_tpu.models import forward, init_params
from resnet_tpu.train.step import _loss_fn

EPS, CAP = 1e-7, 10.0


def _make(rng, n=4, h=8, w=8, c4=32, c=8):
    t = lambda *s: jnp.asarray(rng.normal(0, 0.2, s).astype(np.float32))
    x = jnp.asarray(np.maximum(rng.normal(0, 1, (n, h, w, c4)), 0).astype(np.float32))
    return (
        x, t(c4, c), t(3, 3, c, c), t(c, c4),
        1 + 0.1 * t(c), 0.1 * t(c), 1 + 0.1 * t(c), 0.1 * t(c),
        1 + 0.1 * t(c4), 0.1 * t(c4),
    )


def _ref_block(x, w1, w2, w3, g1, b1, g2, b2, g3, b3):
    """Straight-line jnp bottleneck block (autodiff oracle)."""

    def bn(y, g, b):
        m = y.mean(axis=(0, 1, 2))
        v = y.var(axis=(0, 1, 2))
        return (y - m) * lax.rsqrt(v + EPS) * g + b

    cr = lambda v: jnp.clip(v, 0.0, CAP)
    r = jnp.einsum("nhwc,cd->nhwd", x, w1)
    u = cr(bn(r, g1, b1))
    s = lax.conv_general_dilated(
        u, w2, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    v = cr(bn(s, g2, b2))
    e = jnp.einsum("nhwc,cd->nhwd", v, w3)
    return cr(bn(e, g3, b3) + x), (r, s, e)


def test_forward_parity(rng):
    args = _make(rng)
    out_ref, (r_ref, *_rest) = _ref_block(*args)
    out, sr, ss, se = block_fused(*args, EPS, CAP, "highest", True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), rtol=1e-4, atol=1e-4)
    n, h, w = args[0].shape[:3]
    mr, vr = bn_stats_from_sums(sr, n * h * w)
    np.testing.assert_allclose(
        np.asarray(mr), np.asarray(r_ref.mean(axis=(0, 1, 2))), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(vr), np.asarray(r_ref.var(axis=(0, 1, 2))), rtol=1e-3, atol=1e-5
    )


def test_closed_form_vjp_matches_autodiff(rng):
    args = _make(rng)
    out_shape = args[0].shape
    ct = jnp.asarray(rng.normal(0, 1, out_shape).astype(np.float32))

    def loss_fused(*a):
        o, *_ = block_fused(*a, EPS, CAP, "highest", True)
        return jnp.vdot(o, ct)

    def loss_ref(*a):
        o, _ = _ref_block(*a)
        return jnp.vdot(o, ct)

    gf = jax.grad(loss_fused, argnums=tuple(range(10)))(*args)
    gr = jax.grad(loss_ref, argnums=tuple(range(10)))(*args)
    for i, (a, b) in enumerate(zip(gf, gr)):
        scale = max(1e-3, float(np.abs(np.asarray(b)).max()))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale,
            rtol=2e-3, atol=2e-4, err_msg=f"grad arg {i}",
        )


def test_model_engine_parity(rng):
    """kernels='blockfused' (identity-shortcut blocks fused, the rest on
    the standard path) matches kernels='xla' — logits, stats, gradients."""
    mcfg = tiny_model_config()
    params = init_params(jax.random.PRNGKey(0), mcfg)
    x = jnp.asarray(rng.normal(0, 50, (4, 16, 16, 3)).astype(np.float32))
    exla = ExecutionConfig(kernels="xla", relu_cap=10.0)
    ebf = ExecutionConfig(kernels="blockfused", pallas_interpret=True, relu_cap=10.0)
    lx, ax = forward(params, x, mcfg, exla, train=True)
    lb, ab = forward(params, x, mcfg, ebf, train=True)
    np.testing.assert_allclose(np.asarray(lx), np.asarray(lb), rtol=1e-3, atol=1e-4)
    for bx, bb in zip(ax["bn_stats"]["blocks"], ab["bn_stats"]["blocks"]):
        assert set(bx) == set(bb)
        for k in bx:
            np.testing.assert_allclose(
                np.asarray(bx[k][0]), np.asarray(bb[k][0]), rtol=1e-3, atol=1e-3
            )
            np.testing.assert_allclose(
                np.asarray(bx[k][1]), np.asarray(bb[k][1]), rtol=1e-3, atol=1e-3
            )

    labels = jnp.asarray(rng.integers(0, 8, (4,)).astype(np.int32))
    batch = {"images": x, "labels": labels}
    cx = TrainConfig(model=mcfg, execution=exla, data=DataConfig(batch_size=4))
    cb = TrainConfig(model=mcfg, execution=ebf, data=DataConfig(batch_size=4))
    gx = jax.grad(lambda p: _loss_fn(p, batch, None, cx)[0])(params)
    gb = jax.grad(lambda p: _loss_fn(p, batch, None, cb)[0])(params)
    for a, b in zip(jax.tree.leaves(gx), jax.tree.leaves(gb)):
        scale = max(1e-3, float(np.max(np.abs(np.asarray(a)))))
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, rtol=2e-3, atol=5e-4
        )


def test_eval_uses_standard_path(rng):
    """blockfused is a train-mode engine; eval (running-stats BN) must
    route through the standard path and still work."""
    mcfg = tiny_model_config()
    params = init_params(jax.random.PRNGKey(0), mcfg)
    x = jnp.asarray(rng.normal(0, 50, (2, 16, 16, 3)).astype(np.float32))
    ebf = ExecutionConfig(kernels="blockfused", pallas_interpret=True)
    # build running stats from one train pass
    _, aux = forward(params, x, mcfg, ebf, train=True)
    bn_state = jax.tree.map(lambda t: t, {
        "init_bn": {"mean": aux["bn_stats"]["init_bn"][0],
                    "var": aux["bn_stats"]["init_bn"][1]},
        "blocks": [
            {k: {"mean": v[0], "var": v[1]} for k, v in b.items()}
            for b in aux["bn_stats"]["blocks"]
        ],
    })
    logits, _ = forward(params, x, mcfg, ebf, train=False, bn_state=bn_state)
    assert np.all(np.isfinite(np.asarray(logits)))
