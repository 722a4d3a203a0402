"""int8 PTQ inference tests: BN folding reproduces the eval forward
exactly, calibration covers every quantization site, and the W8A8 model
tracks the fp model closely. (New capability — the reference has no
inference path; quantize.py docstring maps the production recipe.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from resnet_tpu.config import ExecutionConfig, tiny_model_config
from resnet_tpu.models import forward, init_bn_state, init_params
from resnet_tpu.quantize import (
    calibrate,
    fold_bn_inference,
    folded_forward,
    quantize_model,
    quantize_weights,
    quantized_forward,
)


def _setup(bottleneck=True):
    mcfg = (
        tiny_model_config()
        if bottleneck
        else tiny_model_config(bottleneck=False, expansion=1)
    )
    params = init_params(jax.random.PRNGKey(1234), mcfg)
    # nontrivial running stats (fresh init is mean 0 var 1 — folding would
    # be an identity affine and the test would prove nothing)
    bn_state = jax.tree.map(
        lambda a: a + 0.15 * (1.0 + jnp.arange(a.shape[0]) % 3),
        init_bn_state(mcfg),
    )
    return mcfg, params, bn_state


def _images(rng, n, d):
    return jnp.asarray(rng.normal(0, 50, (n, d, d, 3)).astype(np.float32))


@pytest.mark.parametrize("bottleneck", [True, False])
@pytest.mark.parametrize("relu_cap", [None, 10.0])  # 'fast' variant cap
def test_bn_folding_matches_eval_forward(rng, bottleneck, relu_cap):
    mcfg, params, bn_state = _setup(bottleneck)
    x = _images(rng, 4, mcfg.input_dim)
    want, _ = forward(
        params, x, mcfg, ExecutionConfig(relu_cap=relu_cap), train=False,
        bn_state=bn_state,
    )
    iparams = fold_bn_inference(params, bn_state, mcfg)
    got = folded_forward(iparams, x, mcfg, relu_cap=relu_cap)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_calibration_covers_every_site(rng):
    mcfg, params, bn_state = _setup()
    iparams = fold_bn_inference(params, bn_state, mcfg)
    scales = calibrate(iparams, _images(rng, 4, mcfg.input_dim), mcfg)
    want = {"init", "fc"}
    for i in range(mcfg.num_blocks):
        want |= {f"b{i}.reduce", f"b{i}.spatial", f"b{i}.expand"}
        if i in (0, mcfg.block_sizes[0]):  # projection blocks
            want.add(f"b{i}.proj")
    assert set(scales) == want
    assert all(float(s) > 0 for s in scales.values())


def test_quantized_forward_tracks_fp(rng):
    mcfg, params, bn_state = _setup()
    calib = _images(rng, 8, mcfg.input_dim)
    qparams, scales = quantize_model(params, bn_state, mcfg, calib)
    x = _images(rng, 16, mcfg.input_dim)
    fp = np.asarray(
        folded_forward(fold_bn_inference(params, bn_state, mcfg), x, mcfg)
    )
    q = np.asarray(quantized_forward(qparams, scales, x, mcfg))
    assert q.shape == fp.shape and np.all(np.isfinite(q))
    # W8A8 with per-channel weights: logits track tightly enough that the
    # ranking survives
    corr = np.corrcoef(fp.ravel(), q.ravel())[0, 1]
    assert corr > 0.98, corr
    agree = np.mean(fp.argmax(-1) == q.argmax(-1))
    assert agree >= 0.75, agree


def test_weight_quantization_is_per_channel_int8():
    mcfg, params, bn_state = _setup()
    iparams = fold_bn_inference(params, bn_state, mcfg)
    qp = quantize_weights(iparams, mcfg)
    wq, ws = qp["init"]["wq"], qp["init"]["ws"]
    assert wq.dtype == jnp.int8 and ws.shape == (wq.shape[-1],)
    # each output channel actually uses the int8 range (per-channel scale)
    assert int(jnp.min(jnp.max(jnp.abs(wq), axis=(0, 1, 2)))) >= 126
    assert "b" in qp["init"]  # folded bias rides along in fp32


def test_cli_int8_evaluate(capsys):
    """--evaluate --int8 drives the quantized model end-to-end through the
    real CLI (calibration on the first eval batch, metrics printed)."""
    from resnet_tpu.train.cli import main

    main([
        "--model", "tiny", "--synthetic", "--evaluate", "--int8",
        "--eval-batches", "2", "--batch-size", "8", "--no-mesh",
        "--log-every", "0",
    ])
    out = capsys.readouterr().out
    assert "int8 eval over 2 batches" in out
    assert "loss=" in out and "top1=" in out


def test_cli_int8_export(tmp_path, capsys):
    """--export --int8 writes a servable W8A8 artifact."""
    from resnet_tpu.export import load_inference
    from resnet_tpu.train.cli import main

    art = str(tmp_path / "model_int8.stablehlo")
    main([
        "--model", "tiny", "--synthetic", "--batch-size", "8", "--no-mesh",
        "--log-every", "0", "--export", art, "--int8",
    ])
    assert "exported int8 serving artifact" in capsys.readouterr().out
    served = load_inference(art)
    logits = np.asarray(served.call(np.zeros((3, 16, 16, 3), np.float32)))
    assert logits.shape == (3, 8) and np.all(np.isfinite(logits))
