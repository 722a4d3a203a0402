"""Analysis-layer tests: activation dump round-trip, numpy cross-checks
(the analyze_trainer_dump.ipynb fidelity gate), divergence scan, input
inspection."""

import numpy as np
import pytest

import jax

from resnet_tpu.analysis import (
    activation_ranges,
    crosscheck_dump,
    dump_activations,
    load_activation_dump,
    scan_divergence,
)
from resnet_tpu.analysis.inspect_input import save_batch_grid, unnormalize
from resnet_tpu.config import ExecutionConfig, tiny_model_config
from resnet_tpu.models import init_params


@pytest.fixture(scope="module")
def dumped(tmp_path_factory):
    rng = np.random.default_rng(0)
    mcfg = tiny_model_config()
    params = init_params(jax.random.PRNGKey(0), mcfg)
    images = rng.normal(0, 50, (2, 16, 16, 3)).astype(np.float32)
    labels = rng.integers(0, 8, (2,)).astype(np.int32)
    d = str(tmp_path_factory.mktemp("dump"))
    tape = dump_activations(d, params, images, mcfg, ExecutionConfig())
    return d, params, tape, labels


def test_dump_roundtrip(dumped):
    d, params, tape, _ = dumped
    loaded = load_activation_dump(d)
    assert set(loaded) == set(tape)
    for k in tape:
        np.testing.assert_allclose(
            loaded[k], np.asarray(tape[k], dtype=np.float32), rtol=1e-6, atol=1e-6
        )
    # reference schema keys present (Activations struct, resnet.h:99-152)
    assert "init_conv_applied" in loaded
    assert "final_avg_pool" in loaded
    assert "linear_output" in loaded
    assert any(k.startswith("block_00/") for k in loaded)
    assert "block_00/post_reduced" in loaded
    assert "block_00/output_activated" in loaded


def test_activation_spatial_schema(dumped):
    """Spatial dims follow the reference progression (16 -> 8 -> 4 -> ...)."""
    d, *_ = dumped
    loaded = load_activation_dump(d)
    assert loaded["init_conv_applied"].shape[1] == 8  # 16/2 stem stride
    assert loaded["init_convblock_input"].shape[1] == 4  # maxpool /2


def test_crosscheck(dumped):
    d, params, _, labels = dumped
    errs = crosscheck_dump(d, np.asarray(params["fc"]["w"]), labels)
    assert errs["fc_forward"] < 1e-4
    assert errs["softmax"] < 1e-5
    assert errs["global_avg_pool"] < 1e-4


def test_crosscheck_gradient_values(dumped):
    """Value-level gradient fidelity (notebook cells 51-53): the autodiff
    FC-weight and avg-pool gradients must equal the numpy recomputation
    dW = pool^T (softmax - onehot), dpool = dlogits W^T."""
    import jax.numpy as jnp
    from resnet_tpu.ops import cross_entropy

    d, params, tape, labels = dumped
    pool = load_activation_dump(d)["final_avg_pool"]

    # autodiff grads of the summed CE wrt fc weights and wrt the pooled
    # features (exactly what the reference dumps as gradients/ and
    # activation-derivs)
    w = params["fc"]["w"]
    lbl = jnp.asarray(labels)

    def head_loss(w_, pool_):
        logits = pool_ @ w_
        return cross_entropy(logits, lbl, reduction="sum")

    gw, gpool = jax.grad(head_loss, argnums=(0, 1))(w, jnp.asarray(pool))
    errs = crosscheck_dump(
        d, np.asarray(w), labels,
        fc_grad=np.asarray(gw), pool_grad=np.asarray(gpool),
    )
    assert errs["fc_grad"] < 1e-4
    assert errs["avgpool_grad"] < 1e-4

    # adversarial: a corrupted gradient (sign flip) must FAIL the gate
    with pytest.raises(AssertionError):
        crosscheck_dump(
            d, np.asarray(w), labels,
            fc_grad=-np.asarray(gw), pool_grad=np.asarray(gpool),
        )

    # absent dumped gradients are reported as skipped, never as ok — the
    # value comparison is the only gradient path
    errs_nograd = crosscheck_dump(d, np.asarray(w), labels)
    assert "fc_grad" not in errs_nograd
    assert errs_nograd["fc_grad_skipped"] == 1.0
    assert errs_nograd["avgpool_grad_skipped"] == 1.0


def test_ranges_and_divergence(dumped, tmp_path):
    d, *_ = dumped
    rows = activation_ranges(d)
    assert all(np.isfinite(r[3]) for r in rows)
    assert scan_divergence([d], threshold=1e6) == []
    # inject a blown-up dump
    import json, os, shutil

    bad = str(tmp_path / "bad")
    shutil.copytree(d, bad)
    arr = np.full((4,), 1e9, np.float32)
    arr.tofile(os.path.join(bad, "boom.buffer"))
    with open(os.path.join(bad, "manifest.json")) as f:
        m = json.load(f)
    m["boom"] = {"file": "boom.buffer", "shape": [4], "dtype": "float32"}
    with open(os.path.join(bad, "manifest.json"), "w") as f:
        json.dump(m, f)
    hits = scan_divergence([d, bad], threshold=1e6)
    assert len(hits) == 1 and hits[0][1] == "boom"


def test_inspect_input(tmp_path, rng):
    images = rng.normal(0, 50, (4, 8, 8, 3)).astype(np.float32)
    u = unnormalize(images)
    assert u.dtype == np.uint8 and u.shape == (4, 8, 8, 3)
    out = save_batch_grid(
        images, np.arange(4), out_path=str(tmp_path / "grid.png")
    )
    import os

    assert os.path.getsize(out) > 0


def test_compare_dumps_tool(dumped, tmp_path):
    import subprocess
    import sys

    d, params, tape, _ = dumped
    # identical dumps compare clean
    r = subprocess.run(
        [sys.executable, "tools/compare_dumps.py", d, d],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stdout + r.stderr
    assert "0 failed" in r.stdout

    # perturbed dump fails
    import json, os, shutil
    bad = str(tmp_path / "bad")
    shutil.copytree(d, bad)
    with open(os.path.join(bad, "manifest.json")) as f:
        m = json.load(f)
    name = "final_avg_pool"
    arr = np.fromfile(os.path.join(bad, m[name]["file"]), np.float32)
    (arr + 1.0).tofile(os.path.join(bad, m[name]["file"]))
    r = subprocess.run(
        [sys.executable, "tools/compare_dumps.py", d, bad],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert r.returncode == 1
    assert "FAIL" in r.stdout


def test_analyze_cli(dumped, capsys):
    """The analyze CLI (analyze_trainer_dump.ipynb replacement)."""
    from resnet_tpu.analysis.analyze import main

    d, *_ = dumped
    main([d, "--threshold", "1e6"])
    out = capsys.readouterr().out
    assert "final_avg_pool" in out and "absmax" in out
    assert "DIVERGENCE" not in out
