"""Golden-activation regression gate (regression only — the *adversarial*
fidelity gate is tests/test_reference_numpy.py, which compares against an
independent numpy transliteration of the reference kernels and would catch
an error this file would freeze in).

The committed golden file snapshots the verified fp32 forward of the tiny
model (seed 1234, fixed input); any future change to init, window geometry,
BN semantics, or layer wiring that shifts numerics fails this test.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from resnet_tpu.config import ExecutionConfig, tiny_model_config
from resnet_tpu.models import forward, init_params

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_forward_golden.npz")


def test_forward_matches_golden():
    with np.load(GOLDEN) as g:
        golden = {k: g[k] for k in g.files}
    mcfg = tiny_model_config()
    params = init_params(jax.random.PRNGKey(1234), mcfg)
    x = jnp.asarray(golden["input"])
    logits, aux = forward(
        params, x, mcfg, ExecutionConfig(), train=True, capture=True
    )
    np.testing.assert_allclose(
        np.asarray(logits), golden["logits"], rtol=1e-5, atol=1e-5
    )
    flat = {}

    def walk(d, pre=""):
        for k, v in d.items():
            if isinstance(v, dict):
                walk(v, pre + k + "/")
            else:
                flat["act/" + pre + k] = np.asarray(v)

    walk(aux["activations"])
    assert set(flat) == {k for k in golden if k.startswith("act/")}
    for k, v in flat.items():
        np.testing.assert_allclose(
            v, golden[k], rtol=1e-4, atol=1e-4, err_msg=k
        )
