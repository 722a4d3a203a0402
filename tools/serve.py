"""Minimal inference server over an exported StableHLO artifact.

The last mile of the serving story (export.py / quantize.py): a stdlib
HTTP server that loads ONE serialized artifact — fp32/bf16 or W8A8, both
carry a symbolic batch dimension — and serves logits. No model code,
config system, or checkpoint machinery runs here; the process needs jax
and the artifact bytes, exactly the deployment contract export.py
documents. (The reference has no inference path at all; its six binaries
train only, resnet.cu:3222-3429.)

    python tools/serve.py /path/model.stablehlo --port 8000

    POST /predict   body: raw float32 NHWC tensor bytes,
                    headers: X-Shape: "4,224,224,3"
                    -> JSON {"top1": [...], "logits_shape": [...],
                             "latency_ms": ...}
    GET  /healthz   -> {"ok": true}

Batching: the artifact's symbolic batch compiles once per DISTINCT batch
size, so the server pads every request up to the next bucket size
(powers of two, capped at --max-bucket) and slices the logits back —
bounded compile count no matter what batch sizes clients send
(--no-bucketing restores exact-size compilation). Requests larger than
the cap are split into cap-size chunks. The handler is threaded
(ThreadingHTTPServer) and the compiled call is safe to invoke
concurrently — concurrent requests queue on the device, exercised by
tests/test_serve.py::test_concurrent_load.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def bucketed_call(served, x, max_bucket=64):
    """Pad the batch to the next power-of-two bucket (<= max_bucket),
    call, slice. Oversize batches are chunked at max_bucket so the server
    compiles at most log2(max_bucket)+1 programs ever."""
    n = x.shape[0]
    if n > max_bucket:
        parts = [
            bucketed_call(served, x[i:i + max_bucket], max_bucket)
            for i in range(0, n, max_bucket)
        ]
        return np.concatenate(parts, axis=0)
    b = 1
    while b < n:
        b *= 2
    # a non-power-of-two --max-bucket (e.g. 48) must not compile shapes
    # above the advertised cap: the cap itself is the largest bucket
    b = min(b, max_bucket)
    if b > n:
        x = np.concatenate(
            [x, np.zeros((b - n,) + x.shape[1:], x.dtype)], axis=0
        )
    return np.asarray(served.call(x))[:n]


def make_handler(served):
    class Handler(BaseHTTPRequestHandler):
        def _reply(self, code, obj):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"ok": True})
            else:
                self._reply(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/predict":
                self._reply(404, {"error": "unknown path"})
                return
            try:
                shape = tuple(
                    int(s) for s in self.headers["X-Shape"].split(",")
                )
                n = int(self.headers["Content-Length"])
                x = np.frombuffer(
                    self.rfile.read(n), dtype=np.float32
                ).reshape(shape)
            except Exception as e:  # malformed request, not a server bug
                self._reply(400, {"error": f"bad request: {e}"})
                return
            t0 = time.perf_counter()
            try:
                if self.server.max_bucket:
                    logits = bucketed_call(served, x, self.server.max_bucket)
                else:
                    logits = np.asarray(served.call(x))
            except Exception as e:
                # shape parsed but the artifact rejected it (wrong trailing
                # dims / rank that still reshaped) — answer, don't drop the
                # connection
                self._reply(400, {"error": f"inference failed: {e}"})
                return
            ms = (time.perf_counter() - t0) * 1000.0
            self._reply(200, {
                "top1": logits.argmax(-1).tolist(),
                "logits_shape": list(logits.shape),
                "latency_ms": round(ms, 2),
            })

        def log_message(self, *a):  # quiet; the caller owns logging
            pass

    return Handler


def serve(artifact_path: str, host: str = "127.0.0.1", port: int = 8000,
          max_bucket: int = 64):
    from resnet_tpu.export import load_inference

    served = load_inference(artifact_path)
    httpd = ThreadingHTTPServer((host, port), make_handler(served))
    httpd.max_bucket = max_bucket  # 0 = exact-size compilation
    return httpd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--max-bucket", type=int, default=64,
                    help="pad requests up to power-of-two buckets capped"
                         " here (bounded compile count); 0 disables")
    ap.add_argument("--no-bucketing", dest="max_bucket",
                    action="store_const", const=0)
    args = ap.parse_args()
    httpd = serve(args.artifact, args.host, args.port,
                  max_bucket=args.max_bucket)
    print(f"serving {args.artifact} on {args.host}:{httpd.server_address[1]}")
    httpd.serve_forever()


if __name__ == "__main__":
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    main()
