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

Batching note: the artifact's symbolic batch means any request batch size
compiles once per distinct size; production front-ends should pad to a
small set of bucket sizes.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


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


def serve(artifact_path: str, host: str = "127.0.0.1", port: int = 8000):
    from resnet_tpu.export import load_inference

    served = load_inference(artifact_path)
    httpd = ThreadingHTTPServer((host, port), make_handler(served))
    return httpd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("artifact")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    args = ap.parse_args()
    httpd = serve(args.artifact, args.host, args.port)
    print(f"serving {args.artifact} on {args.host}:{httpd.server_address[1]}")
    httpd.serve_forever()


if __name__ == "__main__":
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    main()
