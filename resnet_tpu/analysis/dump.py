"""Activation dumps — the fidelity-harness data channel.

The reference's dump_trainer writes every forward activation and BN cache
as raw float32 .buffer files (resnet.cu:2350-2679) which the analysis
notebook reloads for numpy cross-checks (analyze_trainer_dump.ipynb).
Here forward(capture=True) produces a tape keyed after the reference's
Activations struct fields (resnet.h:99-152); this module serializes it in
the same raw-buffer style with a manifest, so reference dumps and our dumps
are directly comparable tensor-by-tensor (SURVEY.md section 4, fidelity
gate: fp32 batch-1 forward).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict

import jax
import numpy as np


def _flatten_tape(tape: Dict[str, Any], prefix: str = "") -> Dict[str, np.ndarray]:
    flat: Dict[str, np.ndarray] = {}
    for k, v in tape.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            flat.update(_flatten_tape(v, prefix=name + "/"))
        else:
            flat[name] = np.asarray(jax.device_get(v))
    return flat


def dump_activations(
    out_dir: str,
    params,
    images,
    mcfg,
    ecfg=None,
    *,
    bn_state=None,
    train: bool = True,
) -> Dict[str, np.ndarray]:
    """Run a captured forward pass and dump every intermediate tensor.

    Writes <out_dir>/<name>.buffer (raw float32, reference style) plus
    manifest.json with shapes/dtypes. Returns the in-memory tape.
    """
    from ..models import forward

    logits, aux = forward(
        params, images, mcfg, ecfg, train=train, bn_state=bn_state, capture=True
    )
    tape = _flatten_tape(aux["activations"])
    tape["logits"] = np.asarray(jax.device_get(logits))

    os.makedirs(out_dir, exist_ok=True)
    manifest = {}
    for name, arr in tape.items():
        fname = name.replace("/", "__") + ".buffer"
        arr.astype(np.float32).tofile(os.path.join(out_dir, fname))
        manifest[name] = {"file": fname, "shape": list(arr.shape), "dtype": "float32"}
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)
    return tape


def load_activation_dump(dump_dir: str) -> Dict[str, np.ndarray]:
    with open(os.path.join(dump_dir, "manifest.json")) as f:
        manifest = json.load(f)
    out = {}
    for name, meta in manifest.items():
        arr = np.fromfile(os.path.join(dump_dir, meta["file"]), dtype=np.float32)
        out[name] = arr.reshape(meta["shape"])
    return out
