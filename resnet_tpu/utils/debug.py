"""Runtime state checking — the TPU analogue of check_errors
(resnet.cu:2879-2907): scan every param/grad/m/v tensor for NaN/Inf; on a
hit the trainer dumps full state to sentinel id 99999999 and aborts.

Unlike the reference, which does a D2H copy + host scan of every tensor
every step, the scan here is one jitted device reduction returning a single
bool (cheap enough to keep on in production), with a host-side per-tensor
report only produced after a trip.
"""

from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

# gate for debug_print_tensor — the TO_PRINT compile-time flag equivalent
# (resnet.cu:27); enable with RESNET_TPU_DEBUG_PRINT=1
DEBUG_PRINT = os.environ.get("RESNET_TPU_DEBUG_PRINT", "") not in ("", "0")


def debug_print_tensor(name: str, x, n: int = 8):
    """In-graph tensor tracer (printDeviceData equivalent, resnet.cu:1511):
    prints shape, range, and the first n elements from inside jit. No-op
    unless RESNET_TPU_DEBUG_PRINT is set, so call sites can stay in code."""
    if not DEBUG_PRINT:
        return
    flat = x.reshape(-1)
    jax.debug.print(
        name + " shape={s} min={mn} max={mx} head={h}",
        s=str(x.shape),
        mn=jnp.min(flat),
        mx=jnp.max(flat),
        h=flat[: min(n, flat.shape[0])],
    )


@jax.jit
def check_state_finite(tree) -> jax.Array:
    """Single fused device scan; True iff every leaf is fully finite."""
    leaves = [l for l in jax.tree.leaves(tree) if jnp.issubdtype(jnp.asarray(l).dtype, jnp.floating)]
    if not leaves:
        return jnp.bool_(True)
    return jnp.all(
        jnp.stack([jnp.all(jnp.isfinite(l.astype(jnp.float32))) for l in leaves])
    )


def nonfinite_report(tree) -> List[str]:
    """Host-side forensic listing of offending tensors (post-mortem path)."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    bad = []
    for path, leaf in flat:
        arr = np.asarray(jax.device_get(leaf))
        if not np.issubdtype(arr.dtype, np.floating):
            continue
        n_nan = int(np.isnan(arr).sum())
        n_inf = int(np.isinf(arr).sum())
        if n_nan or n_inf:
            name = "/".join(str(getattr(p, "key", getattr(p, "idx", p))) for p in path)
            bad.append(f"{name}: {n_nan} NaN, {n_inf} Inf of {arr.size}")
    return bad
