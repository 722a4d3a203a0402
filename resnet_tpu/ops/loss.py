"""Cross-entropy loss with the reference's gradient convention.

The reference's backward starts from grad_logits = softmax - onehot summed
over the batch — the batch-averaging kernel exists but is deliberately
disabled (averageDerivOverBatchSize declared at resnet.cu:583, commented out
of use at resnet.cu:1806-1811). d/dlogits of sum_i(-log softmax_i[label_i])
is exactly that, so reduction='sum' reproduces the reference training
dynamics; 'mean' is the conventional choice.

Loss *reporting* in the reference is the batch-average of -log p[label]
(resnet.cu:3360-3380), independent of the gradient scaling.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .softmax import log_softmax


def cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    *,
    reduction: str = "sum",
    label_smoothing: float = 0.0,
) -> jax.Array:
    logp = log_softmax(logits.astype(jnp.float32))
    nll = -jnp.take_along_axis(logp, labels[:, None].astype(jnp.int32), axis=1)[:, 0]
    if label_smoothing:
        # smoothed CE = (1-a)*nll + a*mean_k(-logp_k)  (new vs reference;
        # part of the standard ImageNet recipe)
        a = jnp.float32(label_smoothing)
        nll = (1 - a) * nll - a * jnp.mean(logp, axis=-1)
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    if reduction == "none":
        return nll
    raise ValueError(f"unknown reduction {reduction!r}")


def top1_accuracy(
    logits: jax.Array, labels: jax.Array, mean: bool = True
) -> jax.Array:
    """mean=False returns the correct-prediction COUNT (fp32) so callers
    accumulating over microbatches can divide by the full batch once."""
    hits = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
    return jnp.mean(hits) if mean else jnp.sum(hits)


def topk_accuracy(logits: jax.Array, labels: jax.Array, k: int = 5) -> jax.Array:
    """Top-k accuracy (new vs the reference, which reports top-1 only;
    standard for ImageNet eval)."""
    _, topk = jax.lax.top_k(logits, k)
    hit = jnp.any(topk == labels[:, None], axis=-1)
    return jnp.mean(hit.astype(jnp.float32))
