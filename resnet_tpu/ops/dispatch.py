"""Engine dispatch: XLA ops vs Pallas kernels.

The reference's 'variant' axis picks hand-rolled kernels vs cuDNN with the
same call signatures (the prepareAndDo* layer, resnet.cu:1384-1509 vs
resnet_cudnn.cu). Here ExecutionConfig.kernels selects the engine behind a
single call site; layouts are adapted at the boundary (Pallas kernels
operate on (rows, channels) 2-D views — NHWC reshapes for free, NCHW pays a
transpose, which is one reason NHWC is the default layout on TPU: channels
map onto the 128-wide lane dimension).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .batchnorm import batch_norm
from .linear import linear
from .activation import relu as _relu_xla


def _to2d(x, layout):
    if layout == "NHWC":
        return x.reshape(-1, x.shape[-1]), None
    # NCHW -> (N*H*W, C)
    xt = jnp.moveaxis(x, 1, -1)
    return xt.reshape(-1, xt.shape[-1]), x.shape


def _from2d(y2, layout, orig_shape, nhwc_shape):
    if layout == "NHWC":
        return y2.reshape(nhwc_shape)
    n, c, h, w = orig_shape
    return jnp.moveaxis(y2.reshape(n, h, w, c), -1, 1)


def bn_act(
    x: jax.Array,
    gamma: jax.Array,
    beta: jax.Array,
    *,
    eps: float,
    layout: str,
    relu: bool,
    relu_cap: Optional[float] = None,
    engine: str = "xla",
    interpret: bool = False,
    mean: Optional[jax.Array] = None,
    var: Optional[jax.Array] = None,
) -> Tuple[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Fused BN(+ReLU). Returns (y, (mean, var)).

    Pallas engine covers the training path (batch stats); eval mode
    (explicit mean/var) always goes through the XLA path.
    """
    if engine == "pallas" and mean is None and var is None and layout == "NHWC":
        # hybrid: one-read Pallas moments kernel for the statistics (the
        # measured bottleneck — XLA spends ~19ms/step re-reading
        # activations for mean and E[x^2]); normalize+ReLU stays in jnp so
        # XLA fuses it into neighboring ops for free.
        from ..kernels.bn import moments

        x2, orig = _to2d(x, layout)
        m, v = moments(x2, interpret)
        y, stats = batch_norm(
            x, gamma, beta, eps=eps, layout=layout, mean=m, var=v
        )
        if relu:
            y = _relu_xla(y)
            if relu_cap is not None:
                y = jnp.minimum(y, jnp.asarray(relu_cap, y.dtype))
        return y, stats
    y, stats = batch_norm(x, gamma, beta, eps=eps, layout=layout, mean=mean, var=var)
    if relu:
        y = _relu_xla(y)
        if relu_cap is not None:
            y = jnp.minimum(y, jnp.asarray(relu_cap, y.dtype))
    return y, stats


def residual_join(a: jax.Array, b: jax.Array, *, engine: str = "xla",
                  relu_cap: Optional[float] = None,
                  interpret: bool = False) -> jax.Array:
    """relu(a + b) — the residual join (resnet.cu:1717-1723)."""
    if engine == "pallas" and relu_cap is None:
        from ..kernels import add_relu

        return add_relu(a, b, interpret)
    y = _relu_xla(a + b)
    if relu_cap is not None:
        y = jnp.minimum(y, jnp.asarray(relu_cap, y.dtype))
    return y


def conv(x, w, *, stride: int = 1, layout: str = "NHWC",
         engine: str = "xla", precision: str = "highest",
         interpret: bool = False):
    """Convolution with engine selection (XLA autotuned vs Pallas
    implicit-GEMM). Pallas path is NHWC-only; NCHW adapts at the boundary."""
    if engine == "pallas":
        from ..kernels.conv import conv2d_pallas

        if layout == "NCHW":
            xh = jnp.moveaxis(x, 1, -1)
            y = conv2d_pallas(xh, w.astype(x.dtype), stride, None, interpret)
            return jnp.moveaxis(y, -1, 1)
        return conv2d_pallas(x, w.astype(x.dtype), stride, None, interpret)
    from .conv import conv2d

    return conv2d(x, w, stride=stride, layout=layout, precision=precision)


def fc(x, w, b=None, *, engine: str = "xla", precision: str = "highest",
       interpret: bool = False):
    """Final fully-connected layer (resnet.cu:1759)."""
    if engine == "pallas":
        from ..kernels import matmul

        y = matmul(x, w.astype(x.dtype), interpret)
        if b is not None:
            y = y + b.astype(y.dtype)
        return y
    return linear(x, w, b, precision=precision)
