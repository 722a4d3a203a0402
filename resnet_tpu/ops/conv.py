"""2-D convolution on the MXU via XLA.

Replaces the reference's direct conv kernels (doConvolution resnet.cu:109,
convolutionDerivInput resnet.cu:166, convolutionDerivWeights resnet.cu:227)
and its cuDNN wrappers (resnet_cudnn_fast.cu:1248-1521). On TPU the
convolution lowers to implicit GEMM on the systolic array; XLA autotunes the
algorithm, playing the role of the reference's cudnnFind* machinery
(resnet_cudnn_fast.cu:1275-1303). Backward (data + filter) comes from
autodiff of lax.conv_general_dilated, including the reference's 'toAdd'
gradient accumulation at residual joins (resnet_cudnn.cu:1531-1536), which
autodiff expresses as '+' in the cotangent graph.

Weights are stored HWIO regardless of activation layout; the reference's
per-call NCHW<->NHWC filter transforms (resnet_cudnn.cu:1528,1593) have no
equivalent — XLA handles layout at compile time.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .padding import reference_padding

_DIM_NUMBERS = {
    "NHWC": ("NHWC", "HWIO", "NHWC"),
    "NCHW": ("NCHW", "HWIO", "NCHW"),
}

_PRECISION = {
    "default": lax.Precision.DEFAULT,
    "high": lax.Precision.HIGH,
    "highest": lax.Precision.HIGHEST,
}

# Strided-1x1 subsample+dot route: measured SLOWER than XLA's strided
# conv lowering in-step (2490 vs 2586 img/s at b256 bf16 on v5e — the
# subsample slice plus its interior-pad transpose in backward cost more
# than the conv path saves), so OFF by default; kept env-gated with a
# parity test as a documented negative result.
import os as _os

_S2_DOT = _os.environ.get("RESNET_TPU_1X1S2_DOT", "0") == "1"


def spatial_dims(layout: str) -> Tuple[int, int]:
    return (1, 2) if layout == "NHWC" else (2, 3)


def channel_dim(layout: str) -> int:
    return 3 if layout == "NHWC" else 1


def conv2d(
    x: jax.Array,
    w: jax.Array,
    *,
    stride: int = 1,
    layout: str = "NHWC",
    padding: Optional[Tuple[Tuple[int, int], Tuple[int, int]]] = None,
    precision: str = "highest",
    groups: int = 1,
) -> jax.Array:
    """Convolution with reference-centered windows by default.

    x: (N,H,W,C) or (N,C,H,W); w: (kh,kw,in/groups,out) HWIO.
    groups > 1 = grouped convolution (ResNeXt).
    """
    kh, kw = w.shape[0], w.shape[1]
    hdim, wdim = spatial_dims(layout)
    if (
        kh == 1 and kw == 1 and padding is None and groups == 1
        and (stride == 1 or _S2_DOT)
    ):
        # 1x1 conv IS a matmul over (N*H*W, Cin) — route it straight to the
        # MXU as dot. ResNet-50's FLOPs are dominated by 1x1 reduce/expand
        # convs (32 of 53 per step); measured ~10x faster than this
        # XLA stack's conv lowering for the same shape. Stride-2 (the
        # standard-topology projection shortcuts) subsamples first: a 1x1
        # window never overlaps, so conv(x, w, s) == dot(x[::s, ::s], w)
        # exactly (reference_padding is 0 for k=1), and the backward is a
        # dot VJP plus a cheap interior-pad scatter instead of an
        # input-dilated gradient conv.
        if stride > 1:
            if (x.shape[hdim] % stride) or (x.shape[wdim] % stride):
                raise ValueError(
                    "reference conv geometry requires stride | in_dim, got "
                    f"{x.shape[hdim]}x{x.shape[wdim]}/{stride}"
                )
            if layout == "NHWC":
                x = x[:, ::stride, ::stride, :]
            else:
                x = x[:, :, ::stride, ::stride]
        wk = w.reshape(w.shape[2], w.shape[3]).astype(x.dtype)
        if layout == "NHWC":
            n, h, ww, c = x.shape
            y = jnp.dot(
                x.reshape(-1, c), wk, precision=_PRECISION[precision]
            )
            return y.reshape(n, h, ww, -1)
        n, c, h, ww = x.shape
        xh = jnp.moveaxis(x, 1, -1).reshape(-1, c)
        y = jnp.dot(xh, wk, precision=_PRECISION[precision])
        return jnp.moveaxis(y.reshape(n, h, ww, -1), -1, 1)
    if padding is None:
        padding = (
            reference_padding(x.shape[hdim], kh, stride),
            reference_padding(x.shape[wdim], kw, stride),
        )
    return lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(stride, stride),
        padding=padding,
        dimension_numbers=_DIM_NUMBERS[layout],
        feature_group_count=groups,
        precision=_PRECISION[precision],
    )
