"""Reference-compatible convolution/pool window geometry.

The reference computes ``out = in // stride`` and centers each window at
``stride * out_pos`` with offsets ``-k//2 .. +k//2``, skipping out-of-bounds
taps (doConvolution, resnet.cu:109-157; doMaxPool, resnet.cu:433-471).

That is *not* XLA 'SAME' padding: e.g. for k=7, s=2, in=224 the reference
effectively pads (3, 2) while 'SAME' pads (2, 3), shifting every window by
one pixel. We therefore always use explicit asymmetric padding.
"""

from __future__ import annotations

from typing import Tuple


def reference_padding(in_dim: int, kernel: int, stride: int) -> Tuple[int, int]:
    """(lo, hi) explicit padding reproducing the reference's centered windows.

    out = in_dim // stride; window o spans [s*o - k//2, s*o + k//2].
    lo = k//2; hi covers the last window's right edge (may be negative,
    meaning the conv crops — XLA supports negative padding).
    """
    if in_dim % stride != 0:
        raise ValueError(
            f"reference conv geometry requires stride | in_dim, got {in_dim}/{stride}"
        )
    out = in_dim // stride
    half = kernel // 2
    lo = half
    hi = stride * (out - 1) + half - (in_dim - 1)
    return lo, hi


def out_dim(in_dim: int, stride: int) -> int:
    return in_dim // stride
