"""Pallas TPU kernels — the analogue of the reference's hand-rolled CUDA
kernel layer (resnet.cu:44-662, refined in resnet_clean.cu).

Each kernel has a jnp reference implementation it is parity-tested against
(tests/test_kernels.py ≙ the reference's in-binary testConvolution/
testMatMul harness, resnet.cu:2990-3218). The XLA path remains the default
engine; ExecutionConfig(kernels='pallas') routes these in.
"""

from .matmul import matmul
from .bn import batch_norm_act, bn_act_reference
from .fused import add_relu, bias_act
from .adam import fused_adam_flat

__all__ = [
    "matmul",
    "batch_norm_act",
    "bn_act_reference",
    "add_relu",
    "bias_act",
    "fused_adam_flat",
]
