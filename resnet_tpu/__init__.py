"""resnet_tpu — a TPU-native training framework with the capabilities of
the hand-rolled CUDA/cuDNN ResNet-50 trainer at als244/ResNet.

Compute path: JAX/XLA with optional fused Pallas kernels. Parallelism:
jax.sharding over a device mesh with ICI collectives (new capability; the
reference is single-GPU). See SURVEY.md for the full mapping.
"""

from . import analysis, config, data, models, ops, optim, parallel, train, utils

__version__ = "0.1.0"
