from .dump import dump_activations, load_activation_dump
from .analyze import (
    activation_ranges,
    crosscheck_dump,
    scan_divergence,
    tensor_ranges,
)

__all__ = [
    "dump_activations",
    "load_activation_dump",
    "activation_ranges",
    "crosscheck_dump",
    "scan_divergence",
    "tensor_ranges",
]
