"""resnet_tpu — a TPU-native training framework with the capabilities of
the hand-rolled CUDA/cuDNN ResNet-50 trainer at als244/ResNet.

Compute path: JAX/XLA with optional fused Pallas kernels. Parallelism:
jax.sharding over a device mesh with ICI collectives (new capability; the
reference is single-GPU). See SURVEY.md for the full mapping.
"""

import os as _os

import jax as _jax


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache, on by default.

    The reference amortizes tuning cost with in-process per-layer algo
    caches (resnet_cudnn_fast.cu:1275-1303); the TPU analogue is caching
    compiled executables across processes. On this stack a cold remote
    compile of the train step costs minutes, a cache hit milliseconds
    (measured: 118s -> <1s for the same HLO). Opt out with
    RESNET_TPU_COMPILE_CACHE=0, redirect with RESNET_TPU_COMPILE_CACHE=dir.
    """
    want = _os.environ.get("RESNET_TPU_COMPILE_CACHE", "1")
    if want == "0" or _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    # CPU runs skip the auto-cache: CPU AOT results bake in the compiling
    # machine's ISA features (observed: cache entries with AMX/AVX512
    # features the local host lacks -> SIGILL risk). TPU executables are
    # target-keyed, and the minutes-long tunnel compiles are the point.
    if want == "1" and "cpu" in _os.environ.get("JAX_PLATFORMS", "").lower():
        return
    path = (
        want
        if want not in ("", "1")
        else _os.path.join(
            _os.path.expanduser("~"), ".cache", "resnet_tpu", "jax"
        )
    )
    try:
        _os.makedirs(path, exist_ok=True)
        _jax.config.update("jax_compilation_cache_dir", path)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # never let cache plumbing break training
        pass


_enable_compile_cache()

from . import analysis, config, data, models, ops, optim, parallel, train, utils  # noqa: E402

__version__ = "0.1.0"
