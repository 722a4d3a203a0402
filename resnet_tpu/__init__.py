"""resnet_tpu — a TPU-native training framework with the capabilities of
the hand-rolled CUDA/cuDNN ResNet-50 trainer at als244/ResNet.

Compute path: JAX/XLA with optional fused Pallas kernels. Parallelism:
jax.sharding over a device mesh with ICI collectives (new capability; the
reference is single-GPU). See SURVEY.md for the full mapping.
"""

import os as _os

import jax as _jax

__version__ = "0.1.0"


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
    # The auto-cache is only for non-CPU backends: CPU AOT results bake in
    # the compiling machine's ISA features (observed: cache entries with
    # AMX/AVX512 features the local host lacks -> SIGILL risk). TPU
    # executables are target-keyed, and the minutes-long tunnel compiles
    # are the point. Resolving the backend at import time is side-effectful,
    # so the decision is made from cheap signals: an explicitly configured
    # non-CPU platform (env var or the sitecustomize-set jax_platforms), or
    # TPU hardware evidence (libtpu installed / an accel device node) — the
    # normal Cloud TPU VM case, where nothing sets JAX_PLATFORMS. A host
    # with neither signal (CPU-only dev box) skips the cache — safe, merely
    # unaccelerated. Opt in explicitly with RESNET_TPU_COMPILE_CACHE=<dir>
    # to force a cache anywhere.
    if want == "1":
        platforms = (
            _os.environ.get("JAX_PLATFORMS", "")
            or (_jax.config.jax_platforms or "")
        ).lower()
        configured = [p for p in platforms.split(",") if p]
        non_cpu = [p for p in configured if p != "cpu"]
        if configured and not non_cpu:
            # explicit all-CPU configuration (e.g. JAX_PLATFORMS=cpu):
            # honor it — no cache, even on a host with TPU hardware
            # signals (the CPU-AOT ISA exclusion applies)
            return
        if not non_cpu:
            import glob as _glob
            import importlib.util as _ilu

            has_tpu = bool(
                _ilu.find_spec("libtpu")
                or _glob.glob("/dev/accel*")
                or _glob.glob("/dev/vfio/*")
            )
            if not has_tpu:
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

from . import analysis, config, data, export, models, ops, optim, parallel, train, utils  # noqa: E402
