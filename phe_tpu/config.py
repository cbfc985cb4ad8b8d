"""Runtime configuration knobs for the device engine.

The reference's knobs are import-time feature flags and size thresholds
(phe/util.py:21-36); here configuration is about the JAX runtime. The one
default everyone wants: a persistent XLA compilation cache, so short-lived
processes (the CLI, one-shot scripts) don't re-pay device compilation for
the handful of key-geometry-keyed programs the engine uses.
"""

import os

import jax

_CACHE_ENABLED = False


def enable_persistent_cache(path=None):
    """Point JAX's persistent compilation cache at a phe_tpu cache dir."""
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    if path is None:
        path = os.environ.get(
            "PHE_TPU_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache", "phe_tpu", "xla"
            ),
        )
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _CACHE_ENABLED = True
    except Exception:  # pragma: no cover - best-effort, never fatal
        pass
