"""Runtime configuration: every knob of the device engine, in one place.

The reference's knobs are import-time feature flags and size thresholds
(phe/util.py:21-36); here they are a frozen dataclass resolved from the
environment on each access (so tests can monkeypatch env vars), read by
exactly one module — ``grep -rn os.environ phe_tpu/`` should only hit this
file.

Knobs (all optional):
  PHE_TPU_ENGINE      rns|limb|auto   modexp engine for the hot paths.
                      auto = RNS (Cox-Rower, MXU base extensions) on TPU,
                      limb engine elsewhere.
  PHE_TPU_BACKEND     pallas|xla|auto limb-engine kernel dispatch. auto =
                      Pallas Mosaic kernels on TPU, XLA formulation
                      elsewhere; pallas forces interpret mode off-TPU.
  PHE_TPU_RNS_KERNEL  pallas|xla|auto same, for the RNS ladder kernels.
  PHE_TPU_MXU         1|0             use the int8 MXU REDC matrices
                      (limb engine) when the geometry allows.
  PHE_TPU_CACHE_DIR   path            persistent XLA compilation cache.
  PHE_TPU_NATIVE_DIR  path            build/cache dir for the native host
                      engine (phe_tpu.native).
"""

import dataclasses
import os

import jax


@dataclasses.dataclass(frozen=True)
class Config:
    """Engine configuration snapshot (see module docstring for values)."""

    engine: str = "auto"
    backend: str = "auto"
    rns_kernel: str = "auto"
    mxu: bool = True
    cache_dir: str = ""
    native_dir: str = ""


def current():
    """The configuration as of this call (env re-read: cheap, patchable)."""
    return Config(
        engine=os.environ.get("PHE_TPU_ENGINE", "auto"),
        backend=os.environ.get("PHE_TPU_BACKEND", "auto"),
        rns_kernel=os.environ.get("PHE_TPU_RNS_KERNEL", "auto"),
        mxu=os.environ.get("PHE_TPU_MXU", "1") != "0",
        cache_dir=os.environ.get(
            "PHE_TPU_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "phe_tpu", "xla"),
        ),
        native_dir=os.environ.get(
            "PHE_TPU_NATIVE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache", "phe_tpu", "native"
            ),
        ),
    )


def _auto_tpu(choice, on_name):
    """Shared auto-resolution: explicit choice wins, else TPU => on."""
    return choice == on_name or (
        choice == "auto" and jax.default_backend() == "tpu"
    )


def use_rns_engine():
    """RNS engine for the shared/per-element modexps? (PHE_TPU_ENGINE)"""
    return _auto_tpu(current().engine, "rns")


def use_pallas_backend():
    """Pallas Mosaic kernels for the limb engine? (PHE_TPU_BACKEND)"""
    return _auto_tpu(current().backend, "pallas")


def use_rns_pallas_kernel():
    """Fused Pallas ladder for the RNS engine? (PHE_TPU_RNS_KERNEL)"""
    return _auto_tpu(current().rns_kernel, "pallas")


_CACHE_ENABLED = False


def enable_persistent_cache(path=None):
    """Point JAX's persistent compilation cache at a phe_tpu cache dir.

    The one default everyone wants: short-lived processes (the CLI,
    one-shot scripts) must not re-pay device compilation for the handful
    of key-geometry-keyed programs the engine uses.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    if path is None:
        path = current().cache_dir
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        _CACHE_ENABLED = True
    except Exception:  # pragma: no cover - best-effort, never fatal
        pass
