"""Device-side batched big-integer and Montgomery arithmetic (the hot path)."""

from phe_tpu.ops import limb_math, montgomery  # noqa: F401
