"""Profiling and roofline accounting for the Paillier device engine.

The reference has only ad-hoc wall-clock timing (examples/benchmarks.py:32-35,
examples/logistic_regression_encrypted_model.py:115-121). Production TPU
serving needs more: this module provides (a) a jax.profiler trace context
for capturing device timelines, and (b) an analytic roofline model —
limb-multiplies per operation versus the chip's integer-multiply peak — so
benchmark numbers can be judged against speed-of-light rather than only
against the CPython baseline.

Cost model (phe_tpu/ops): a Montgomery multiply over L limbs is three
schoolbook products (a*b full, two REDC halves), each L^2 partial products
with 14-bit halves — ~3 L^2 uint32 multiplies. A w-bit windowed modexp of
an e-bit exponent costs (e/w)*(w+1) + 2**w - 1 Montgomery multiplies.
"""

import contextlib
import math
import time

# Integer-multiply peak for the one chip this engine targets by default.
# TPU v5e VPU: 8x128 lanes, ~940 MHz, one u32 multiply-add per lane-cycle.
V5E_U32_MUL_PER_S = 8 * 128 * 0.94e9


def mont_mul_cost(limbs):
    """uint32 multiplies in one Montgomery multiply over `limbs` limbs."""
    return 3 * limbs * limbs


def modexp_cost(exponent_bits, limbs, window=4):
    """uint32 multiplies in one windowed Montgomery modexp."""
    n_windows = -(-exponent_bits // window)
    montmuls = n_windows * (window + 1) + (2**window - 1)
    return montmuls * mont_mul_cost(limbs)


def encrypt_cost(n_bits, limbs_nsq, window=4):
    """Cost of one fresh encryption: obfuscator r^n modexp dominates."""
    return modexp_cost(n_bits, limbs_nsq, window) + 2 * mont_mul_cost(limbs_nsq)


def decrypt_cost(n_bits, limbs_halfsq, window=4):
    """Cost of one CRT decryption: two half-width (n/2-bit) modexps."""
    return 2 * modexp_cost(n_bits // 2, limbs_halfsq, window)


def roofline(ops_per_s, cost_per_op, peak=V5E_U32_MUL_PER_S):
    """Fraction of integer-multiply speed-of-light achieved."""
    return ops_per_s * cost_per_op / peak


def report(op, ops_per_s, cost_per_op, peak=V5E_U32_MUL_PER_S):
    eff = roofline(ops_per_s, cost_per_op, peak)
    return {
        "op": op,
        "ops_per_s": round(ops_per_s, 2),
        "u32_muls_per_op": int(cost_per_op),
        "achieved_muls_per_s": round(ops_per_s * cost_per_op, 0),
        "peak_muls_per_s": peak,
        "speed_of_light_fraction": round(eff, 4),
    }


@contextlib.contextmanager
def trace(log_dir="/tmp/phe_tpu_trace"):
    """Capture a jax.profiler device trace around a block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def timed(label, sink=None):
    """Wall-clock a block; append (label, seconds) to sink if given."""
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink.append((label, dt))
