"""Profiling and roofline accounting for the Paillier device engine.

The reference has only ad-hoc wall-clock timing (examples/benchmarks.py:32-35,
examples/logistic_regression_encrypted_model.py:115-121). Production TPU
serving needs more: this module provides (a) a jax.profiler trace context
for capturing device timelines, and (b) an analytic roofline — per-unit
work counts against per-unit peaks — so benchmark numbers are judged
against speed-of-light rather than only against the CPython baseline.

Cost model of one Montgomery multiply over L limbs (phe_tpu/ops):

* **MXU path** (the production kernel, montgomery.build_context(mxu=True)):
  the data-dependent a*b schoolbook runs on the VPU — L^2 uint32
  multiplies (plus a similar count of aligns/adds, ignored: multiply
  issue rate is the binding resource) — and both REDC products run as
  int8 constant matmuls over 7-bit digits: [2L,2L] and [4L,2L] against
  a [2L] digit column = 4L^2 + 8L^2 = 12 L^2 int8 MACs per element.
* **VPU fallback**: all three products schoolbook, ~3 L^2 uint32 mults.

A w-bit windowed modexp of an e-bit exponent costs
ceil(e/w)*(w+1) + 2^w - 2 Montgomery multiplies (kernel loop shape in
pallas_modexp._pow_kernel). The per-op time lower bound takes the MAX
over units (each unit can't run faster than its own peak; overlap is
assumed perfect), so speed_of_light_fraction <= 1 by construction when
the peaks are right.
"""

import contextlib
import time

# Per-chip peaks. VPU: lanes * cores * clock, one u32 multiply per
# lane-cycle (documented assumption; TPU VPUs issue one 32-bit integer
# multiply per lane per cycle). MXU int8: vendor TOPS / 2 (a MAC is two
# ops). Sources: public TPU spec sheets / cloud.google.com hardware pages.
_CHIP_PEAKS = {
    # device_kind substring: (vpu_u32_mul_per_s, mxu_int8_macs_per_s)
    "v4": (2 * 8 * 128 * 1.05e9, 275e12 / 2),  # no int8 path: bf16 rate
    "v5 lite": (8 * 128 * 0.94e9, 394e12 / 2),
    "v5e": (8 * 128 * 0.94e9, 394e12 / 2),
    "v5p": (2 * 8 * 128 * 1.75e9, 918e12 / 2),
    "v6 lite": (2 * 8 * 128 * 0.94e9, 1836e12 / 2),
    "v6e": (2 * 8 * 128 * 0.94e9, 1836e12 / 2),
}
_DEFAULT_PEAKS = _CHIP_PEAKS["v5e"]


def chip_peaks(device_kind=None):
    """((vpu_u32_mul_per_s, mxu_int8_macs_per_s), kind, assumed).

    Matches jax.devices()[0].device_kind against the table; unknown chips
    (including the CPU test platform) report v5e numbers with
    ``assumed=True`` so downstream reports can flag it.
    """
    if device_kind is None:
        try:
            import jax

            device_kind = jax.devices()[0].device_kind
        except Exception:
            device_kind = "unknown"
    kind = device_kind.lower()
    for key, peaks in _CHIP_PEAKS.items():
        if key in kind:
            return peaks, device_kind, False
    return _DEFAULT_PEAKS, device_kind, True


def mont_mul_cost(limbs, mxu=True):
    """{'vpu_u32_mul', 'mxu_i8_mac'} for one Montgomery multiply."""
    L2 = limbs * limbs
    if mxu:
        return {"vpu_u32_mul": L2, "mxu_i8_mac": 12 * L2}
    return {"vpu_u32_mul": 3 * L2, "mxu_i8_mac": 0}


def _scale(cost, k):
    return {unit: k * ops for unit, ops in cost.items()}


def _add(a, b):
    return {unit: a[unit] + b[unit] for unit in a}


def modexp_cost(exponent_bits, limbs, window=4, mxu=True):
    """Unit costs of one windowed Montgomery modexp."""
    n_windows = -(-exponent_bits // window)
    montmuls = n_windows * (window + 1) + 2**window - 2
    return _scale(mont_mul_cost(limbs, mxu), montmuls)


def encrypt_cost(n_bits, limbs_nsq, window=4, mxu=True):
    """One fresh encryption: the r^n obfuscator modexp plus the (n*m+1)
    prologue multiply and the final ciphertext multiply."""
    return _add(
        modexp_cost(n_bits, limbs_nsq, window, mxu),
        _scale(mont_mul_cost(limbs_nsq, mxu), 2),
    )


def decrypt_cost(n_bits, limbs_halfsq, window=4, mxu=True):
    """One CRT decryption: two half-width (n/2-bit exponent) modexps."""
    return _scale(modexp_cost(n_bits // 2, limbs_halfsq, window, mxu), 2)


# -- RNS (Cox-Rower) engine cost model (phe_tpu/ops/rns.py) ------------------
#
# One RNS Montgomery product over k channels per base (cpad ~ 2k + 8):
# counting uint32 multiplies (1 per channel product, 2 per Barrett
# reduction — the quotient estimate and q*m):
#   t 3C; sigma/tau/u_a 3k each; both digit combines 3(k+8) each;
#   qhat reduction 2(k+8); u_br 4(k+8)  =>  ~30k + O(1) VPU multiplies,
# plus the two base-extension int8 matmuls: 2 * [3(k+8), 2k] digit rows
# = 12 k (k+8) MACs.


def rns_mont_mul_cost(k):
    """{'vpu_u32_mul', 'mxu_i8_mac'} for one RNS Montgomery product."""
    return {"vpu_u32_mul": 30 * k + 120, "mxu_i8_mac": 12 * k * (k + 8)}


def rns_modexp_cost(exponent_bits, k, window):
    """Unit costs of one windowed RNS modexp (incl. entry/exit products)."""
    n_windows = -(-exponent_bits // window)
    montmuls = n_windows * (window + 1) + 2**window - 2 + 2
    return _scale(rns_mont_mul_cost(k), montmuls)


def rns_encrypt_cost(n_bits, k, window):
    """Fresh encryption on the RNS engine (obfuscator ladder dominates)."""
    return rns_modexp_cost(n_bits, k, window)


def rns_decrypt_cost(n_bits, k_half, window):
    """CRT decryption: two half-width ladders on half-size channel sets."""
    return _scale(rns_modexp_cost(n_bits // 2, k_half, window), 2)


def ideal_seconds_per_op(cost, peaks=None):
    """Roofline lower bound: each unit at its own peak, perfect overlap."""
    if peaks is None:
        peaks, _, _ = chip_peaks()
    vpu_peak, mxu_peak = peaks
    return max(
        cost.get("vpu_u32_mul", 0) / vpu_peak,
        cost.get("mxu_i8_mac", 0) / mxu_peak,
    )


def report(op, ops_per_s, cost):
    """Roofline report for one measured op.

    speed_of_light_fraction = ideal_time / measured_time <= 1 by
    construction (the bound takes the max over units). The per-unit
    fractions show which engine the kernel is actually limited by.
    """
    peaks, kind, assumed = chip_peaks()
    vpu_peak, mxu_peak = peaks
    ideal = ideal_seconds_per_op(cost, peaks)
    vpu_frac = ops_per_s * cost.get("vpu_u32_mul", 0) / vpu_peak
    mxu_frac = ops_per_s * cost.get("mxu_i8_mac", 0) / mxu_peak
    return {
        "op": op,
        "ops_per_s": round(ops_per_s, 2),
        "device_kind": kind,
        "peaks_assumed": assumed,
        "vpu_u32_mul_per_op": int(cost.get("vpu_u32_mul", 0)),
        "mxu_i8_mac_per_op": int(cost.get("mxu_i8_mac", 0)),
        "vpu_fraction": round(vpu_frac, 4),
        "mxu_fraction": round(mxu_frac, 4),
        "speed_of_light_fraction": round(ops_per_s * ideal, 4),
        "bound_by": "vpu" if vpu_frac >= mxu_frac else "mxu",
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
