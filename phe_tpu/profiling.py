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
  multiplies plus a similar count of aligns/adds — and both REDC
  products run as int8 constant matmuls over 7-bit digits: [2L,2L] and
  [4L,2L] against a [2L] digit column = 4L^2 + 8L^2 = 12 L^2 int8 MACs
  per element.
* **VPU fallback**: all three products schoolbook, ~3 L^2 uint32 mults.

Round-4 calibration (scripts/vpu_microbench.py): the VPU binds on
elementwise op ISSUE, not multiplier throughput — u32 mul and u32 add
both sustain ~0.65 T/s serially on v5e, while mixed Barrett-shaped
streams reach ~1.44 T op/s. Costs therefore carry both a multiply count
and a total-op estimate, each priced at its measured rate.

A w-bit windowed modexp of an e-bit exponent costs
ceil(e/w)*(w+1) + 2^w - 2 Montgomery multiplies (kernel loop shape in
pallas_modexp._pow_kernel). The per-op time lower bound takes the MAX
over units (each unit can't run faster than its own peak; overlap is
assumed perfect), so speed_of_light_fraction <= 1 by construction when
the peaks are right.
"""

import contextlib
import time

# Per-chip peaks, MEASURED where possible (round 4). The round-3 model
# assumed one u32 multiply per VPU lane-cycle (962 G/s on v5e) and
# counted only multiplies; scripts/vpu_microbench.py shows both halves
# are wrong in opposite directions on real v5e silicon:
#   * sustained serial u32 multiply issue is 0.65 T/s — and u32 ADD
#     issues at the SAME 0.65 T/s, i.e. the binding resource is
#     elementwise op ISSUE, not multiplier throughput;
#   * mixed multiply/shift/compare/select streams (the Barrett shape)
#     superscalar to ~1.4 T op/s.
# The corrected roofline therefore carries two VPU bounds — multiplies
# at the measured mul-issue rate, and TOTAL elementwise ops at the
# measured mixed-stream rate — plus the MXU MAC bound, and takes the
# max over unit times. MXU int8: vendor TOPS / 2 (a MAC is two ops).
# Non-v5e rows scale the v5e measurements by nominal VPU ratios
# (unmeasured — flagged via `assumed` when matched).
_V5E_VPU_MUL = 0.65e12  # measured, scripts/vpu_microbench.py
_V5E_VPU_OP = 1.44e12  # measured, mixed barrett-shaped stream
_CHIP_PEAKS = {
    # device_kind substring:
    #   (vpu_u32_mul_per_s, vpu_mixed_op_per_s, mxu_int8_macs_per_s)
    "v4": (_V5E_VPU_MUL * 2.2, _V5E_VPU_OP * 2.2, 275e12 / 2),
    "v5 lite": (_V5E_VPU_MUL, _V5E_VPU_OP, 394e12 / 2),
    "v5e": (_V5E_VPU_MUL, _V5E_VPU_OP, 394e12 / 2),
    "v5p": (_V5E_VPU_MUL * 3.7, _V5E_VPU_OP * 3.7, 918e12 / 2),
    "v6 lite": (_V5E_VPU_MUL * 2, _V5E_VPU_OP * 2, 1836e12 / 2),
    "v6e": (_V5E_VPU_MUL * 2, _V5E_VPU_OP * 2, 1836e12 / 2),
}
_DEFAULT_PEAKS = _CHIP_PEAKS["v5e"]
_MEASURED = ("v5 lite", "v5e")


def chip_peaks(device_kind=None):
    """((vpu_u32_mul/s, vpu_mixed_op/s, mxu_int8_mac/s), kind, assumed).

    Matches jax.devices()[0].device_kind against the table; unknown
    chips (including the CPU test platform) report v5e numbers with
    ``assumed=True``; known-but-unmeasured chips (scaled rows) also set
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
            return peaks, device_kind, key not in _MEASURED
    return _DEFAULT_PEAKS, device_kind, True


def mont_mul_cost(limbs, mxu=True):
    """Unit costs for one limb-engine Montgomery multiply.

    vpu_op (total elementwise issue) is estimated at 2x the multiply
    count for the schoolbook (align/add per product).
    """
    L2 = limbs * limbs
    if mxu:
        return {"vpu_u32_mul": L2, "vpu_op": 2 * L2, "mxu_i8_mac": 12 * L2}
    return {"vpu_u32_mul": 3 * L2, "vpu_op": 6 * L2, "mxu_i8_mac": 0}


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
# One fused tau-domain RNS Montgomery product over k channels per base
# (cpad ~ 2k + 8), counting uint32 multiplies (rns.rns_mont_mul):
#   raw product 2k; sigma 4k (2 products + steps-3 Barrett); qhat
#   combine+reduce 5(k+8); fused u~ 5(k+8); S combine 3(k+8); u_a 3k
#   => ~22k + O(1) VPU multiplies,
# plus the two base-extension int8 matmuls: 2 * [3(k+8), 2k] digit rows
# = 12 k (k+8) MACs. Total elementwise VPU issue (shifts, masks, adds,
# compares, selects alongside the multiplies, from a static count of the
# kernel body) is ~3.3x the multiply count; the mixed-stream rate in
# chip_peaks prices that bound.


def rns_mont_mul_cost(k):
    """Unit costs for one fused RNS Montgomery product."""
    mul = 22 * k + 120
    return {
        "vpu_u32_mul": mul,
        "vpu_op": int(3.3 * mul),
        "mxu_i8_mac": 12 * k * (k + 8),
    }


def rns_modexp_cost(exponent_bits, k, window):
    """Unit costs of one windowed RNS modexp (incl. entry/exit products)."""
    n_windows = -(-exponent_bits // window)
    montmuls = n_windows * (window + 1) + 2**window - 2 + 2
    return _scale(rns_mont_mul_cost(k), montmuls)


def rns_vec_modexp_cost(exponent_bits, k, window):
    """Per-element-exponent RNS modexp: the shared ladder plus the
    constant-time binary select tree ((2^w - 1) lane-selects over all
    cpad ~ 2k channels per window — pallas_rns._ladder_vec_kernel;
    round 5 replaced the one-hot sum's 2^w compare+multiply+add
    triples, which this model priced at 2 ops per multiply)."""
    n_windows = -(-exponent_bits // window)
    sel_ops = n_windows * (2**window - 1) * 2 * k
    return _add(
        rns_modexp_cost(exponent_bits, k, window),
        {"vpu_u32_mul": 0, "vpu_op": sel_ops, "mxu_i8_mac": 0},
    )


def rns_encrypt_cost(n_bits, k, window):
    """Fresh encryption on the RNS engine (obfuscator ladder dominates)."""
    return rns_modexp_cost(n_bits, k, window)


def rns_decrypt_cost(n_bits, k_half, window):
    """CRT decryption: two half-width ladders on half-size channel sets."""
    return _scale(rns_modexp_cost(n_bits // 2, k_half, window), 2)


def ideal_seconds_per_op(cost, peaks=None):
    """Roofline lower bound: each unit at its own peak, perfect overlap.

    Units: u32 multiplies at the measured mul-issue rate, total
    elementwise ops at the measured mixed-stream rate, MXU MACs at the
    vendor int8 peak. The op-issue bound is usually the binding one.
    """
    if peaks is None:
        peaks, _, _ = chip_peaks()
    vpu_mul_peak, vpu_op_peak, mxu_peak = peaks
    return max(
        cost.get("vpu_u32_mul", 0) / vpu_mul_peak,
        cost.get("vpu_op", 0) / vpu_op_peak,
        cost.get("mxu_i8_mac", 0) / mxu_peak,
    )


def report(op, ops_per_s, cost):
    """Roofline report for one measured op.

    speed_of_light_fraction = ideal_time / measured_time <= 1 by
    construction (the bound takes the max over units). The per-unit
    fractions show which engine the kernel is actually limited by.
    """
    peaks, kind, assumed = chip_peaks()
    vpu_mul_peak, vpu_op_peak, mxu_peak = peaks
    ideal = ideal_seconds_per_op(cost, peaks)
    fracs = {
        "vpu_mul_fraction": ops_per_s * cost.get("vpu_u32_mul", 0)
        / vpu_mul_peak,
        "vpu_op_fraction": ops_per_s * cost.get("vpu_op", 0) / vpu_op_peak,
        "mxu_fraction": ops_per_s * cost.get("mxu_i8_mac", 0) / mxu_peak,
    }
    return {
        "op": op,
        "ops_per_s": round(ops_per_s, 2),
        "device_kind": kind,
        "peaks_assumed": assumed,
        "vpu_u32_mul_per_op": int(cost.get("vpu_u32_mul", 0)),
        "vpu_op_per_op": int(cost.get("vpu_op", 0)),
        "mxu_i8_mac_per_op": int(cost.get("mxu_i8_mac", 0)),
        **{name: round(f, 4) for name, f in fracs.items()},
        "speed_of_light_fraction": round(ops_per_s * ideal, 4),
        "bound_by": max(fracs, key=fracs.get).replace("_fraction", ""),
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
