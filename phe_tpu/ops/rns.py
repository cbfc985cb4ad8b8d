"""RNS Montgomery arithmetic: modexp as MXU matmuls + tiny per-channel ops.

This is the second-generation engine for the Paillier hot kernels
(obfuscation r^n mod n^2, phe/paillier.py:136-139; CRT decrypt powers,
:346-353). The first-generation engine (phe_tpu.ops.pallas_modexp) keeps
big integers as base-2^14 limb vectors and pays O(L^2) *data-dependent*
VPU multiplies per Montgomery product for the a*b schoolbook; the measured
roofline (phe_tpu.profiling) shows that path saturating the VPU's u32
multiply issue rate at ~2.8k encrypts/s — a hard ceiling well short of the
100x-gmpy2 target. This module removes the VPU bottleneck by changing the
number system instead of the schedule:

**Residue Number System.** A value x < 2kN lives as its residues modulo
~2k independent 14-bit primes (channels). Multiplication and addition are
then *elementwise per channel* — O(k) VPU work with no carries and no
cross-channel traffic. The only structural steps are the two *base
extensions* inside Montgomery reduction, and each is a matrix product
against a **constant** matrix — exactly the shape the MXU wants (the
Cox-Rower observation from hardware RSA accelerators: Kawamura et al.,
CHES 2000; base-extension algebra per Bajard et al. / Shenoy-Kumaresan).
Per Montgomery product the arithmetic is ~30 VPU lane-ops per channel
plus two int8 MXU matmuls — versus L^2 data-dependent VPU multiplies in
the limb engine.

Algorithm (one Montgomery product, modulus N, radix M_A)
========================================================
Channel sets: base A = primes a_1..a_k (product M_A), base B = b_1..b_k
(product M_B), one redundant channel m_r; all distinct primes in
(M_MIN, 2^14) with M_MIN = 4099 (see "Barrett channel reduction" — the
floor below which the fixed conditional-subtract ladders stop covering
the quotient error). That window supplies 1,335 primes, which is what
lets the engine cover the reference's default 3072-bit keysize
(n^2 = 6144-bit modulus, 913 channels) and 4096-bit keys (1,249
channels), with the encrypt ceiling near 4,380-bit keys (History below
traces the floor's two round-4 drops). Values are represented by
canonical residues in **all** channels. Requirements: M_A >= 4kN and
M_B >= 4kN; chain invariant x, y <= 2kN.

1. t_c = x_c * y_c mod m_c                          (all channels)
2. sigma_i = t_i * c_i mod a_i, with the folded constant
   c_i = (-N^-1 * (M_A/a_i)^-1) mod a_i            (base A)
   => the integer  q^ := sum_i sigma_i * (M_A/a_i)  satisfies
   q^ = q + e*M_A with q = t*(-N^-1) mod M_A and 0 <= e < k.
3. Extension 1 (offset-tolerant — e never needs to be known): q^ mod m_j
   for j in B u {r}, via the constant matrix
   W1[j, i] = (M_A/a_i) mod m_j.                                [MXU]
4. u_j = ((t_j + q^_j * N) / M_A) mod m_j
       = (t_j * (M_A^-1 mod m_j) + q^_j * (N * M_A^-1 mod m_j)) mod m_j.
   The division is exact: t + q^N = 0 mod M_A. As an integer,
   u = (xy + q^N)/M_A <= xy/M_A + kN <= (2kN)^2/(4kN) + kN = 2kN,
   so the chain invariant closes and u < M_B.
5. tau_j = u_j * ((M_B/b_j)^-1) mod b_j             (base B)
   => the integer  S := sum_j tau_j * (M_B/b_j) = u + beta*M_B, beta < k.
6. Extension 2 (exact, Shenoy-Kumaresan): S mod m_i for i in A u {r}
   via W2[i, j] = (M_B/b_j) mod m_i.                            [MXU]
   beta = (S_r - u_r) * (M_B^-1 mod m_r) mod m_r — exact because
   beta < k < m_r and u_r was produced by step 4.
   u_i = (S_i + beta * ((-M_B) mod a_i)) mod a_i     (base A)
Result: u = x*y*M_A^-1 (mod N), u <= 2kN, known in every channel.

Fused tau-domain formulation (what the code actually computes)
==============================================================
The VPU issues ~0.65-1.1 T elementwise u32 ops/s per v5e chip
(scripts/vpu_microbench.py) — the binding resource. Two fusions remove
~25% of the per-product VPU work while computing the *same integers*:

* **Tau-domain storage.** Base-B residues are stored pre-multiplied by
  c_tau_j = (M_B/b_j)^-1 mod b_j (A and r rows stay plain). Step 5 then
  costs nothing — the stored B residue *is* tau — and the REDC
  constants of step 4 absorb the scale: with raw~ = x~ * y~ = t * c^2,
  u~_j = u_j c_j = raw~ * (M_A^-1 c_j^-1) + q^_j * (N M_A^-1 c_j) mod m_j.
  The conversion matrix, domain constants (one_dom, r2_dom), and exit
  constants carry the same per-channel scale (`RNSSystem.scale`), so
  every interface value is unchanged.
* **No t canonicalisation.** The raw 28-bit channel product is consumed
  directly by splitting it as h*2^14 + l (shift/mask, no reduction):
  sigma_i = (h * (2^14 c_i mod a_i) + l * c_i) mod a_i, and the fused
  u~ above becomes (h * d2 + l * d1 + q^ * e1) mod m_j with
  d2 = 2^14 d1 mod m_j — three 28-bit products summed below 2^30, one
  steps=3 Barrett, versus reduce-then-multiply-then-reduce.

Per Montgomery product this is ~22k VPU multiplies + 6 Barrett
reductions per channel pair, versus ~29k and 9 for the textbook
staging; sigma, q^, u, beta and the final output are bit-identical.

Exponentiation enters the Montgomery domain by one product against the
residues of (M_A^2 mod N), runs the standard MSB-first windowed ladder
(same digit schedules as phe_tpu.ops.montgomery), and leaves by one
product against the all-ones residue vector (the integer 1) — giving
x^e mod N up to a multiple of N, bounded by kN + 1, which the limb
engine's to_mont absorbs directly (value << 2^8 R).

MXU exactness
=============
Channel residues are canonical < 2^14, so both 7-bit digits of every
operand and matrix entry are <= 127: plain int8 operands. A digit-product
sum spans <= 2k <= 2^10.3 terms of <= 127^2, staying under 2^24 — exact
in int32. The three digit blocks recombine as c0 + 2^7 c1 + 2^14 c2 with
staged Barrett reductions keeping every intermediate under 2^30. The
binary->RNS conversion is the one matmul whose inputs may be *redundant*
limbs (<= 2^14, high digit 128): there the high digits are biased by -64
into int8 range and the matmul output is restored with a precomputed
compensation vector, as in montgomery._build_redc_matrices.

Barrett channel reduction
=========================
mu_c = floor(2^28 / m_c); q = ((x >> 14) * mu) >> 14. Always q <= x/m,
and the quotient error obeys

  x/m - q  <  2^14/m + (x >> 14)/2^14 + 1.

The conditional-subtract ladder must cover r = x - q*m < err*m, i.e.
err <= 2^steps. With the channel floor m >= M_MIN = 4099
(2^14/m <= 2^14/4099 < 3.998), every call-site fits the steps=3 ladder
(4m, 2m, m), with the per-site x bounds:

* sigma: x = h*sig2 + l*sig1 < 2*2^14*m ->
  err < 3.998 + 2m/2^14 + 1 <= 3.998 + 2 + 1 < 7.00;
* fused u~: x = h*d2 + l*d1 + q^*e1 < m*(2^15 + m) ->
  err < 3.998 + 2m/2^14 + m^2/2^28 + 1, whose three m-dependent terms
  anti-correlate; the max over m in [4099, 2^14) stays < 7
  (exhaustive check: the realised quotient error never exceeds 5);
* digit-combine carry x = c2 + (c1>>7) < T*16255, T <= 2000 terms ->
  err < 3.998 + 0.13 + 1 = 5.13;
* combine outputs + additive folds (q^ reduce, S, u_a): x < 2^28.3 ->
  err < 3.998 + 1.3 + 1 = 6.3.

uint32 safety: the largest quotient product (x>>14)*mu is the fused-u~
case: x>>14 <= 2m + m^2/2^14 and mu <= 2^28/m give
(x>>14)*mu <= 2^29 + m*2^14 < 2^29 + 2^28 < 2^30 over the whole
channel range (the bound is tightest in m near 2^14, where it reaches
~8.1e8) — no overflow.

History: round 4 first lowered the floor from 2^13 to 5701 (keeping the
original steps=2 short ladders on residue products), then to 4099 by
moving the digit-combine carry reduction to steps=3 — at which point
every site is steps=3 and the short ladder is gone entirely. Supply:
872 primes in (2^13, 2^14), 1,149 above 5701, **1,335 above 4099** —
the difference between capping at ~2560-bit, ~3741-bit, and ~4380-bit
encrypt keys respectively.

This module is the host-side system builder plus the XLA reference
implementation (bit-exact twin of the fused Pallas kernel in
phe_tpu.ops.pallas_rns, and the CPU fallback path).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from phe_tpu.ops import limb_math as lm
from phe_tpu.utils import limbs as hl

DEFAULT_WINDOW = 4
_SPARE = 8  # channel rows past 2k: [r, r replicas] so the axis tiles
# Channel-prime floor: the smallest modulus for which the steps=3
# Barrett conditional-subtract ladder covers the quotient error at
# every call site — see the module docstring's derivation. Primes in
# (M_MIN, 2^14): 1,335.
M_MIN = 4099


class RNSSystem(NamedTuple):
    """Host-built constants for one modulus N. All arrays device-ready.

    Channel layout (cpad = 2k + 8 rows): [0:k] base A, [k:2k] base B,
    [2k] the redundant channel m_r, [2k+1:] replicas of m_r (padding; they
    compute duplicate values and are never read).
    """

    # per-channel vectors [cpad] uint32
    m: jnp.ndarray  # channel moduli
    mu: jnp.ndarray  # floor(2^28 / m)
    t14: jnp.ndarray  # 2^14 mod m
    sig1: jnp.ndarray  # A rows: c_sigma = -N^-1 (M_A/a_i)^-1 mod a_i; 0 else
    sig2: jnp.ndarray  # A rows: 2^14 c_sigma mod a_i; 0 elsewhere
    d1: jnp.ndarray  # B u r rows: M_A^-1 scale^-1 mod m_j; 0 elsewhere
    d2: jnp.ndarray  # B u r rows: 2^14 d1 mod m_j; 0 elsewhere
    e1: jnp.ndarray  # B u r rows: N M_A^-1 scale mod m_j; 0 elsewhere
    scale: jnp.ndarray  # tau-domain scale: c_tau on B rows, 1 on A u r.
    #   Also the stored representation of the integer 1's residues.
    neg_mb: jnp.ndarray  # A rows: (-M_B) mod a_i; 0 elsewhere
    one_dom: jnp.ndarray  # stored residues of M_A mod N (Mont-domain 1)
    r2_dom: jnp.ndarray  # stored residues of M_A^2 mod N (entry factor)
    w_r: jnp.ndarray  # B rows: (M_B/b_j) mod m_r (from_rns beta row)

    # scalars packed as [1] uint32
    mbinv_r: jnp.ndarray  # M_B^-1 mod m_r
    m_r: jnp.ndarray
    mu_r: jnp.ndarray

    # int8 digit-block matrices ([3K, 2C] layout, see _digit_blocks)
    w_ext1: jnp.ndarray  # [3(k+8), 2k]: (M_A/a_i) mod m_j, j in B u r u pads
    w_ext2: jnp.ndarray  # [3(k+8), 2k]: (M_B/b_j) mod m_i, i in A u r u pads
    w_out: jnp.ndarray  # [3*out_limbs, 2k]: limbs of (M_B/b_j)
    neg_mb_limbs: jnp.ndarray  # [out_limbs]: (2^(14 out_limbs) - M_B) limbs

    # Static geometry is derived from array shapes (a NamedTuple's int
    # fields would become traced pytree leaves under jit, breaking the
    # static slicing below).
    @property
    def cpad(self):
        return self.m.shape[0]

    @property
    def k(self):
        return (self.cpad - _SPARE) // 2

    @property
    def out_limbs(self):
        return self.neg_mb_limbs.shape[0]


def _primes_below(top, count):
    """The `count` largest primes below `top` (descending), sieve-based."""
    sieve = np.ones(top, dtype=bool)
    sieve[:2] = False
    for i in range(2, int(top**0.5) + 1):
        if sieve[i]:
            sieve[i * i :: i] = False
    ps = np.nonzero(sieve)[0][::-1]
    if len(ps) < count:
        raise ValueError(
            "not enough primes below %d for %d channels" % (top, count)
        )
    return [int(p) for p in ps[:count]]


def _digit_blocks(entries):
    """uint32 [K, C] canonical < 2^14 -> int8 [3K, 2C] block matrix.

    Against an input digit stack [x_lo; x_hi] the three output blocks are
    c0 = lo@x_lo, c1 = hi@x_lo + lo@x_hi, c2 = hi@x_hi, so that
    value = c0 + 2^7 c1 + 2^14 c2 exactly.
    """
    e = np.asarray(entries, dtype=np.uint32)
    lo = (e & 0x7F).astype(np.int8)
    hi = (e >> 7).astype(np.int8)
    z = np.zeros_like(lo)
    return jnp.asarray(np.block([[lo, z], [hi, lo], [z, hi]]))


def build_rns(modulus, max_entry_bits=None):
    """Construct the RNS system for one modulus N (host, Python ints).

    The general product bound is x*y <= k*N*M_A (then
    u <= xy/M_A + kN <= 2kN); chained operands <= 2kN need M_A >= 4kN.
    ``max_entry_bits`` additionally sizes M_A for a *wider first operand*
    (the decrypt path feeds a partially-reduced value < 2^(14(L+1)) into
    the domain-entry multiply against r2_dom < N): the entry product
    x * r2_dom <= 2^max_entry_bits * N then needs M_A >= 2^max_entry_bits / k.
    """
    N = int(modulus)
    nbits = N.bit_length()
    entry_floor = (1 << max_entry_bits) if max_entry_bits else 0
    # Minimal k: start at the optimistic ~13.9 bits/channel the largest
    # sub-2^14 primes actually deliver and grow until both products clear
    # their bounds. Primes alternate between the bases so M_A and M_B
    # stay balanced (every channel costs VPU work and matmul rows — k is
    # the single biggest knob on throughput).
    k = max(8, -(-(nbits + 24) // 14))
    while True:
        k = -(-k // 8) * 8
        primes = _primes_below(1 << 14, 2 * k + 1)
        # Floor: ladder coverage (M_MIN). Cap: the digit-combine carry
        # bound admits <= 2000 matmul terms, i.e. k <= 1000 (docstring).
        if min(primes) < M_MIN or k > 1000:
            raise ValueError(
                "modulus too large for the (%d, 2^14) RNS channel supply"
                % M_MIN
            )
        A, B, m_r = primes[0 : 2 * k : 2], primes[1 : 2 * k : 2], primes[2 * k]
        M_A = M_B = 1
        for a in A:
            M_A *= a
        for b in B:
            M_B *= b
        need = max(4 * k * N, -(-entry_floor // k))
        if M_A >= need and M_B >= 4 * k * N:
            break
        k += 8

    cpad = 2 * k + _SPARE
    chans = A + B + [m_r] * _SPARE
    marr = np.array(chans, dtype=np.uint32)

    ninv = pow(N, -1, M_A)
    sig1 = np.zeros(cpad, np.uint32)
    sig2 = np.zeros(cpad, np.uint32)
    for i, a in enumerate(A):
        cs = (-ninv * pow(M_A // a, -1, a)) % a
        sig1[i] = cs
        sig2[i] = (cs << 14) % a

    # Tau-domain scale: c_tau on B rows, 1 elsewhere (incl. r + pads).
    scale = np.ones(cpad, np.uint32)
    for j, b in enumerate(B):
        scale[k + j] = pow(M_B // b, -1, b)

    d1 = np.zeros(cpad, np.uint32)
    d2 = np.zeros(cpad, np.uint32)
    e1 = np.zeros(cpad, np.uint32)
    for j in range(k, cpad):
        mj = chans[j]
        inv = pow(M_A % mj, -1, mj)
        s = int(scale[j])
        # raw~ = t scale^2, so the REDC product constant divides one
        # scale back out; the q^ term multiplies the (unscaled) q^ in.
        d1[j] = inv * pow(s, -1, mj) % mj
        d2[j] = (d1[j] << 14) % mj
        e1[j] = (N % mj) * inv % mj * s % mj

    neg_mb = np.zeros(cpad, np.uint32)
    for i, a in enumerate(A):
        neg_mb[i] = (-M_B) % a

    # Domain constants must be the REDUCED representatives (< N): the
    # residues of M_A itself would represent a value >> 2kN and silently
    # break the chain bound (ext2's beta goes negative once values crest
    # k*M_B — caught by the 2048-bit ladder, invisible at toy sizes).
    # Stored (tau-domain) form: per-channel residue times scale.
    one_int = M_A % N
    one_dom = np.array(
        [one_int % m * int(s) % m for m, s in zip(chans, scale)],
        dtype=np.uint32,
    )
    r2int = M_A * M_A % N
    r2_dom = np.array(
        [r2int % m * int(s) % m for m, s in zip(chans, scale)],
        dtype=np.uint32,
    )

    # Extension matrices. W1 rows: output channels B u r u pads (k+8),
    # inputs sigma over A. W2 rows: A u r u pads, inputs tau over B.
    w1 = np.zeros((k + _SPARE, k), np.uint32)
    for jj in range(k + _SPARE):
        mj = chans[k + jj]
        for i, a in enumerate(A):
            w1[jj, i] = (M_A // a) % mj
    out_rows = A + [m_r] * _SPARE
    w2 = np.zeros((k + _SPARE, k), np.uint32)
    for ii in range(k + _SPARE):
        mi = out_rows[ii]
        for j, b in enumerate(B):
            w2[ii, j] = (M_B // b) % mi

    # From-RNS reconstruction: limbs of each M_B/b_j as matrix columns,
    # the beta row, and the radix complement of M_B.
    out_limbs = hl.num_limbs_for_bits(M_B.bit_length())
    vout = np.zeros((out_limbs, k), np.uint32)
    for j, b in enumerate(B):
        vout[:, j] = hl.int_to_limbs(M_B // b, out_limbs)
    w_r = np.zeros(cpad, np.uint32)
    for j, b in enumerate(B):
        w_r[k + j] = (M_B // b) % m_r
    r_out = 1 << (lm.LIMB_BITS * out_limbs)

    mu64 = (1 << 28) // marr.astype(np.uint64)
    return RNSSystem(
        m=jnp.asarray(marr),
        mu=jnp.asarray(mu64.astype(np.uint32)),
        t14=jnp.asarray(((1 << 14) % marr.astype(np.uint64)).astype(np.uint32)),
        sig1=jnp.asarray(sig1),
        sig2=jnp.asarray(sig2),
        d1=jnp.asarray(d1),
        d2=jnp.asarray(d2),
        e1=jnp.asarray(e1),
        scale=jnp.asarray(scale),
        neg_mb=jnp.asarray(neg_mb),
        one_dom=jnp.asarray(one_dom),
        r2_dom=jnp.asarray(r2_dom),
        w_r=jnp.asarray(w_r),
        mbinv_r=jnp.asarray(np.array([pow(M_B % m_r, -1, m_r)], np.uint32)),
        m_r=jnp.asarray(np.array([m_r], np.uint32)),
        mu_r=jnp.asarray(np.array([(1 << 28) // m_r], np.uint32)),
        w_ext1=_digit_blocks(w1),
        w_ext2=_digit_blocks(w2),
        w_out=_digit_blocks(vout),
        neg_mb_limbs=jnp.asarray(hl.int_to_limbs(r_out - M_B, out_limbs)),
    )


class RNSConversion(NamedTuple):
    """Binary->RNS matrix for one input width, with bias compensation.

    w: int8 [3*cpad, 2*in_limbs] digit-block matrix of 2^(14 j) mod m_c.
    comp: int32 [3*cpad] compensation restoring exact sums when input
      high digits are biased by -64 (redundant limbs reach 2^14, whose
      raw high digit 128 exceeds int8).
    """

    w: jnp.ndarray
    comp: jnp.ndarray

    @property
    def in_limbs(self):
        return self.w.shape[1] // 2


def build_conversion(system, in_limbs):
    """Conversion constants: binary limbs (redundant OK) -> all channels.

    Rows carry the system's tau-domain scale, so to_rns lands directly in
    the stored representation.
    """
    m_np = np.asarray(system.m)
    s_np = np.asarray(system.scale)
    w = np.zeros((system.cpad, in_limbs), np.uint32)
    for c in range(system.cpad):
        mc, sc = int(m_np[c]), int(s_np[c])
        w[c] = [
            pow(1 << lm.LIMB_BITS, j, mc) * sc % mc for j in range(in_limbs)
        ]
    blocks = _digit_blocks(w)
    wn = np.asarray(blocks)
    # High-digit input columns are the last in_limbs; biasing them by -64
    # shifts each output row down by 64 * (sum of its hi columns).
    comp = 64 * wn[:, in_limbs:].astype(np.int32).sum(axis=1)
    return RNSConversion(w=blocks, comp=jnp.asarray(comp))


# -- XLA reference implementation ---------------------------------------------
#
# Trailing-axis layout: residues are uint32[..., cpad]. This is the CPU
# path and the bit-exact twin the Pallas kernel is tested against.


def _mod(x, m, mu, steps=3):
    """Barrett: x < 2^30 -> x mod m, canonical (bounds in module docstring).

    steps: conditional-subtract ladder length. The quotient estimate
    q = ((x >> 14) mu) >> 14 has error < 2^14/m + (x >> 14)/2^14 + 1;
    with m >= M_MIN every call site's error stays below 8, covered by
    steps=3 (4m, 2m, m). Full per-site bound table in the module
    docstring.
    """
    q = ((x >> 14) * mu) >> 14
    r = x - q * m
    for s in range(steps - 1, -1, -1):
        step = m << s
        r = jnp.where(r >= step, r - step, r)
    return r


def _digits_i8(x):
    """Canonical values < 2^14 [..., C] -> int8 [..., 2C] (lo then hi)."""
    lo = (x & 0x7F).astype(jnp.int8)
    hi = (x >> 7).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=-1)


def _block_matmul(w, dig):
    """w [3K, 2C] int8, dig [..., 2C] int8 -> (c0, c1, c2) int32 [..., K]."""
    out = jax.lax.dot_general(
        dig,
        w,
        (((dig.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [..., 3K]
    K = w.shape[0] // 3
    return out[..., :K], out[..., K : 2 * K], out[..., 2 * K :]


def _combine_raw(c0, c1, c2, m, mu, t14):
    """Digit-block recombination, one Barrett short of canonical.

    value = c0 + 2^7 c1 + 2^14 c2
          = c0 + 2^7 (c1 & 127) + 2^14 (c2 + (c1 >> 7)),
    so one reduction of the 2^14-scale term e < 2^24 + 2^17 suffices and
    the returned sum is < 2^24 + 2^14 + 2^28 < 2^28.2 — small enough for
    the caller to fold one more additive term before the final Barrett.
    """
    c0 = c0.astype(jnp.uint32)
    c1 = c1.astype(jnp.uint32)
    c2 = c2.astype(jnp.uint32)
    # carry term < 2000 * 16255 < 2^25: error < 3.997 + 0.13 + 1 < 8.
    e = _mod(c2 + (c1 >> 7), m, mu)
    return c0 + ((c1 & 0x7F) << 7) + e * t14


def _combine_mod(c0, c1, c2, m, mu, t14):
    """(c0 + 2^7 c1 + 2^14 c2) mod m for digit sums c* < 2^24."""
    return _mod(_combine_raw(c0, c1, c2, m, mu, t14), m, mu)


def residues(value, sys_):
    """Stored (tau-domain) residues of a host integer: [cpad] uint32.

    Use for exit constants and any host-built operand entering the
    ladder at residue level (see pow_shared_xla's exit_res).
    """
    v = int(value)
    m_np = np.asarray(sys_.m)
    s_np = np.asarray(sys_.scale)
    return jnp.asarray(
        np.array(
            [v % int(mc) * int(sc) % int(mc) for mc, sc in zip(m_np, s_np)],
            dtype=np.uint32,
        )
    )


def rns_mont_mul(x, y, sys_):
    """One RNS Montgomery product over [..., cpad] stored-residue arrays.

    In/out canonical stored residues; represented values <= 2kN in and
    out. Fused tau-domain staging (module docstring): the raw 28-bit
    channel product is split h*2^14 + l and consumed directly by the
    sigma / REDC constant multiplies — no t canonicalisation, no tau
    step.
    """
    k = sys_.k
    m, mu = sys_.m, sys_.mu
    raw = x * y  # < m^2 < 2^28, never canonicalised
    h = raw >> 14  # < 2^14
    l = raw & 0x3FFF
    # sigma over base A: (h 2^14 + l) c_sigma mod a, two 28-bit products
    # summed < 2^29 -> one steps=3 Barrett (err < 3.997 + 2 + 1 < 8).
    sigma = _mod(
        h[..., :k] * sys_.sig2[:k] + l[..., :k] * sys_.sig1[:k],
        m[:k], mu[:k],
    )
    # Extension 1 -> q^ on B u r u pads.
    c0, c1, c2 = _block_matmul(sys_.w_ext1, _digits_i8(sigma))
    mj, muj, t14j = m[k:], mu[k:], sys_.t14[k:]
    qhat = _combine_mod(c0, c1, c2, mj, muj, t14j)  # [..., k+8]
    # u~ on B u r u pads: three products < 2^28, sum < m(2^15 + m) < 2^30
    # (err < 3.997 + 2m/2^14 + m^2/2^28 + 1 <= 5.56 -> steps=3).
    u_br = _mod(
        h[..., k:] * sys_.d2[k:] + l[..., k:] * sys_.d1[k:]
        + qhat * sys_.e1[k:],
        mj, muj,
    )
    # Extension 2 -> S on A u r u pads; exact beta via the redundant row.
    # The stored B residue IS tau (tau-domain storage): no multiply.
    c0, c1, c2 = _block_matmul(sys_.w_ext2, _digits_i8(u_br[..., :k]))
    mi = jnp.concatenate([m[:k], m[2 * k :]])
    mui = jnp.concatenate([mu[:k], mu[2 * k :]])
    t14i = jnp.concatenate([sys_.t14[:k], sys_.t14[2 * k :]])
    S_raw = _combine_raw(c0, c1, c2, mi, mui, t14i)  # [..., k+8], < 2^28.2
    u_r = u_br[..., k : k + 1]  # channel r sits at index k of the B u r block
    S_r = _mod(S_raw[..., k : k + 1], sys_.m_r, sys_.mu_r)
    beta = _mod(
        (S_r + (sys_.m_r - u_r)) * sys_.mbinv_r, sys_.m_r, sys_.mu_r
    )  # exact: beta < k < m_r
    # Fold the beta correction into the pending reduction:
    # S_raw + beta * neg_mb < 2^28.2 + 2^22 < 2^29.
    u_a = _mod(S_raw[..., :k] + beta * sys_.neg_mb[:k], m[:k], mu[:k])
    return jnp.concatenate([u_a, u_br], axis=-1)


def to_rns(limbs, conv, sys_):
    """Binary limbs [..., Lin] (redundant <= 2^14 OK) -> [..., cpad].

    High digits are biased into int8 range and compensated after the
    matmul (conv.comp), so redundant limbs cost nothing extra.
    """
    x = limbs
    lo = (x & 0x7F).astype(jnp.int32)
    hi = (x >> 7).astype(jnp.int32) - 64
    dig = jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)
    out = jax.lax.dot_general(
        dig,
        conv.w,
        (((dig.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = out + conv.comp  # exact non-negative digit sums < 2Lin * 2^14
    C = sys_.cpad
    return _combine_mod(
        out[..., :C], out[..., C : 2 * C], out[..., 2 * C :],
        sys_.m, sys_.mu, sys_.t14,
    )


def from_rns(u, sys_):
    """Exact binary limbs of u < M_B from [..., cpad] canonical residues.

    S = sum_j tau_j (M_B/b_j) lands as limb slots via the w_out digit
    matmul; the Shenoy-Kumaresan beta (from the redundant channel) then
    removes the beta*M_B excess using the radix complement — the result
    is normalised with full carry propagation, so dropped top carries
    remove exactly beta * 2^(14 out_limbs) and the value equals u.
    """
    k = sys_.k
    # Tau-domain storage: the stored B residues are the tau coefficients.
    tau = u[..., k : 2 * k]
    c0, c1, c2 = _block_matmul(sys_.w_out, _digits_i8(tau))
    c0 = c0.astype(jnp.uint32)
    c1 = c1.astype(jnp.uint32)
    c2 = c2.astype(jnp.uint32)
    shift_up = lambda a: jnp.concatenate(
        [jnp.zeros_like(a[..., :1]), a[..., :-1]], axis=-1
    )
    # Limb slots: c0 + 2^7 c1 + 2^14 c2 with the 2^14-scale parts moved
    # one limb up. Bounds: c0, c2 < 2^24, (c1 & 0x7F) << 7 < 2^14,
    # shifted (c1 >> 7) + c2 < 2^17 + 2^24 < 2^25 => slots < 2^25.1.
    slots = c0 + ((c1 & 0x7F) << 7) + shift_up((c1 >> 7) + c2)
    # beta from the redundant channel (w_r terms reduced, sum < k*2^14).
    # steps=3: tau < b_j can exceed m_r, so the product is < 2^28 but not
    # < m_r^2 — the short ladder's error bound does not apply here.
    terms = _mod(tau * sys_.w_r[k : 2 * k], sys_.m_r, sys_.mu_r, steps=3)
    s_r = _mod(jnp.sum(terms, axis=-1, keepdims=True), sys_.m_r, sys_.mu_r)
    u_r = u[..., 2 * k : 2 * k + 1]
    beta = _mod(
        (s_r + (sys_.m_r - u_r)) * sys_.mbinv_r, sys_.m_r, sys_.mu_r
    )
    slots = slots + beta * sys_.neg_mb_limbs  # + beta (R_out - M_B), < 2^25.2
    # Full normalisation: value mod R_out with every carry rippled out the
    # top — a 3-pass carry_fix could leave beta*R_out encoded redundantly.
    return lm.normalize(slots)


def rns_pow_digits(exponent, exponent_bits, window=DEFAULT_WINDOW):
    """Host helper: MSB-first digit schedule (same as montgomery's)."""
    from phe_tpu.ops import montgomery as mg

    return mg.exponent_digits(exponent, exponent_bits, window)


@functools.partial(jax.jit, static_argnames=("window",))
def pow_shared_xla(x_limbs, digits, conv, sys_, window=DEFAULT_WINDOW,
                   exit_res=None, entry_res=None):
    """x^e mod N (up to +jN, j <= k) via the RNS ladder; XLA reference.

    x_limbs: [..., Lin] binary limbs, value < 2kN; digits: [n_windows]
    int32 MSB-first base-2^window digits of e (conv built for Lin).
    Returns [..., out_limbs] canonical binary limbs of value <= kN + 1.

    exit_res (optional [cpad] STORED residues of a constant E < N, built
    with rns.residues) replaces the exit multiply by 1 with a multiply
    by E: the result is x^e * E mod N. entry_res similarly replaces the
    domain-entry constant M_A^2 mod N (sys_.r2_dom) with the residues of
    M_A^2 * F mod N: the ladder then computes (x*F)^e * E. Both fold
    per-key domain corrections into the ladder for free — e.g. the CRT
    decrypt enters with Montgomery-domain values x*R and exits through
    E = R^(1-p), landing directly at the plain x^(p-1); the scalar
    multiply feeds ciphertexts c*R with F = R^-1 and E = R, keeping the
    limb engine's Montgomery domain end to end with no REDC.
    """
    x = to_rns(x_limbs, conv, sys_)
    entry = sys_.r2_dom if entry_res is None else entry_res
    xd = rns_mont_mul(x, jnp.broadcast_to(entry, x.shape), sys_)
    one = jnp.broadcast_to(sys_.one_dom, xd.shape)

    # Table seeded with xd itself (not one*xd): keeps this reference
    # bit-equal to the Pallas kernel — same integer representatives at
    # every step, not merely the same values mod N.
    def mk(prev, _):
        nxt = rns_mont_mul(prev, xd, sys_)
        return nxt, nxt

    _, powers = jax.lax.scan(mk, xd, None, length=2**window - 2)
    table = jnp.concatenate([one[None], xd[None], powers], axis=0)

    def step(acc, digit):
        for _ in range(window):
            acc = rns_mont_mul(acc, acc, sys_)
        factor = jax.lax.dynamic_index_in_dim(table, digit, 0, keepdims=False)
        return rns_mont_mul(acc, factor, sys_), None

    acc, _ = jax.lax.scan(step, one, digits)
    # Leave the domain: multiply by the exit constant (default integer 1,
    # whose stored residues are the scale vector).
    unit = jnp.broadcast_to(
        sys_.scale if exit_res is None else exit_res, acc.shape
    )
    out = rns_mont_mul(acc, unit, sys_)
    return from_rns(out, sys_)


@functools.partial(jax.jit, static_argnames=("window",))
def pow_vec_xla(x_limbs, digits, conv, sys_, window=DEFAULT_WINDOW,
                exit_res=None, entry_res=None):
    """Per-element-exponent RNS modexp; XLA reference.

    digits: [..., n_windows] int32 MSB-first schedules, one row per
    element (matching x_limbs' leading dims). The table factor is
    selected by a one-hot contraction — constant-time in the exponent,
    like the limb engine's variant. Same bounds and entry/exit-constant
    semantics as pow_shared_xla (note: with entry factor F, the result
    is (x F)^e E — per-element e, shared F and E).
    """
    x = to_rns(x_limbs, conv, sys_)
    entry = sys_.r2_dom if entry_res is None else entry_res
    xd = rns_mont_mul(x, jnp.broadcast_to(entry, x.shape), sys_)
    one = jnp.broadcast_to(sys_.one_dom, xd.shape)

    def mk(prev, _):
        nxt = rns_mont_mul(prev, xd, sys_)
        return nxt, nxt

    _, powers = jax.lax.scan(mk, xd, None, length=2**window - 2)
    table = jnp.concatenate([one[None], xd[None], powers], axis=0)
    K = 2**window
    digits_first = jnp.moveaxis(digits, -1, 0)  # [n_windows, ...]

    def step(acc, digit):
        for _ in range(window):
            acc = rns_mont_mul(acc, acc, sys_)
        onehot = (
            digit[None, ...]
            == jnp.arange(K, dtype=digit.dtype).reshape((K,) + (1,) * digit.ndim)
        ).astype(jnp.uint32)
        factor = jnp.sum(table * onehot[..., None], axis=0)
        return rns_mont_mul(acc, factor, sys_), None

    acc, _ = jax.lax.scan(step, one, digits_first)
    unit = jnp.broadcast_to(
        sys_.scale if exit_res is None else exit_res, acc.shape
    )
    out = rns_mont_mul(acc, unit, sys_)
    return from_rns(out, sys_)


def pow_vec(x_limbs, digits, conv, sys_, window=DEFAULT_WINDOW,
            exit_res=None, entry_res=None):
    """Dispatcher for the per-element-exponent ladder (see pow_shared)."""
    from phe_tpu import config as _config

    if _config.use_rns_pallas_kernel() and x_limbs.ndim == 2:
        from phe_tpu.ops import pallas_rns

        return pallas_rns.pow_vec_rows(
            x_limbs, digits, conv, sys_, window=window,
            exit_res=exit_res, entry_res=entry_res,
        )
    return pow_vec_xla(x_limbs, digits, conv, sys_, window=window,
                       exit_res=exit_res, entry_res=entry_res)


def pow_shared(x_limbs, digits, conv, sys_, window=DEFAULT_WINDOW,
               exit_res=None, entry_res=None):
    """Dispatcher between the fused Pallas ladder and the XLA reference.

    PHE_TPU_RNS_KERNEL=auto|pallas|xla. auto: the Pallas kernel on TPU
    (VMEM-resident ladder), XLA elsewhere; pallas forces the kernel (in
    interpret mode off-TPU — the CI parity lane); xla forces the
    reference formulation.
    """
    from phe_tpu import config as _config

    if _config.use_rns_pallas_kernel() and x_limbs.ndim == 2:
        from phe_tpu.ops import pallas_rns

        return pallas_rns.pow_shared_rows(
            x_limbs, digits, conv, sys_, window=window, exit_res=exit_res,
            entry_res=entry_res,
        )
    return pow_shared_xla(
        x_limbs, digits, conv, sys_, window=window, exit_res=exit_res,
        entry_res=entry_res,
    )
