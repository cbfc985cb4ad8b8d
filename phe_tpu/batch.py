"""Batch-first Paillier: ciphertext batches as Montgomery limb tensors on TPU.

This is the TPU-native core of the framework. Where the reference processes
one CPython int at a time through gmpy2 (phe/paillier.py), here a batch of B
ciphertexts lives on device as ``uint32[B, L]`` limbs in the Montgomery
domain mod n^2, and every operation in the reference's API surface
(encrypt / decrypt / add / add_scalar / mul_scalar / obfuscate /
decrease_exponent_to, SURVEY.md §2 C5/C6/C9) is a jitted batch program:

* fresh encryption: nude = n*m + 1 (the g = n+1 shortcut,
  phe/paillier.py:132-134) times the obfuscator r^n — one shared-exponent
  Montgomery modexp over the whole batch;
* decryption: CRT with exponents p-1, q-1 over the half-width moduli p^2,
  q^2 (phe/paillier.py:346-353), with the L-function / hp,hq multiply /
  CRT recombination finishing in exact host arithmetic (cheap O(1) bigint
  ops per element versus the O(bits) modexp on device);
* homomorphic add: one Montgomery multiply mod n^2 (phe/paillier.py:705-719);
* scalar multiply: per-element-exponent modexp (phe/paillier.py:721-751).

Encoding exponents are host-side numpy metadata (they are small public
ints; alignment decisions are data-dependent on them, which is host logic,
not device logic). Ciphertext limbs never leave the device except at
explicit import/export boundaries.

Exponent-bit schedules are runtime int32 inputs, so one compiled program
per key geometry (bit length, batch shape) serves every key.

Shape bucketing: device compilation is keyed on shapes, and (especially over
a remote/tunnelled TPU) each fresh shape costs tens of seconds of compile.
Batch rows are therefore padded up to power-of-two buckets with identity
elements (m=0, r=1, factor=1 — all no-ops under the respective op) and digit
schedules to multiples of 8 windows (leading zero windows are no-ops), so
the engine converges on a small closed set of compiled programs. The
``mont`` tensor of an EncryptedBatch always carries the bucketed row count;
the logical batch length is ``len(exponents)``.
"""

import functools
import secrets
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from phe_tpu import config as _config
from phe_tpu.encoding import EncodedNumber
from phe_tpu.ops import limb_math as lm
from phe_tpu.ops import montgomery as mg
from phe_tpu.ops import rns
from phe_tpu.utils import limbs as hl

_config.enable_persistent_cache()

DEFAULT_WINDOW = mg.DEFAULT_WINDOW
# CRT decrypt ladders use a wider window: at half-width geometry the
# 2^5-entry table fits VMEM comfortably and saves ~2.6% of the Montgomery
# products on the 1024-bit exponents (1296 -> 1262 per half).
DECRYPT_WINDOW = 5
# The encrypt/obfuscate ladder (2048-bit exponent n) also gains from a
# wider window (2576 -> 2492 products at 2048-bit keys); the 2^5-entry
# table at full cpad width (~10 MB) still fits scoped VMEM.
ENCRYPT_WINDOW = 5
_MIN_BUCKET = 4
_WINDOW_GROUP = 8


def _use_rns():
    """Engine selection for the shared-exponent modexps (encrypt/decrypt).

    PHE_TPU_ENGINE=rns|limb|auto. auto: the RNS engine on TPU (where its
    matmuls ride the MXU and the measured limb-engine ceiling binds), the
    limb engine on CPU (keeps the default test lane on the engine the
    Pallas kernels share; tests cover the RNS lane explicitly).
    """
    return _config.use_rns_engine()


def bucket_rows(b):
    """Smallest power-of-two row count >= b (min 4)."""
    return max(_MIN_BUCKET, 1 << (b - 1).bit_length()) if b > 1 else _MIN_BUCKET


def _bucket_bits(bits, window=DEFAULT_WINDOW):
    """Round a digit-schedule width up to whole groups of 8 windows."""
    group = window * _WINDOW_GROUP
    return -(-bits // group) * group


def _digits_rows(exponents, bits, window=DEFAULT_WINDOW, pad_rows=None,
                 pad_value=1):
    """Stack per-element MSB-first digit schedules into [Bp, n_windows].

    Width-bucketed; rows padded to pad_rows with the schedule of pad_value
    (default 1: x^1 = x, a safe identity for padded lanes). Exponents
    below 2^63 (every float mantissa / alignment factor in practice) take
    a fully vectorised numpy path; larger ones fall back per element.
    """
    bits = _bucket_bits(max(bits, 1), window)
    n_windows = -(-bits // window)

    # Digit schedules ship as int8 when they fit (every window <= 6):
    # the [B, n_windows] array is the largest per-dispatch transfer of
    # the scalar-multiply path (4 MB of int32 at B = 65536), and the
    # tunnelled host->device link serialises with the execute RPC.
    # Device programs cast back to int32 on entry (_pow_elems).
    out_dtype = np.int8 if window <= 6 else np.int32

    def windows_of(arr):
        shifts = np.arange(n_windows - 1, -1, -1, dtype=np.uint64) * np.uint64(
            window
        )
        mask = np.uint64((1 << window) - 1)
        return ((arr[:, None] >> shifts[None, :]) & mask).astype(out_dtype)

    if (
        isinstance(exponents, np.ndarray)
        and exponents.dtype == np.int64
        and (n_windows - 1) * window < 64
    ):
        # Fully-vectorized route for prepared non-negative int64 arrays
        # (the _signed_mantissas_fast prologue): no per-element Python.
        arr = exponents.astype(np.uint64)
        if pad_rows is not None and len(arr) < pad_rows:
            arr = np.concatenate(
                [arr, np.full(pad_rows - len(arr), pad_value, np.uint64)]
            )
        return windows_of(arr)
    exponents = list(exponents)
    if pad_rows is not None and len(exponents) < pad_rows:
        exponents += [pad_value] * (pad_rows - len(exponents))
    small = [e for e in exponents if 0 <= e < (1 << 63)]
    if len(small) == len(exponents) and (n_windows - 1) * window < 64:
        return windows_of(np.array(exponents, dtype=np.uint64))
    return np.stack(
        [mg.exponent_digits(e, bits, window) for e in exponents]
    ).astype(out_dtype)


def _pad_list(values, target, fill):
    values = list(values)
    return values + [fill] * (target - len(values))


def _signed_mantissas_fast(public_key, scalars):
    """Vectorized (|mantissa| int64[B], neg uint8[B], exponent int64[B]).

    The no-bigint fast path for the scalar-multiply prologue: encoding a
    scalar and splitting it through the signed windows
    (EncodedNumber.encode_many + _signed_exponents) materialises an
    n-sized residue per negative element only to map it straight back to
    (n - residue) — ~30 ms of host bigint work per 8192-element batch
    that the streaming dispatch pipeline cannot hide. For finite floats
    under BASE=16 the whole computation is exact in IEEE-754: the
    exponent comes from frexp, the mantissa from one exact power-of-two
    ldexp, and np.rint is the same round-half-even as round() — so
    |mantissa| and the sign can be produced directly, bit-identical to
    the exact path. Homogeneous int64-range int lists reduce to
    abs/sign. Returns None whenever any element needs the exact rational
    path (mixed/other types, non-finite, window overflow at toy key
    sizes) — callers then fall back, and the exact path raises the
    reference-shaped errors.
    """
    if EncodedNumber.BASE != 16 or len(scalars) == 0:
        return None
    max_int = public_key.max_int
    if all(type(s) is float for s in scalars):
        a = np.asarray(scalars, dtype=np.float64)
        if not np.isfinite(a).all():
            return None
        _, e2 = np.frexp(a)
        exps = np.floor_divide(e2.astype(np.int64) - 53, 4)
        mant = np.rint(np.ldexp(a, -4 * exps))  # |mant| < 2^57: exact
        if max_int < (1 << 57) and (np.abs(mant) > float(max_int)).any():
            return None
        return (
            np.abs(mant).astype(np.int64),
            (mant < 0).astype(np.uint8),
            exps,
        )
    if all(type(s) in (int, bool) for s in scalars):
        try:
            a = np.asarray(scalars, dtype=np.int64)
        except OverflowError:
            return None
        if a.min() == np.iinfo(np.int64).min:  # |min| overflows abs()
            return None
        k = np.abs(a)
        if max_int < (1 << 63) and (k > max_int).any():
            return None
        return k, (a < 0).astype(np.uint8), np.zeros(len(a), np.int64)
    return None


# -- fused device programs ---------------------------------------------------
#
# Every public operation is ONE jitted program (one compile per key/batch
# geometry, one dispatch per call): eager per-primitive dispatch is what
# makes remote-device (tunnelled TPU) execution crawl, and jit boundaries
# are also where XLA fuses the elementwise carry pipeline.


@jax.jit
def _mul_mont_dev(a, b, ctx):
    return mg.mont_mul(a, b, ctx)


@jax.jit
def _pack_mont_dev(x, ctx):
    return mg.to_mont(x, ctx)


@jax.jit
def _export_dev(mont, ctx):
    """Montgomery -> canonical residues, packed to bytes on device."""
    return lm.pack_bytes(mg.export_canonical(mg.from_mont(mont, ctx), ctx))


def _bytes_to_ints(rows):
    """[B, nbytes] uint8 -> Python ints (one C-speed from_bytes per row)."""
    rows = np.asarray(rows)
    return [
        int.from_bytes(rows[i].tobytes(), "little")
        for i in range(rows.shape[0])
    ]


@functools.partial(jax.jit, static_argnames=("ln",))
def _encrypt_dev(m_bytes, r_bytes, n_limbs, nr2, n_digits, ctx, ln):
    """Fused fresh encryption: (n*m + 1) * r^n mod n^2, Montgomery form.

    Inputs arrive as little-endian bytes (the host->device boundary ships
    1 byte per 8 bits; limb unpacking happens on device, lm.unpack_bytes).
    """
    m = lm.unpack_bytes(m_bytes, ln)
    r = lm.unpack_bytes(r_bytes, ctx.num_limbs)
    nude = _nude_raw(m, n_limbs, nr2, ctx)
    obf = mg.mont_pow_shared(
        mg.to_mont(r, ctx), n_digits, ctx, window=ENCRYPT_WINDOW
    )
    return mg.mont_mul(nude, obf, ctx)


@jax.jit
def _obfuscate_dev(mont, r_bytes, n_digits, ctx):
    """Fused re-obfuscation: ct * r^n mod n^2 (phe/paillier.py:603-624)."""
    r = lm.unpack_bytes(r_bytes, ctx.num_limbs)
    obf = mg.mont_pow_shared(
        mg.to_mont(r, ctx), n_digits, ctx, window=ENCRYPT_WINDOW
    )
    return mg.mont_mul(mont, obf, ctx)


def _fit_limbs(wide, L):
    """Pad or truncate the trailing limb axis to exactly L limbs.

    Truncation is exact for RNS ladder outputs (value <= kN + 1, far
    below 2^(14 L - 16) by the context's headroom).
    """
    W = wide.shape[-1]
    if W < L:
        return jnp.pad(wide, [(0, 0)] * (wide.ndim - 1) + [(0, L - W)])
    return wide[..., :L]


class RnsPubState(NamedTuple):
    """RNS engine handle for one public modulus (pytree of arrays).

    entry_mont: stored residues of M_A^2 * R^-1 mod N — the domain-entry
      constant that divides the limb engine's Montgomery factor R out of
      a ciphertext operand for free (rns.pow_shared_xla entry_res).
    exit_r: stored residues of R mod N — the exit constant that lands
      ladder outputs directly back in the limb Montgomery domain.
    red: mg.ExcessReducer absorbing the ladder's +jN offset (j <= k)
      without a REDC.
    """

    rsys: rns.RNSSystem
    conv: rns.RNSConversion
    entry_mont: jnp.ndarray
    exit_r: jnp.ndarray
    red: mg.ExcessReducer


def _rns_pow_to_mont(base_limbs, digits, st, ctx, window=DEFAULT_WINDOW):
    """RNS-engine modexp landing in the limb engine's Montgomery domain.

    base_limbs: [B, Lin] PLAIN values (< 2kN). The ladder exits through
    the constant R mod N (st.exit_r), so the output is base^e * R — the
    Montgomery form — bounded by kN + 1; reduce_excess absorbs the +jN
    offset in O(L) work (previously a full to_mont REDC) and the result
    is canonical < N.
    """
    wide = rns.pow_shared(base_limbs, digits, st.conv, st.rsys,
                          window=window, exit_res=st.exit_r)
    return _fit_limbs(mg.reduce_excess(wide, st.red), ctx.num_limbs)


def _pow_elems(mont, digits, ctx, rstate):
    """Per-element-exponent modexp, Montgomery domain in and out.

    The engine-dispatch point for every data-dependent-exponent path
    (scalar multiply, exponent alignment, matvec grids — the reference's
    _raw_mul / decrease_exponent_to, phe/paillier.py:721-751, :570-601).
    rstate None runs the limb engine (mg.mont_pow); an RnsPubState runs
    the Cox-Rower RNS ladder with the Montgomery factor R handled by
    constant folds: entry through M_A^2 * R^-1 strips the operand's R
    ((c R) * R^-1 = c, once, before exponentiation), exit through R puts
    it back — zero limb REDCs on the whole path (round-3 profile: the
    from_mont/to_mont pair cost ~48 ms per 8192-element batch, 3x the
    ladder itself). reduce_excess absorbs the ladder's +jN offset, so
    outputs are canonical < M; chains and exports hold as before.

    Digit schedules may arrive as int8 (the transfer-thin wire form,
    _digits_rows) — widened here, inside the fused program, for free.
    """
    digits = digits.astype(jnp.int32)
    if rstate is None:
        return mg.mont_pow(mont, digits, ctx)
    lead = mont.shape[:-1]
    m2 = mont.reshape((-1, mont.shape[-1]))
    wide = rns.pow_vec(m2, digits.reshape((-1, digits.shape[-1])),
                       rstate.conv, rstate.rsys,
                       entry_res=rstate.entry_mont, exit_res=rstate.exit_r)
    out = _fit_limbs(mg.reduce_excess(wide, rstate.red), ctx.num_limbs)
    return out.reshape(lead + (ctx.num_limbs,))


@functools.partial(jax.jit, static_argnames=("ln",))
def _encrypt_rns_dev(m_bytes, r_bytes, n_limbs, nr2, n_digits, ctx, st, ln):
    """Fresh encryption with the obfuscator modexp on the RNS engine."""
    m = lm.unpack_bytes(m_bytes, ln)
    r = lm.unpack_bytes(r_bytes, ctx.num_limbs)
    nude = _nude_raw(m, n_limbs, nr2, ctx)
    obf = _rns_pow_to_mont(r, n_digits, st, ctx, window=ENCRYPT_WINDOW)
    return mg.mont_mul(nude, obf, ctx)


@jax.jit
def _obfuscate_rns_dev(mont, r_bytes, n_digits, ctx, st):
    """Re-obfuscation with the r^n modexp on the RNS engine."""
    r = lm.unpack_bytes(r_bytes, ctx.num_limbs)
    obf = _rns_pow_to_mont(r, n_digits, st, ctx, window=ENCRYPT_WINDOW)
    return mg.mont_mul(mont, obf, ctx)


@functools.partial(jax.jit, static_argnames=("ln",))
def _add_encoded_dev(mont, m_bytes, n_limbs, nr2, ctx, ln):
    """Fused scalar add: ct * (n*m + 1) mod n^2 (phe/paillier.py:673-675)."""
    m = lm.unpack_bytes(m_bytes, ln)
    return mg.mont_mul(mont, _nude_raw(m, n_limbs, nr2, ctx), ctx)


def _nude_raw(m, n_limbs, nr2, ctx):
    """(n*m + 1) in Montgomery form for encoded residues m < n.

    On the TPU path: one shared-operand Pallas Montgomery multiply by the
    precomputed constant nr2 = n*R^2 mod n^2 (m*nr2*R^-1 = n*m*R), then an
    elementwise add of R mod n^2 — no [B, Ln, Ln] outer product, no extra
    to_mont. The XLA fallback keeps the direct formulation.
    """
    if mg._use_pallas() and m.ndim == 2 and ctx.num_limbs % 8 == 0:
        pad = ctx.num_limbs - m.shape[-1]
        m_pad = jnp.pad(m, [(0, 0)] * (m.ndim - 1) + [(0, pad)])
        prod = mg.mont_mul_const(m_pad, nr2, ctx)  # n*m*R mod n^2, < 1.01 M
        one = jnp.broadcast_to(ctx.one, prod.shape).astype(prod.dtype)
        return lm.add(prod, one)  # value < 2.01 M: fine as a mont_mul input
    nm = lm.mul_full(m, jnp.broadcast_to(n_limbs, m.shape))
    nm1 = lm.carry_fix(nm.at[..., 0].add(1))
    pad = ctx.num_limbs - nm1.shape[-1]
    nm1 = jnp.pad(nm1, [(0, 0)] * (nm1.ndim - 1) + [(0, pad)])
    return mg.to_mont(nm1, ctx)


def _tree_fold(mont, ctx):
    """Modmul tree over the leading axis; static shapes, traced inline."""
    while mont.shape[0] > 1:
        size = mont.shape[0]
        half = size // 2
        merged = mg.mont_mul(mont[:half], mont[half : 2 * half], ctx)
        if size % 2:
            merged = jnp.concatenate([merged, mont[2 * half :]], axis=0)
        mont = merged
    return mont


@jax.jit
def _tree_reduce_dev(mont, ctx):
    """Homomorphic sum: one program for the whole log-depth modmul tree."""
    return _tree_fold(mont, ctx)


@jax.jit
def _tree_reduce_masked_dev(mont, valid, ctx):
    """Masked homomorphic sum: rows with valid == 0 count as identity.

    valid: uint32[B] runtime mask — one program serves every logical
    batch length sharing a bucketed shape.
    """
    one = jnp.broadcast_to(ctx.one, mont.shape).astype(mont.dtype)
    masked = jnp.where(valid[:, None] != 0, mont, one)
    return _tree_fold(masked, ctx)


@jax.jit
def _matvec_dev(mont, inv_mont, neg_mask, digits, ctx, rstate):
    """Fused encrypted matvec: base select, ONE grid pow, tree over D.

    mont / inv_mont: [D, L] encrypted weights and their modular inverses
    (Montgomery domain); neg_mask: uint32 [B, D] selecting the inverse
    base (the reference's inverse trick, phe/paillier.py:745-749, lifted
    to the whole grid); digits: [B, D, W] schedules of
    |mantissa| * BASE**align_diff — the alignment multiply
    (decrease_exponent_to's hidden modexp) is fused into the exponent
    itself, since (c^x)^(BASE^d) = c^(x * BASE^d).
    """
    B = digits.shape[0]
    base = jnp.where(
        neg_mask[..., None] != 0,
        jnp.broadcast_to(inv_mont, (B,) + inv_mont.shape),
        jnp.broadcast_to(mont, (B,) + mont.shape),
    )
    powed = _pow_elems(base, digits, ctx, rstate)
    return _tree_fold(jnp.moveaxis(powed, 1, 0), ctx)[0]


@jax.jit
def _crt_powers_dev(ct_mont, pub_ctx, ctx_p, red_p, dp_digits, ctx_q, red_q,
                    dq_digits):
    """Fused device half of CRT decryption for both half-width moduli."""
    plain = mg.from_mont(ct_mont, pub_ctx)
    outs = []
    for ctx, table, digits in (
        (ctx_p, red_p, dp_digits),
        (ctx_q, red_q, dq_digits),
    ):
        x = mg.mod_reduce(plain, ctx, table)
        powed = mg.mont_pow_shared(
            mg.to_mont(x, ctx), digits, ctx, window=DECRYPT_WINDOW
        )
        outs.append(mg.export_canonical(mg.from_mont(powed, ctx), ctx))
    return tuple(outs)


@jax.jit
def _add_encrypted_aligned_dev(a_mont, da, b_mont, db, ctx, rstate):
    """Fused E(a)+E(b) with per-element exponent alignment.

    da/db are BASE**diff digit schedules; the alignment modexps
    (phe/paillier.py:664-669's decrease_exponent_to) and the ciphertext
    product run as one program — one dispatch, one compile."""
    a2 = _pow_elems(a_mont, da, ctx, rstate)
    b2 = _pow_elems(b_mont, db, ctx, rstate)
    return mg.mont_mul(a2, b2, ctx)


@functools.partial(jax.jit, static_argnames=("ln",))
def _add_scalars_aligned_dev(a_mont, da, m_bytes, n_limbs, nr2, ctx, rstate,
                             ln):
    """Fused E(a)+b: alignment pow then multiply by the unblinded nude."""
    a2 = _pow_elems(a_mont, da, ctx, rstate)
    m = lm.unpack_bytes(m_bytes, ln)
    return mg.mont_mul(a2, _nude_raw(m, n_limbs, nr2, ctx), ctx)


@jax.jit
def _sum_aligned_dev(mont, digits, ctx, rstate):
    """Fused homomorphic sum: alignment pow + log-depth modmul tree."""
    return _tree_fold(_pow_elems(mont, digits, ctx, rstate), ctx)


@jax.jit
def _inverse_scan_dev(mont, ctx):
    """Montgomery-batch-inversion prefix scans over a ciphertext batch.

    Returns (excl, total): excl[i] = prod_{j != i} c_j (Montgomery
    products over the batch axis via two log-depth associative scans),
    total = prod_j c_j. One host inversion of `total` then yields every
    c_i^-1 as excl[i] * total^-1 (_finish_inverse_dev) — Montgomery's
    batch-inversion identity, ONE bigint inversion for the whole batch.
    """
    mul = lambda a, b: mg.mont_mul(a, b, ctx)
    incl = jax.lax.associative_scan(mul, mont, axis=0)
    rev_incl = jax.lax.associative_scan(mul, mont[::-1], axis=0)[::-1]
    one = jnp.broadcast_to(ctx.one, mont.shape).astype(mont.dtype)
    fwd_excl = jnp.concatenate([one[:1], incl[:-1]], axis=0)
    rev_excl = jnp.concatenate([rev_incl[1:], one[:1]], axis=0)
    return mg.mont_mul(fwd_excl, rev_excl, ctx), incl[-1]


@jax.jit
def _finish_inverse_dev(excl, tinv_mont, ctx):
    """excl[i] * total^-1 = c_i^-1, Montgomery domain."""
    return mg.mont_mul(
        excl, jnp.broadcast_to(tinv_mont, excl.shape), ctx
    )


@jax.jit
def _pow_select_dev(mont, inv_mont, neg_mask, digits, ctx, rstate):
    """Select base c vs c^-1 per element, then one per-exponent modexp.

    The batched negative-scalar branch of the reference's inverse trick
    (phe/paillier.py:745-749): (c^-1)^|k| = (c^|k|)^-1, with the base
    selected *before* the pow so negatives cost exactly one short modexp
    like every other element.
    """
    base = jnp.where(neg_mask[:, None] != 0, inv_mont, mont)
    return _pow_elems(base, digits, ctx, rstate)


def _lfunction_half(xc, ctxh, cm_pinv, h_limbs):
    """L(x, p) * h mod p for one CRT leg, from canonical x = c^(p-1) mod p^2.

    The L function is an exact Hensel division: (x-1)/p = (x-1) * p^-1
    mod 2^(14*Lh), exact because the quotient is < p < 2^(14*Lh). The
    constant multiply rides the MXU (mg.const_mul band matmul) — the
    generic mul_low materialised a [B, Lh, Lh] outer product here,
    ~10 ms per decrypt half at B=8192.
    """
    Lh = ctxh.num_limbs
    t = xc[..., :Lh]
    ones = jnp.full(t.shape, lm.LIMB_MASK, dtype=jnp.uint32)
    tm1 = lm.add(t, ones)  # == t - 1 (mod R_h), top carry dropped
    # const_mul is exact only mod R_h; the redundant truncation can sit
    # one R_h above the true quotient, and the value is used mod p
    # next — normalize to canonical (< R_h) to pin it to exactly
    # (x-1)/p, which is < p < R_h.
    lfun = lm.normalize(mg.const_mul(tm1, cm_pinv))
    hm = mg.mont_mul(
        mg.to_mont(lfun, ctxh),
        jnp.broadcast_to(h_limbs, lfun.shape),
        ctxh,
    )  # = L * h mod p (plain domain: one to_mont, one REDC)
    return mg.export_canonical(hm, ctxh)


def _decrypt_residue_limb(ct_mont, pub_ctx, pk):
    """Full batched CRT decryption on device -> plaintext residue limbs.

    Replaces the reference's scalar raw_decrypt (phe/paillier.py:328-374)
    end to end: per half-modulus, c^(p-1) mod p^2 (shared-exponent
    Montgomery pow), the Hensel L function (_lfunction_half), the hp/hq
    multiply mod p/q, and the CRT recombination
    mp + p*((q + mq - mp) * p^-1 mod q) — all branch-free limb arithmetic
    in one program. pk is a PrivateDeviceConstants pytree.
    """
    plain = mg.from_mont(ct_mont, pub_ctx)
    halves = []
    for ctx2, red, ddig, ctxh, cm_pinv, h_limbs in (
        (pk.ctx_p, pk.red_p, pk.dp_digits, pk.ctx_hp, pk.cm_pinv_p, pk.hp_limbs),
        (pk.ctx_q, pk.red_q, pk.dq_digits, pk.ctx_hq, pk.cm_pinv_q, pk.hq_limbs),
    ):
        x = mg.mod_reduce(plain, ctx2, red)
        powed = mg.mont_pow_shared(
            mg.to_mont(x, ctx2), ddig, ctx2, window=DECRYPT_WINDOW
        )
        xc = mg.export_canonical(mg.from_mont(powed, ctx2), ctx2)
        halves.append(_lfunction_half(xc, ctxh, cm_pinv, h_limbs))
    return _crt_recombine(halves[0], halves[1], pk)


@jax.jit
def _decrypt_dev(ct_mont, pub_ctx, pk):
    """Limb-engine decrypt -> packed plaintext bytes (exact export path)."""
    return lm.pack_bytes(_decrypt_residue_limb(ct_mont, pub_ctx, pk))


@jax.jit
def _decrypt_compact_dev(ct_mont, pub_ctx, pk):
    """Limb-engine decrypt -> (compact decode rows, full packed bytes).

    The full bytes stay on device unless the host actually needs a
    fallback row (jax transfers lazily on device_get).
    """
    m = _decrypt_residue_limb(ct_mont, pub_ctx, pk)
    return _decode_compact(m, pk), lm.pack_bytes(m)


def _gt_const(x, comp):
    """Per-row indicator value(x) > T, for canonical x and comp = R-1-T.

    Branch-free bigint compare: x + (R-1-T) carries past the top limb iff
    x >= T+1; the padded top limb after full normalisation is that carry.
    """
    nb = x.ndim - 1
    widen = [(0, 0)] * nb + [(0, 1)]
    s = jnp.pad(x, widen) + jnp.pad(jnp.broadcast_to(comp, x.shape), widen)
    return lm.normalize(s)[..., -1]


def _decode_compact(m, pk):
    """Device half of float/int decoding: sign window + 64-bit mantissa.

    m: [B, W] plaintext residue limbs (< n, possibly redundant). Emits
    uint32 [B, 3] rows (mant_lo32, mant_hi32, flags) where flags bit 0 =
    decodable (inside a sign window, phe/encoding.py:211-221 semantics),
    bit 1 = negative window, bit 2 = |mantissa| < 2^64. The host finishes
    decoding vectorised (one correctly-rounded ldexp per element) and
    falls back to exact bigint decode for rows with any flag unset — so
    the 2048-bit residue (280+ bytes) never crosses the host boundary for
    the overwhelmingly common case.
    """
    m = lm.normalize(m)
    ones = jnp.full(m.shape, lm.LIMB_MASK, dtype=jnp.uint32)
    rc = (ones - m).at[..., 0].add(1)  # R - m (redundant limbs <= 2^14)
    # n - m: the R excess carries out of the top limb, which normalize
    # drops by design (m = 0 leaves exactly n, which fails the negative
    # window test as it must).
    nm = lm.normalize(jnp.broadcast_to(pk.n_w, m.shape) + rc)
    pos = _gt_const(m, pk.maxc_w) == 0  # m <= max_int
    negf = _gt_const(nm, pk.maxc_w) == 0  # n - m <= max_int
    ok = pos | negf
    mant = jnp.where(negf[..., None], nm, m)
    w0 = mant[..., 0] | (mant[..., 1] << 14) | ((mant[..., 2] & 0xF) << 28)
    w1 = (
        (mant[..., 2] >> 4)
        | (mant[..., 3] << 10)
        | ((mant[..., 4] & 0xFF) << 24)
    )
    fits = (mant[..., 4] < 256) & jnp.all(mant[..., 5:] == 0, axis=-1)
    flags = (
        ok.astype(jnp.uint32)
        | (negf.astype(jnp.uint32) << 1)
        | (fits.astype(jnp.uint32) << 2)
    )
    return jnp.stack([w0, w1, flags], axis=-1)


def _crt_recombine(mp, mq, pk):
    """mp + p*((q + mq - mp) p^-1 mod q) -> packed plaintext bytes."""
    # u = (q + mq - mp) * p^-1 mod q, branch-free via the radix complement.
    ones = jnp.full(mp.shape, lm.LIMB_MASK, dtype=jnp.uint32)
    neg_mp = (ones - mp).at[..., 0].add(1)  # R_h - mp (mp canonical)
    # q + mq + (R_h - mp): full normalization ripples the carry out of the
    # top limb, dropping exactly one R_h (the sum is in [R_h, R_h + 2q),
    # and 2q < R_h by the context's 2^16 headroom) — a 3-pass carry_fix
    # could leave the R_h encoded redundantly, which would corrupt the
    # value mod q.
    diff = lm.normalize(
        jnp.broadcast_to(pk.q_limbs, mq.shape) + mq + neg_mp
    )  # == q + mq - mp in (0, 2q), exact
    u = mg.export_canonical(
        mg.mont_mul(
            mg.to_mont(diff, pk.ctx_hq),
            jnp.broadcast_to(pk.pinvq_limbs, diff.shape),
            pk.ctx_hq,
        ),
        pk.ctx_hq,
    )
    # m = mp + p * u  (< p*q = n, exact), normalized to canonical limbs.
    # p is per-key constant: the full product is one MXU band matmul
    # (out = 2*Lh covers p*u < p*q exactly; mg.const_mul).
    prod = mg.const_mul(u, pk.cm_pfull)
    pad = prod.shape[-1] - mp.shape[-1]
    m = lm.add(prod, jnp.pad(mp, [(0, 0)] * (mp.ndim - 1) + [(0, pad)]))
    return lm.normalize(m)


def _decrypt_residue_rns(ct_mont, pub_ctx, pk, half_p, half_q):
    """CRT decryption with both half-width modexps on the RNS engine.

    The wide ciphertext residue folds into each prime-square range
    (mod_reduce) and then enters the limb engine's Montgomery domain
    BEFORE conversion to residues: the ladder input x*R is < 1.01 p^2, so
    the RNS system needs no entry-bound channels (k = 152 instead of 160
    at 2048-bit keys), and the extra R factor exits for free through the
    ladder's exit constant E = R^(1-p): (xR)^(p-1) * R^(1-p) = x^(p-1)
    — the output is already the plain value the L-function needs; no
    from_mont, no to_mont, one reduce_excess.
    half_*: (RNSSystem, RNSConversion, exit_res, ExcessReducer) per
    prime square.
    """
    plain = mg.from_mont(ct_mont, pub_ctx)
    halves = []
    for ctx2, red, ddig, (rsys, conv, ers, red2), ctxh, cm_pinv, h_limbs in (
        (pk.ctx_p, pk.red_p, pk.dp_digits, half_p, pk.ctx_hp,
         pk.cm_pinv_p, pk.hp_limbs),
        (pk.ctx_q, pk.red_q, pk.dq_digits, half_q, pk.ctx_hq,
         pk.cm_pinv_q, pk.hq_limbs),
    ):
        x = mg.mod_reduce(plain, ctx2, red)  # [B, L2+1], value < 1.51 R
        # Montgomery entry without the XLA outer product: the top limb t
        # carries weight beta^L2 = R exactly and the value bound < 1.51 R
        # forces t <= 1, so x*R^2*R^-1 = REDC(x_lo * R^2) + t * R^2 — one
        # Pallas shared-operand multiply plus a limbwise add. Value
        # <= 2.01 p^2 + p^2 <= 2k p^2: inside the ladder chain bound.
        L2 = ctx2.num_limbs
        xm = lm.add(
            mg.mont_mul_const(x[..., :L2], ctx2.r2, ctx2),
            x[..., L2:] * jnp.broadcast_to(ctx2.r2, x[..., :L2].shape),
        )
        wide = rns.pow_shared(
            xm, ddig, conv, rsys, window=DECRYPT_WINDOW, exit_res=ers
        )
        # Ladder output is the PLAIN x^(p-1) + j p^2 (exit E = R^(1-p));
        # reduce_excess lands canonical < p^2 in O(L) — the round-3 path
        # paid a from_mont REDC plus an export pass here.
        xc = _fit_limbs(mg.reduce_excess(wide, red2), L2)
        halves.append(_lfunction_half(xc, ctxh, cm_pinv, h_limbs))
    return _crt_recombine(halves[0], halves[1], pk)


@jax.jit
def _decrypt_rns_dev(ct_mont, pub_ctx, pk, half_p, half_q):
    """RNS-engine decrypt -> packed plaintext bytes (exact export path)."""
    return lm.pack_bytes(_decrypt_residue_rns(
        ct_mont, pub_ctx, pk, half_p, half_q))


@jax.jit
def _decrypt_compact_rns_dev(ct_mont, pub_ctx, pk, half_p, half_q):
    """RNS-engine decrypt -> (compact decode rows, full packed bytes)."""
    m = _decrypt_residue_rns(ct_mont, pub_ctx, pk, half_p, half_q)
    return _decode_compact(m, pk), lm.pack_bytes(m)


class PublicDeviceContext:
    """Per-public-key device constants and jitted batch programs."""

    def __init__(self, public_key):
        self.public_key = public_key
        n = public_key.n
        self.n = n
        self.n_bits = n.bit_length()
        self.ctx = mg.build_context(public_key.nsquare)
        self.L = self.ctx.num_limbs  # limbs of the mod-n^2 engine
        self.Ln = hl.num_limbs_for_bits(self.n_bits)  # packing width for m < n
        self.n_limbs = jnp.asarray(hl.int_to_limbs(n, self.Ln))
        # Digit schedule of the public exponent n (obfuscator r^n).
        self.n_digits = jnp.asarray(
            mg.exponent_digits(n, self.n_bits, ENCRYPT_WINDOW)
        )
        # n * R^2 mod n^2: shared operand turning the (n*m + 1) encryption
        # prologue into one Montgomery multiply (see _nude_raw).
        R = 1 << (lm.LIMB_BITS * self.L)
        nsq = public_key.nsquare
        self.nr2_limbs = jnp.asarray(
            hl.int_to_limbs(n * (R * R % nsq) % nsq, self.L)
        )
        # Short-exponent obfuscation state (built lazily by obfuscator_pool).
        self._h_mont = None
        # RNS engine state (lazy: ~1s of host bigint precompute per key).
        self._rns = None

    def rns_state(self):
        """(RNSSystem, RNSConversion) for modexp mod n^2, or None.

        None when the modulus exceeds the RNS channel prime supply
        (keys above ~4380 bits need more primes in (rns.M_MIN, 2^14)
        than exist); callers then stay on the limb engine, which has no
        size ceiling. The reference's default 3072-bit keysize
        (phe/paillier.py:34) rides this fast engine (913 of the 1,335
        available channels), as do 4096-bit keys (1,249 channels).
        """
        if self._rns is None:
            try:
                nsq = self.public_key.nsquare
                rsys = rns.build_rns(nsq)
                conv = rns.build_conversion(rsys, self.L)
                R = 1 << (lm.LIMB_BITS * self.L)
                m_np = np.asarray(rsys.m)
                M_A = 1
                for a in m_np[: rsys.k].tolist():
                    M_A *= int(a)
                self._rns = RnsPubState(
                    rsys=rsys,
                    conv=conv,
                    entry_mont=rns.residues(
                        M_A * M_A % nsq * pow(R, -1, nsq) % nsq, rsys
                    ),
                    exit_r=rns.residues(R % nsq, rsys),
                    red=mg.build_excess_reducer(nsq, rsys.out_limbs),
                )
            except ValueError:
                self._rns = (None, None)
        return self._rns if self._rns != (None, None) else None

    @classmethod
    def build(cls, public_key):
        return cls(public_key)

    # -- packing ---------------------------------------------------------

    def pack_mod_nsquare(self, values):
        """Canonical residues mod n^2 -> Montgomery-domain [Bp, L]."""
        values = _pad_list(values, bucket_rows(len(values)), 1)
        x = jnp.asarray(hl.ints_to_limbs(values, self.L))
        return _pack_mont_dev(x, self.ctx)

    def export_ints(self, mont_arr):
        """Montgomery-domain [B, L] -> canonical Python ints in [0, n^2)."""
        return _bytes_to_ints(
            jax.device_get(_export_dev(mont_arr, self.ctx))
        )

    # -- core batch programs ----------------------------------------------

    def pack_messages(self, encodings, pad_rows=None):
        """Encoded residues m < n -> [Bp, nb] uint8 rows (device input).

        Rows pad with m = 0 (the additive/encryption identity: nude
        ciphertext 1) up to pad_rows or the bucket size. Bytes, not limb
        lanes: the device unpacks (lm.unpack_bytes), keeping the
        host->device transfer at 1 byte per 8 bits.
        """
        if pad_rows is None:
            pad_rows = bucket_rows(len(encodings))
        encodings = _pad_list(encodings, pad_rows, 0)
        return jnp.asarray(hl.ints_to_bytes(encodings, (self.n_bits + 7) // 8))

    def nude_encrypt(self, encodings):
        """(n*m + 1) mod n^2 in Montgomery form, for residues m < n.

        The g = n+1 shortcut (phe/paillier.py:132-134) holds for every
        residue m in [0, n) — including the reference's "negative window",
        where its modular-inverse branch (:125-130) is algebraically
        identical — so the batch path needs no data-dependent branch.
        """
        return _nude_encrypt_dev(self.pack_messages(encodings),
                                 self.n_limbs, self.nr2_limbs, self.ctx,
                                 ln=self.Ln)

    def random_r_bytes(self, count, r_values=None):
        """[Bp, nb] uint8 blinding bases from the system CSPRNG.

        With r_values given, reproduces the reference bit-for-bit
        (phe/paillier.py:136-143 obfuscator semantics), padding to the
        row bucket with r = 1 (identity obfuscator).

        The default draw is fully vectorised: one token_bytes call yields
        (n_bits + 64)-bit raw values shipped as raw bytes (the device
        unpacks into limbs). The obfuscator distribution r^n with r the
        raw value is within 2^-64 statistical distance of the reference's
        uniform r in [1, n) (the standard extra-64-bits argument; the raw
        value reduces mod n implicitly inside the modexp).
        """
        bucket = bucket_rows(count)
        nbytes = (self.n_bits + 64 + 7) // 8
        if r_values is not None:
            r_values = _pad_list(r_values, bucket, 1)
            need = max(
                nbytes, max((v.bit_length() + 7) // 8 for v in r_values)
            )
            return jnp.asarray(hl.ints_to_bytes(r_values, need))
        raw = np.frombuffer(
            secrets.token_bytes(bucket * nbytes), dtype=np.uint8
        ).reshape(bucket, nbytes)
        return jnp.asarray(raw)

    def encrypt_mont(self, encodings, r_values=None):
        """Fused fresh encryption (n*m+1)*r^n for encoded residues."""
        m = self.pack_messages(encodings)
        r = self.random_r_bytes(len(encodings), r_values)
        st = self.rns_state() if _use_rns() else None
        if st is not None:
            return _encrypt_rns_dev(
                m, r, self.n_limbs, self.nr2_limbs, self.n_digits, self.ctx,
                st, ln=self.Ln,
            )
        return _encrypt_dev(
            m, r, self.n_limbs, self.nr2_limbs, self.n_digits, self.ctx,
            ln=self.Ln,
        )

    def obfuscate_mont(self, mont):
        """Fresh uniform re-obfuscation of a Montgomery ciphertext batch."""
        r = self.random_r_bytes(mont.shape[0])
        st = self.rns_state() if _use_rns() else None
        if st is not None:
            return _obfuscate_rns_dev(mont, r, self.n_digits, self.ctx, st)
        return _obfuscate_dev(mont, r, self.n_digits, self.ctx)

    def obfuscate_mont_short(self, mont, exponent_bits=320):
        """Fast re-obfuscation h^a with h = x^n fixed and a random, short.

        Damgard-Jurik-style shortened randomness: h is one precomputed
        random n-th power; a fresh 320-bit exponent per element gives
        obfuscators computationally indistinguishable from uniform n-th
        powers under the decisional composite residuosity assumption in
        the subgroup, at ~n_bits/exponent_bits the modexp cost. This is a
        deliberate, documented deviation knob from the reference's
        uniform-r sampling (docs/caveats.rst notes phe itself has had no
        security audit); the default encrypt path stays exact.
        """
        if self._h_mont is None:
            x = 1 + secrets.randbelow(self.n - 1)
            xm = _pack_mont_dev(
                jnp.asarray(hl.ints_to_limbs([x], self.L)), self.ctx
            )
            self._h_mont = mg.mont_pow_shared(
                xm, self.n_digits, self.ctx, window=ENCRYPT_WINDOW
            )[0]
        count = mont.shape[0]
        a = [secrets.randbits(exponent_bits) for _ in range(count)]
        digits = jnp.asarray(
            _digits_rows(a, exponent_bits).astype(np.int32)
        )
        base = jnp.broadcast_to(self._h_mont, (count, self.L))
        obf = mg.mont_pow(base, digits, self.ctx)
        return _mul_mont_dev(mont, obf, self.ctx)

    def mul_mont(self, a, b):
        return _mul_mont_dev(a, b, self.ctx)

    def rstate(self):
        """RnsPubState when the RNS engine is selected, else None.

        The per-element-exponent engine dispatch handle passed into the
        fused device programs (see _pow_elems).
        """
        return self.rns_state() if _use_rns() else None

    def pow_scalars(self, ct_mont, exponents, exponent_bits):
        """ct^e_i with per-element exponents (scalar multiply).

        Pads the exponent list to the (bucketed) row count of ct_mont
        with e = 1, under which padded rows stay encryptions of 0.
        """
        digits = jnp.asarray(
            _digits_rows(exponents, exponent_bits, pad_rows=ct_mont.shape[0])
        )
        return _pow_elems_dev(ct_mont, digits, self.ctx, self.rstate())


@functools.partial(jax.jit, static_argnames=("ln",))
def _nude_encrypt_dev(m_bytes, n_limbs, nr2, ctx, ln):
    return _nude_raw(lm.unpack_bytes(m_bytes, ln), n_limbs, nr2, ctx)


@jax.jit
def _pow_elems_dev(mont, digits, ctx, rstate):
    return _pow_elems(mont, digits, ctx, rstate)


class PrivateDeviceConstants(NamedTuple):
    """Pytree of per-private-key device constants for one-program decrypt."""

    ctx_p: mg.MontgomeryContext  # mod p^2
    red_p: mg.ReduceTable
    dp_digits: jnp.ndarray  # p-1 digit schedule
    ctx_q: mg.MontgomeryContext  # mod q^2
    red_q: mg.ReduceTable
    dq_digits: jnp.ndarray
    ctx_hp: mg.MontgomeryContext  # mod p (half width)
    ctx_hq: mg.MontgomeryContext  # mod q
    cm_pinv_p: mg.ConstMulTable  # * (p^-1 mod 2^(14*Lh)) band matmul
    cm_pinv_q: mg.ConstMulTable  # * (q^-1 mod 2^(14*Lh))
    cm_pfull: mg.ConstMulTable  # * p, exact full product (CRT recombine)
    hp_limbs: jnp.ndarray  # hp canonical [Lh]
    hq_limbs: jnp.ndarray
    pinvq_limbs: jnp.ndarray  # p^-1 mod q canonical [Lh]
    q_limbs: jnp.ndarray  # q canonical [Lh]
    p_limbs: jnp.ndarray  # p canonical [Lh]
    n_w: jnp.ndarray  # n canonical [2 Lh] (decode window tests)
    maxc_w: jnp.ndarray  # 2^(28 Lh) - 1 - max_int canonical [2 Lh]


class PrivateDeviceContext:
    """Per-private-key device constants for batched CRT decryption."""

    def __init__(self, private_key):
        self.private_key = private_key
        pub = private_key.public_key
        self.pub_ctx = pub.device_context()
        p, q = private_key.p, private_key.q
        ctx_p = mg.build_context(private_key.psquare)
        ctx_q = mg.build_context(private_key.qsquare)
        wide = self.pub_ctx.L
        half_bits = max(p.bit_length(), q.bit_length())
        ctx_hp = mg.build_context(p)
        ctx_hq = mg.build_context(q, num_limbs=ctx_hp.num_limbs)
        Lh = max(ctx_hp.num_limbs, ctx_hq.num_limbs)
        if ctx_hp.num_limbs != Lh:
            ctx_hp = mg.build_context(p, num_limbs=Lh)
        Rh = 1 << (lm.LIMB_BITS * Lh)
        pack = lambda v: jnp.asarray(hl.int_to_limbs(v, Lh))
        self.consts = PrivateDeviceConstants(
            ctx_p=ctx_p,
            red_p=mg.build_reduce_table(private_key.psquare, ctx_p, wide),
            dp_digits=jnp.asarray(
                mg.exponent_digits(p - 1, half_bits, DECRYPT_WINDOW)
            ),
            ctx_q=ctx_q,
            red_q=mg.build_reduce_table(private_key.qsquare, ctx_q, wide),
            dq_digits=jnp.asarray(
                mg.exponent_digits(q - 1, half_bits, DECRYPT_WINDOW)
            ),
            ctx_hp=ctx_hp,
            ctx_hq=ctx_hq,
            cm_pinv_p=mg.build_const_mul(pow(p, -1, Rh), Lh, Lh),
            cm_pinv_q=mg.build_const_mul(pow(q, -1, Rh), Lh, Lh),
            cm_pfull=mg.build_const_mul(p, Lh, 2 * Lh),
            hp_limbs=pack(private_key.hp),
            hq_limbs=pack(private_key.hq),
            pinvq_limbs=pack(private_key.p_inverse),
            q_limbs=pack(q),
            p_limbs=pack(p),
            n_w=jnp.asarray(hl.int_to_limbs(pub.n, 2 * Lh)),
            maxc_w=jnp.asarray(hl.int_to_limbs(
                (1 << (lm.LIMB_BITS * 2 * Lh)) - 1 - pub.max_int, 2 * Lh
            )),
        )
        # Kept for the two-phase API and tests.
        self.ctx_p, self.red_p = self.consts.ctx_p, self.consts.red_p
        self.ctx_q, self.red_q = self.consts.ctx_q, self.consts.red_q
        self.dp_digits = self.consts.dp_digits
        self.dq_digits = self.consts.dq_digits
        self._rns = None

    def rns_state(self):
        """Per-prime-square RNS halves for the CRT decrypt modexps.

        Each half is (RNSSystem, RNSConversion, exit_res, ExcessReducer):
        the ladder enters with Montgomery-domain values x*R < 1.01 p^2
        (no entry bound, so k is minimal) and exits through
        E = R^(1-p) mod p^2, landing at the plain x^(p-1) directly
        (see _decrypt_residue_rns).
        """
        if self._rns is None:
            priv = self.private_key
            state = []
            try:
                for pp, nsq, ctx2 in (
                    (priv.p, priv.psquare, self.ctx_p),
                    (priv.q, priv.qsquare, self.ctx_q),
                ):
                    rsys = rns.build_rns(nsq)
                    conv = rns.build_conversion(rsys, ctx2.num_limbs)
                    R = 1 << (lm.LIMB_BITS * ctx2.num_limbs)
                    E = pow(pow(R, -1, nsq), pp - 1, nsq)
                    state.append((
                        rsys, conv, rns.residues(E, rsys),
                        mg.build_excess_reducer(nsq, rsys.out_limbs),
                    ))
                self._rns = tuple(state)
            except ValueError:
                # Prime-square modulus exceeds the RNS channel supply
                # (keys above ~8761 bits): stay on the limb engine.
                self._rns = (None, None)
        return self._rns if self._rns != (None, None) else None

    @classmethod
    def build(cls, private_key):
        return cls(private_key)

    def crt_powers(self, ct_mont):
        """Device half of raw_decrypt: (c^(p-1) mod p^2, c^(q-1) mod q^2).

        One fused program; returns canonical limb arrays (two-phase
        fallback path; the default decrypt is fully on-device via
        raw_decrypt_batch).
        """
        return _crt_powers_dev(
            ct_mont, self.pub_ctx.ctx,
            self.ctx_p, self.red_p, self.dp_digits,
            self.ctx_q, self.red_q, self.dq_digits,
        )

    def raw_decrypt_launch(self, ct_mont):
        """Dispatch the fused decrypt program; return the device handle.

        The handle is [Bp, nbytes] packed plaintext bytes, still on
        device — callers fetch when ready (streaming decrypt keeps
        several of these in flight).
        """
        st = self.rns_state() if _use_rns() else None
        if st is not None:
            half_p, half_q = st
            return _decrypt_rns_dev(
                ct_mont, self.pub_ctx.ctx, self.consts, half_p, half_q
            )
        return _decrypt_dev(ct_mont, self.pub_ctx.ctx, self.consts)

    def raw_decrypt_batch(self, ct_mont):
        """Exact plaintext residues mod n for a Montgomery ciphertext batch.

        One fused device program (CRT + L-function + recombination, see
        _decrypt_dev / _decrypt_rns_dev); the host only rebuilds ints
        from packed bytes.
        """
        return _bytes_to_ints(jax.device_get(self.raw_decrypt_launch(ct_mont)))

    def raw_decrypt_compact(self, ct_mont):
        """(compact decode rows, full packed bytes) — see _decode_compact.

        Same fused decryption, but the plaintext crosses the host boundary
        as 12 bytes per element (sign window + 64-bit mantissa + flags);
        the full residue bytes stay on device unless a row needs the
        exact-decode fallback.
        """
        st = self.rns_state() if _use_rns() else None
        if st is not None:
            half_p, half_q = st
            return _decrypt_compact_rns_dev(
                ct_mont, self.pub_ctx.ctx, self.consts, half_p, half_q
            )
        return _decrypt_compact_dev(ct_mont, self.pub_ctx.ctx, self.consts)


class EncryptedBatch:
    """A batch of Paillier ciphertexts resident on device.

    Attributes:
      public_key: the shared PaillierPublicKey.
      mont: uint32[B, L] ciphertexts, Montgomery domain mod n^2.
      exponents: int64 numpy [B], per-element encoding exponents.
      is_obfuscated: whether every element carries fresh r^n blinding
        (the lazy-obfuscation state machine, phe/paillier.py:531-568).
    """

    def __init__(self, public_key, mont, exponents, is_obfuscated=False):
        self.public_key = public_key
        self.mont = mont
        self.exponents = np.asarray(exponents, dtype=np.int64)
        self.is_obfuscated = is_obfuscated
        # Lazily-computed modular inverses of the ciphertexts (Montgomery
        # domain), for the negative-scalar inverse trick; reset whenever
        # self.mont is replaced in place (obfuscation on secure export).
        self._inv_mont = None

    def __len__(self):
        """Logical batch length (the mont tensor rows are bucket-padded)."""
        return len(self.exponents)

    @property
    def mont_logical(self):
        """Montgomery limb rows for just the logical batch (padding trimmed)."""
        return self.mont[: len(self)]

    @property
    def _dc(self):
        return self.public_key.device_context()

    # -- construction ------------------------------------------------------

    @classmethod
    def encrypt(cls, public_key, values, precision=None, r_values=None,
                obfuscation="exact"):
        """Encode and encrypt a sequence of ints/floats.

        obfuscation: "exact" draws uniform r < n and computes r^n (the
        reference's distribution, phe/paillier.py:136-143); "short" uses
        the precomputed-base short-exponent scheme (see
        PublicDeviceContext.obfuscators_short); "none" leaves ciphertexts
        unblinded (r=1) with is_obfuscated False, for intermediate values.
        """
        dc = public_key.device_context()
        if precision is None:
            encodings = EncodedNumber.encode_many(public_key, values)
        else:
            encodings = [
                v if isinstance(v, EncodedNumber)
                else EncodedNumber.encode(public_key, v, precision)
                for v in values
            ]
        exponents = [e.exponent for e in encodings]
        residues = [e.encoding for e in encodings]
        if r_values is not None:
            mont = dc.encrypt_mont(residues, r_values)
            return cls(public_key, mont, exponents, is_obfuscated=False)
        if obfuscation == "exact":
            mont = dc.encrypt_mont(residues)
        elif obfuscation == "short":
            nude = dc.nude_encrypt(residues)
            mont = dc.obfuscate_mont_short(nude)
        elif obfuscation == "none":
            return cls(
                public_key, dc.nude_encrypt(residues), exponents,
                is_obfuscated=False,
            )
        else:
            raise ValueError("unknown obfuscation mode: %r" % (obfuscation,))
        return cls(public_key, mont, exponents, is_obfuscated=True)

    @classmethod
    def from_ciphertext_ints(cls, public_key, ciphertexts, exponents,
                             is_obfuscated=False):
        """Import raw int ciphertexts (deserialisation boundary)."""
        dc = public_key.device_context()
        mont = dc.pack_mod_nsquare(list(ciphertexts))
        return cls(public_key, mont, exponents, is_obfuscated)

    @classmethod
    def from_encrypted_numbers(cls, numbers, be_secure=False):
        """Lift scalar EncryptedNumber objects onto the device."""
        if not numbers:
            raise ValueError("empty batch")
        pub = numbers[0].public_key
        cts = [e.ciphertext(be_secure=be_secure) for e in numbers]
        exps = [e.exponent for e in numbers]
        return cls.from_ciphertext_ints(pub, cts, exps, is_obfuscated=be_secure)

    # -- export ------------------------------------------------------------

    def ciphertext_ints(self, be_secure=True):
        """Raw int ciphertexts, obfuscating first when be_secure.

        Obfuscation persists on this batch (matching the reference's
        on-first-secure-read state machine, phe/paillier.py:531-568):
        repeated secure exports return the same ciphertexts without
        re-paying the r^n modexp.
        """
        if be_secure and not self.is_obfuscated:
            fresh = self.obfuscate()
            self.mont = fresh.mont
            self._inv_mont = None
            self.is_obfuscated = True
        return self._dc.export_ints(self.mont)[: len(self)]

    def to_encrypted_numbers(self, be_secure=True):
        from phe_tpu.encrypted import EncryptedNumber

        cts = self.ciphertext_ints(be_secure=be_secure)
        return [
            EncryptedNumber(self.public_key, c, int(e))
            for c, e in zip(cts, self.exponents)
        ]

    def decrypt(self, private_key, Encoding=None):
        """Decrypt and decode the whole batch.

        With the stock base-16 EncodedNumber the decode finishes on the
        compact device path (_decode_compact): the host receives 12 bytes
        per element instead of the full 2048-bit residue — the residue
        export was the single biggest non-kernel cost over a tunnelled
        TPU. Custom Encoding classes take the exact bigint path.
        """
        return self.decrypt_async(private_key, Encoding)()

    def decrypt_async(self, private_key, Encoding=None):
        """Launch the device half of decryption NOW; return a finisher.

        The returned zero-arg callable blocks on the device result and
        completes the host decode. Splitting the phases lets a serving
        loop keep several batches in flight: device programs for batches
        i+1, i+2, ... queue (dispatch is asynchronous) while the host
        finishes batch i — the decrypt kernels never idle waiting on
        host decode or result transfer. ``decrypt`` is exactly
        ``decrypt_async(...)()``.
        """
        if private_key.public_key != self.public_key:
            raise ValueError(
                "encrypted batch was encrypted against a different key!"
            )
        if Encoding is None:
            Encoding = EncodedNumber
        pdc = private_key.device_context()
        if Encoding is EncodedNumber and EncodedNumber.BASE == 16:
            compact, full = pdc.raw_decrypt_compact(self.mont)
            return functools.partial(
                self._finish_decrypt_fast, compact, full, Encoding
            )
        handle = pdc.raw_decrypt_launch(self.mont)

        def finish():
            residues = _bytes_to_ints(jax.device_get(handle))
            return [
                Encoding(self.public_key, m, int(e)).decode()
                for m, e in zip(residues, self.exponents)
            ]

        return finish

    def _finish_decrypt_fast(self, compact, full, Encoding):
        """Vectorised decode from the compact device rows.

        Exactness (vs phe/encoding.py:201-233's int/int division): BASE=16
        is a power of two, so decoding is mantissa * 2^(4 e). For e < 0,
        converting the <2^64 mantissa to float64 rounds half-even once and
        np.ldexp is then exact for normal results — the same single
        rounding as exact-rational division. A mantissa <= 2^53 converts
        exactly, so even subnormal results round once (inside ldexp).
        The only doubly-rounded corner — mantissa > 2^53 AND a subnormal
        result (4e + 64 < -960) — plus overflow-window rows and mantissas
        >= 2^64 fall back to the exact bigint decode (transferring the
        full residues only then).
        """
        B = len(self)
        c = np.asarray(jax.device_get(compact))[:B]
        flags = c[:, 2]
        mant = c[:, 0].astype(np.uint64) | (c[:, 1].astype(np.uint64) << 32)
        exps = self.exponents
        ok = (flags & 1) != 0
        neg = (flags & 2) != 0
        fits = (flags & 4) != 0
        easy = ok & fits & (
            (mant <= np.uint64(1 << 53)) | (4 * exps + 64 >= -960)
        )
        out = [None] * B
        fl = easy & (exps < 0)
        if fl.any():
            idx = np.nonzero(fl)[0]
            signed = np.where(neg[idx], -1.0, 1.0) * mant[idx].astype(
                np.float64
            )
            vals = np.ldexp(signed, (4 * exps[idx]).astype(np.int32))
            for i, v in zip(idx, vals):
                out[i] = float(v)
        for i in np.nonzero(easy & (exps >= 0))[0]:
            v = int(mant[i]) * 16 ** int(exps[i])
            out[i] = -v if neg[i] else v
        hard = ~easy
        if hard.any():
            ints = _bytes_to_ints(np.asarray(jax.device_get(full))[:B])
            for i in np.nonzero(hard)[0]:
                out[i] = Encoding(
                    self.public_key, ints[i], int(exps[i])
                ).decode()
        return out

    # -- homomorphic algebra ------------------------------------------------

    def obfuscate(self, mode="exact"):
        """Multiply every element by a fresh r^n (phe/paillier.py:603-624)."""
        dc = self._dc
        if mode == "exact":
            mont = dc.obfuscate_mont(self.mont)
        elif mode == "short":
            mont = dc.obfuscate_mont_short(self.mont)
        else:
            raise ValueError("unknown obfuscation mode: %r" % (mode,))
        return EncryptedBatch(self.public_key, mont, self.exponents, True)

    def decrease_exponent_to(self, new_exps):
        """Per-element exponent alignment: multiply by BASE**diff.

        new_exps: scalar or [B] array of target exponents (each <= the
        element's current exponent). The hidden modexp of the reference's
        decrease_exponent_to (phe/paillier.py:570-601) becomes one batched
        per-element-exponent Montgomery pow.
        """
        new_exps = np.broadcast_to(
            np.asarray(new_exps, dtype=np.int64), self.exponents.shape
        )
        diffs = self.exponents - new_exps
        if (diffs < 0).any():
            raise ValueError("New exponent should be more negative")
        if not diffs.any():
            return self
        factors = [EncodedNumber.BASE ** int(d) for d in diffs]
        bits = max(f.bit_length() for f in factors)
        mont = self._dc.pow_scalars(self.mont, factors, bits)
        return EncryptedBatch(self.public_key, mont, new_exps, False)

    def _aligned(self, other_exponents):
        """Align self and an exponent vector to the per-element minimum."""
        target = np.minimum(self.exponents, other_exponents)
        return self.decrease_exponent_to(target), target

    def _align_digits(self, target):
        """[Bp, W] BASE**diff digit schedules aligning self to target exps."""
        diffs = self.exponents - np.asarray(target, dtype=np.int64)
        factors = [EncodedNumber.BASE ** int(d) for d in diffs]
        bits = max(f.bit_length() for f in factors)
        return jnp.asarray(
            _digits_rows(factors, bits, pad_rows=self.mont.shape[0])
        )

    def __add__(self, other):
        if isinstance(other, EncryptedBatch):
            return self._add_encrypted(other)
        return self.add_scalars(other)

    def __radd__(self, other):
        return self.__add__(other)

    def __sub__(self, other):
        if isinstance(other, EncryptedBatch):
            return self + other.mul_scalars([-1] * len(other))
        return self + [-v for v in _as_list(other, len(self))]

    def __mul__(self, other):
        return self.mul_scalars(other)

    def __rmul__(self, other):
        return self.mul_scalars(other)

    def _add_encrypted(self, other):
        """Elementwise E(a)+E(b): one fused alignment + multiply program."""
        if self.public_key != other.public_key:
            raise ValueError(
                "Attempted to add numbers encrypted against "
                "different public keys!"
            )
        if len(self) != len(other):
            raise ValueError("batch size mismatch")
        target = np.minimum(self.exponents, other.exponents)
        dc = self._dc
        if (self.exponents == target).all() and (
            other.exponents == target
        ).all():
            mont = dc.mul_mont(self.mont, other.mont)
        else:
            mont = _add_encrypted_aligned_dev(
                self.mont,
                self._align_digits(target),
                other.mont,
                other._align_digits(target),
                dc.ctx,
                dc.rstate(),
            )
        return EncryptedBatch(self.public_key, mont, target, False)

    def add_scalars(self, scalars):
        """Elementwise E(a) + b for plaintext scalars.

        Encodes each scalar at max_exponent = the element's exponent
        (phe/paillier.py:640-641), aligns, multiplies by the unblinded
        encryption of the scalar (r=1, :673).
        """
        scalars = _as_list(scalars, len(self))
        encodings = [
            s if isinstance(s, EncodedNumber)
            else EncodedNumber.encode(
                self.public_key, s, max_exponent=int(e)
            )
            for s, e in zip(scalars, self.exponents)
        ]
        b_exps = np.array([e.exponent for e in encodings], dtype=np.int64)
        target = np.minimum(self.exponents, b_exps)
        aligned_encodings = [
            e if e.exponent == t else e.decrease_exponent_to(int(t))
            for e, t in zip(encodings, target)
        ]
        dc = self._dc
        m = dc.pack_messages(
            [e.encoding for e in aligned_encodings],
            pad_rows=self.mont.shape[0],
        )
        if (self.exponents == target).all():
            mont = _add_encoded_dev(
                self.mont, m, dc.n_limbs, dc.nr2_limbs, dc.ctx, ln=dc.Ln
            )
        else:
            mont = _add_scalars_aligned_dev(
                self.mont, self._align_digits(target), m, dc.n_limbs,
                dc.nr2_limbs, dc.ctx, dc.rstate(), ln=dc.Ln
            )
        return EncryptedBatch(self.public_key, mont, target, False)

    # Batch-inversion scan chunk. The associative_scan program lowers to
    # O(log B) Pallas mont_mul instantiations of DISTINCT shapes, each a
    # separate Mosaic kernel compile — at B = 32768 that is a
    # multi-ten-minute compile queue (the round-4 "vec-ladder compile
    # pathology" root cause; the ladder itself compiles in seconds at any
    # batch). Chunking pins the scan to one compiled shape; the price is
    # one extra host inversion per chunk (~100 us each).
    _INVERSE_CHUNK = 8192

    def inverse_mont(self):
        """Montgomery-domain modular inverses c_i^-1 mod n^2, cached.

        Montgomery's batch-inversion identity: two log-depth product
        scans on device plus ONE host bigint inversion of the running
        product per chunk serve the whole batch (the reference pays one
        extended-Euclid invert per negative scalar, phe/util.py:85-103).
        Cached on the batch: every subsequent negative-scalar multiply /
        matvec is a single fused device program.
        """
        if self._inv_mont is None:
            dc = self._dc
            from phe_tpu.utils.ntheory import invert

            nsq = self.public_key.nsquare
            chunks = []
            rows = self.mont.shape[0]
            step = self._INVERSE_CHUNK
            for lo in range(0, rows, step):
                part = self.mont[lo : lo + step]
                excl, total = _inverse_scan_dev(part, dc.ctx)
                total_int = dc.export_ints(total[None])[0]
                tinv = dc.pack_mod_nsquare([invert(total_int, nsq)])[0]
                chunks.append(_finish_inverse_dev(excl, tinv, dc.ctx))
            self._inv_mont = (
                chunks[0] if len(chunks) == 1
                else jnp.concatenate(chunks, axis=0)
            )
        return self._inv_mont

    def _signed_exponents(self, encodings):
        """Split encoded residues into (|k| exponents, negative mask).

        The reference's inverse trick (phe/paillier.py:745-749): residues
        in the negative window use n - encoding (short, like every
        float/int mantissa) as the exponent on the *inverted* ciphertext.
        """
        pub = self.public_key
        neg_window = pub.n - pub.max_int
        ks, neg = [], []
        for e in encodings:
            if e.encoding >= neg_window:
                ks.append(pub.n - e.encoding)
                neg.append(1)
            else:
                ks.append(e.encoding)
                neg.append(0)
        return ks, neg

    def mul_scalars(self, scalars):
        """Elementwise E(a) * b: ONE short-exponent modexp program.

        Negative scalars select the (batch-inverted, cached) ciphertext
        as the base: (c^-1)^|k| = (c^|k|)^-1 mod n^2, so every element
        pays exactly one short modexp. Results for negative scalars
        differ from the reference ciphertext by an n-th-power factor,
        exactly as the reference's own inverse branch does relative to
        c^plaintext; decryption agrees bit-for-bit.
        """
        scalars = _as_list(scalars, len(self))
        pub = self.public_key
        fast = _signed_mantissas_fast(pub, scalars)
        if fast is not None:
            ks, neg, sc_exps = fast
            any_neg = bool(neg.any())
            bits = max(int(ks.max()).bit_length(), 1)
        else:
            encodings = EncodedNumber.encode_many(pub, scalars)
            ks, neg = self._signed_exponents(encodings)
            sc_exps = np.array(
                [e.exponent for e in encodings], dtype=np.int64
            )
            any_neg = any(neg)
            bits = max(max(k.bit_length() for k in ks), 1)
            ks = np.asarray(ks, dtype=np.int64) if bits < 63 else ks
        dc = self._dc
        digits = jnp.asarray(
            _digits_rows(ks, bits, pad_rows=self.mont.shape[0])
        )
        if any_neg:
            mask = jnp.asarray(
                np.pad(np.asarray(neg, dtype=np.uint32),
                       (0, self.mont.shape[0] - len(neg)))
            )
            mont = _pow_select_dev(
                self.mont, self.inverse_mont(), mask, digits, dc.ctx,
                dc.rstate(),
            )
        else:
            mont = _pow_elems_dev(self.mont, digits, dc.ctx, dc.rstate())
        exponents = self.exponents + sc_exps
        return EncryptedBatch(self.public_key, mont, exponents, False)

    def sum(self):
        """Homomorphic sum of the batch: log-tree of Montgomery multiplies.

        The combine op is modular multiplication mod n^2 — the encrypted
        aggregation primitive of the FL example
        (examples/federated_learning_with_encryption.py:122-133).
        """
        target = int(self.exponents.min())
        if (self.exponents == target).all():
            mont = _tree_reduce_dev(self.mont, self._dc.ctx)
        else:
            mont = _sum_aligned_dev(
                self.mont,
                self._align_digits(np.full_like(self.exponents, target)),
                self._dc.ctx,
                self._dc.rstate(),
            )
        return EncryptedBatch(
            self.public_key, mont, np.array([target]), False
        )

    def dot(self, plain_vector):
        """Encrypted dot product: mul_scalars then tree-sum.

        The encrypted-LR scoring primitive
        (examples/logistic_regression_encrypted_model.py:170-177).
        """
        return self.mul_scalars(plain_vector).sum()

    def matvec(self, matrix):
        """scores = matrix @ self for plaintext [B, D] against D weights.

        The batched encrypted-inference primitive: one [B, D] grid of
        per-element-exponent Montgomery pows (ciphertext^x_ji), one grid
        exponent-alignment pow, and a log-depth modmul tree over D — versus
        the reference's B*D sequential powmod calls
        (examples/logistic_regression_encrypted_model.py:170-177).
        Returns an EncryptedBatch of B encrypted dot products.
        """
        matrix = np.asarray(matrix)
        if matrix.ndim != 2 or matrix.shape[1] != len(self):
            raise ValueError(
                "expected [B, %d] matrix, got %r" % (len(self), matrix.shape)
            )
        B, D = matrix.shape
        dc = self._dc
        w_mont = self.mont[:D]  # trim bucket padding: the grid is logical-D
        encodings = [
            EncodedNumber.encode_many(self.public_key, row)
            for row in matrix.tolist()
        ]
        # Signed split over the grid (the inverse trick, so negative
        # matrix entries cost ~53-bit exponents, not ~n-bit residues).
        flat = [e for row in encodings for e in row]
        ks, neg = self._signed_exponents(flat)
        # Product exponents e_w[i] + e_x[j,i]; align each row to its min,
        # fused into the modexp itself: (c^±|k|)^(BASE^d) = c^(±|k| BASE^d).
        exp_grid = self.exponents[None, :D] + np.array(
            [[e.exponent for e in row] for row in encodings], dtype=np.int64
        )
        row_min = exp_grid.min(axis=1)
        diffs = (exp_grid - row_min[:, None]).reshape(-1)
        exps = [
            k * EncodedNumber.BASE ** int(d) for k, d in zip(ks, diffs)
        ]
        bits = max(max(e.bit_length() for e in exps), 1)
        digits = jnp.asarray(_digits_rows(exps, bits)).reshape(B, D, -1)
        if any(neg):
            inv_mont = self.inverse_mont()[:D]
        else:
            inv_mont = w_mont
        mask = jnp.asarray(np.array(neg, dtype=np.uint32).reshape(B, D))
        mont = _matvec_dev(
            w_mont, inv_mont, mask, digits, dc.ctx, dc.rstate()
        )
        return EncryptedBatch(self.public_key, mont, row_min, False)


def _as_list(value, length):
    if np.isscalar(value):
        return [value] * length
    value = list(value)
    if len(value) != length:
        raise ValueError("scalar operand length mismatch")
    return value
