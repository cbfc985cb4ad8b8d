"""Batched Montgomery modular arithmetic: the TPU replacement for GMP powmod.

Everything the Paillier hot path needs (phe/paillier.py:136-139 obfuscation,
:328-354 CRT decrypt, :721-751 scalar multiply — each a modexp; :705-719
ciphertext add — a modmul) is expressed here as batched Montgomery-domain
operations over the redundant limb tensors of phe_tpu.ops.limb_math.

Design:
* per-modulus constants are computed once on host from Python ints and
  packed into a ``MontgomeryContext`` pytree (a scalar-prefetch-style
  constant bundle);
* the limb count L = ceil((bits(M) + 16) / 14) keeps the Montgomery radix
  R = 2**(14 L) at least 2**16 above M, so the subtraction-free variant
  holds: every chained value stays < 1.01 M (bound: REDC output
  <= T/R + (1+eps) M with T < 16 M^2 <= R M), and no data-dependent
  compare/subtract appears inside loops — uniform, constant-shape work
  that XLA compiles to straight-line VPU code;
* modexp is a ``lax.scan`` over fixed-width exponent windows (default 4
  bits): w squarings plus one table multiply per window, with the
  16-entry table built per batch. Exponent digits are runtime int32
  inputs, so one compiled program serves every key of a given geometry;
* the per-element variant selects table entries with a one-hot
  contraction instead of a gather — constant-time with respect to the
  exponent, unlike the reference's pow() (docs/caveats.rst ignores timing
  side channels; here uniformity falls out of the SIMD design).
"""

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from phe_tpu.ops import limb_math as lm
from phe_tpu.utils import limbs as hl

DEFAULT_WINDOW = 4


class MontgomeryContext(NamedTuple):
    """Per-modulus device constants (host-built, static shapes).

    Attributes:
      m: canonical limbs [L] of the modulus M.
      m_prime: [L] limbs of M' = -M^-1 mod R.
      r2: [L] limbs of R^2 mod M (to-Montgomery factor).
      one: [L] limbs of R mod M (Montgomery representation of 1).
      m_comp: [L] limbs of R - M (for branch-free conditional subtract).
      w_mq: int8 [2L, 2L] MXU REDC matrix for the Montgomery quotient, or
        None. Column i holds the 7-bit block-order digits of
        (2**w_i * M') mod R, where w_i is the weight of input digit i —
        so ``w_mq @ digits(t_low) + c_mq`` is t_low * M' mod R on the MXU,
        exactly (int8 operands, int32 accumulation). The MXU's 8-bit path
        is signed (uint8 operands are silently treated as int8 — a limb of
        exactly 2**14 gives a high digit of 128, which wraps to -128), so
        high digits are stored biased: digits(x) emits (x >> 7) - 64 in
        [-64, 64], and c_mq = 64 * (sum of the high-digit matrix columns)
        restores the exact sum.
      w_m: int8 [4L, 2L] companion matrix of 2**w_i * M (full product,
        2L output limbs) for the q*M multiply-accumulate, or None.
      c_mq: int32 [2L] bias-compensation vector for w_mq, or None.
      c_m: int32 [4L] bias-compensation vector for w_m, or None.
    """

    m: jnp.ndarray
    m_prime: jnp.ndarray
    r2: jnp.ndarray
    one: jnp.ndarray
    m_comp: jnp.ndarray
    w_mq: jnp.ndarray = None
    w_m: jnp.ndarray = None
    c_mq: jnp.ndarray = None
    c_m: jnp.ndarray = None

    @property
    def num_limbs(self):
        return self.m.shape[-1]


def num_limbs_for_modulus(modulus_bits):
    """L such that R = 2**(14 L) >= 2**16 * M for any M of modulus_bits.

    Rounded up to a multiple of 8 (the uint32 sublane tile) so the
    column-major Pallas engine can place limbs on the sublane axis without
    re-padding; the extra headroom only loosens the subtraction-free
    Montgomery bounds further.
    """
    raw = -(-(modulus_bits + 16) // lm.LIMB_BITS)
    return -(-raw // 8) * 8


def _block_digits(limb_rows):
    """[B, L] 14-bit limbs -> [B, 2L] block-order 7-bit digits.

    Digit column k < L is the low 7 bits of limb k (weight 2**(14k));
    column L + k is the high 7 bits (weight 2**(14k + 7)).
    """
    return np.concatenate([limb_rows & 0x7F, limb_rows >> 7], axis=-1)


def _build_redc_matrices(modulus, m_prime, num_limbs):
    """int8 constant matrices turning both REDC multiplies into matmuls.

    The two inner REDC products have one *shared* operand each (M' and M,
    properties of the key) — which is exactly the structure the MXU wants:
    x * C = sum_i digit_i(x) * (2**w_i * C), a constant-matrix product
    over x's 7-bit digits. Matrix entries are canonical digits <= 127, so
    they fit int8 exactly. Input high digits can reach 128 (redundant
    limbs hit 2**14), and the MXU's 8-bit path is signed — so the kernel
    biases high digits by -64 into [-64, 64] and each matmul output gets
    the constant compensation 64 * (sum of high-digit columns), returned
    here as int32 vectors. 8-bit operands run at ~1.5x the bf16 rate and
    accumulate into int32, with no float conversions on the VPU.

    Exactness ceiling: a compensated digit sum is at most
    2L * 127 * 128 = 2L * 2**14 (127 matrix digits times true input digits
    <= 128), and the kernel's _undigit recombination forms uint32 slots of
    at most 129x that (lo + hi<<7). The three-pass carry fix needs slots
    < 2**31, so 2L * 2**14 * 129 < 2**31 requires L <= 507. Larger
    geometries (e.g. 8192-bit n^2 for 4096-bit keys, L = 592) must use the
    VPU REDC path; build_context enforces this by not attaching the
    matrices.
    """
    L = num_limbs
    if 2 * L * (1 << lm.LIMB_BITS) * 129 >= 1 << 31:
        raise ValueError(
            "MXU REDC digit sums would overflow the carry-fix bound for "
            "L=%d (max 507); use the VPU path" % L
        )
    R = 1 << (lm.LIMB_BITS * L)
    weights = [lm.LIMB_BITS * i for i in range(L)] + [
        lm.LIMB_BITS * i + 7 for i in range(L)
    ]
    cs_q = [(m_prime << w) % R for w in weights]
    cs_m = [modulus << w for w in weights]
    # rows: input digit i; cols: output digit k (block order) -> transpose
    # so jnp.dot(w, digits[2L, TB]) yields output digits [rows, TB].
    a_q = _block_digits(np.asarray(hl.ints_to_limbs(cs_q, L)))  # [2L, 2L]
    a_m = _block_digits(np.asarray(hl.ints_to_limbs(cs_m, 2 * L)))  # [2L, 4L]
    # Bias compensation: high-digit input rows are i in [L, 2L).
    c_q = 64 * a_q[L:].sum(axis=0, dtype=np.int64)  # [2L]
    c_m = 64 * a_m[L:].sum(axis=0, dtype=np.int64)  # [4L]
    to_i8 = lambda a: jnp.asarray(np.ascontiguousarray(a.T).astype(np.int8))
    to_i32 = lambda c: jnp.asarray(c.astype(np.int32))
    return to_i8(a_q), to_i8(a_m), to_i32(c_q), to_i32(c_m)


def build_context(modulus, num_limbs=None, mxu=True):
    """Host-side construction of a MontgomeryContext from a Python int.

    mxu=True (the default; override with PHE_TPU_MXU=0) additionally packs
    the constant REDC matrices so the Pallas kernels run both Montgomery
    reduction products on the MXU.
    """
    from phe_tpu import config as _config

    if num_limbs is None:
        num_limbs = num_limbs_for_modulus(modulus.bit_length())
    R = 1 << (lm.LIMB_BITS * num_limbs)
    if R < (modulus << 16):
        raise ValueError("num_limbs too small for subtraction-free Montgomery")
    m_prime = (-pow(modulus, -1, R)) % R
    pack = lambda v: jnp.asarray(hl.int_to_limbs(v, num_limbs))
    w_mq = w_m = c_mq = c_m = None
    if (
        mxu
        and num_limbs % 8 == 0
        and num_limbs <= 507  # MXU digit-sum exactness ceiling, see above
        and _config.current().mxu
    ):
        w_mq, w_m, c_mq, c_m = _build_redc_matrices(modulus, m_prime, num_limbs)
    return MontgomeryContext(
        m=pack(modulus),
        m_prime=pack(m_prime),
        r2=pack(R * R % modulus),
        one=pack(R % modulus),
        m_comp=pack(R - modulus),
        w_mq=w_mq,
        w_m=w_m,
        c_mq=c_mq,
        c_m=c_m,
    )


def redc(t, ctx):
    """Montgomery reduction: value(t) * R^-1 mod M, redundant limbs.

    t: [..., W] with W >= 2L and value < c*R*M (c a small constant).
    Output [..., W-L] with value < (c + 1.01) * M (subtraction-free;
    see module docstring for bounds). Callers truncate the output to L
    limbs once the value bound is below beta^L.
    """
    L = ctx.num_limbs
    W = t.shape[-1]
    nbatch = t.ndim - 1
    m_q = lm.mul_low(t, jnp.broadcast_to(ctx.m_prime, t.shape[:-1] + (L,)), L)
    mm = lm.mul_full(m_q, jnp.broadcast_to(ctx.m, m_q.shape))  # [..., 2L]
    if W > 2 * L:
        mm = jnp.pad(mm, [(0, 0)] * nbatch + [(0, W - 2 * L)])
    u = lm.add(t, mm)
    return lm.shift_right_limbs_exact(u, L)


def mont_mul(a, b, ctx):
    """Montgomery product: a*b*R^-1 mod M over [..., L] operands.

    On TPU, 2D [B, L] operands route to the VMEM-resident Pallas kernel
    (one fused multiply per batch tile); other ranks and CPU use the XLA
    formulation.
    """
    if (
        _use_pallas()
        and a.ndim == 2
        and b.ndim == 2
        and a.shape == b.shape
        and ctx.num_limbs % 8 == 0
        and a.shape[-1] == ctx.num_limbs
    ):
        from phe_tpu.ops import pallas_modexp

        return pallas_modexp.mont_mul(a, b, ctx)
    return redc(lm.mul_full(a, b), ctx)


def mont_mul_const(a, b_limbs, ctx):
    """Montgomery product against one shared operand: a*b*R^-1 mod M.

    a: [..., L]; b_limbs: [L] limbs shared across the batch. On TPU, 2D
    inputs run in the VMEM-resident Pallas kernel; otherwise the XLA
    broadcast formulation.
    """
    if (
        _use_pallas()
        and a.ndim == 2
        and ctx.num_limbs % 8 == 0
        and a.shape[-1] == ctx.num_limbs
    ):
        from phe_tpu.ops import pallas_modexp

        return pallas_modexp.mont_mul_const(a, b_limbs, ctx)
    return redc(
        lm.mul_full(a, jnp.broadcast_to(b_limbs, a.shape[:-1] + b_limbs.shape)),
        ctx,
    )


def to_mont(x, ctx):
    """Enter the Montgomery domain: x -> x*R mod M.

    Accepts inputs up to L+1 limbs wide with value < 2**8 * R (the
    mod_reduce output bound): the REDC output is then < 2**8 * M + 1.01 M,
    far below beta^L, so truncating back to L limbs is exact. Exactly
    L-wide inputs take the shared-operand kernel path (x * R^2 * R^-1).
    """
    L = ctx.num_limbs
    if x.shape[-1] == L:
        return mont_mul_const(x, ctx.r2, ctx)
    out = redc(lm.mul_full(x, jnp.broadcast_to(ctx.r2, x.shape[:-1] + (L,))), ctx)
    return out[..., :L]


def from_mont(x, ctx):
    """Leave the Montgomery domain: x*R -> x mod M (redundant, < 1.01 M).

    REDC(x * 1): on TPU this is the shared-operand kernel with b = 1; the
    XLA fallback pads to 2L and reduces (identical value).
    """
    L = ctx.num_limbs
    if _use_pallas() and x.ndim == 2 and L % 8 == 0 and x.shape[-1] == L:
        one_int = jnp.zeros((L,), jnp.uint32).at[0].set(1)
        return mont_mul_const(x, one_int, ctx)
    nbatch = x.ndim - 1
    t = jnp.pad(x, [(0, 0)] * nbatch + [(0, L)])
    return redc(t, ctx)


def export_canonical(x, ctx):
    """Boundary helper: redundant value < 2M -> canonical limbs in [0, M)."""
    x = lm.normalize(x)
    return lm.cond_sub(x, ctx.m_comp, ctx.num_limbs)


class ExcessReducer(NamedTuple):
    """Constants for reduce_excess: v <= k*M + 1 (k < 2^10) -> [0, M).

    The RNS ladders return values bounded by k*N + 1 (rns.pow_shared);
    re-entering the limb engine's < 1.01 M invariant previously cost a
    full Montgomery REDC (to_mont / from_mont: O(L^2) VPU multiplies +
    MXU matmuls — ~24 ms per 8192-element batch at the 2048-bit
    geometry). This pass does it with ONE quotient estimate and three
    O(L) normalisation sweeps instead.

    Math (s = bits(M) - 4, static): a = floor(v / 2^s) < 2^14 and
    mu = floor(2^18 * 2^s / M) in (2^14, 2^15], so a*mu < 2^29 fits
    uint32 and j~ = (a * mu) >> 18 satisfies j - 2 <= j~ <= j = floor(v/M)
    (error terms a/2^18 + mu/2^18 + 1 < 2.2). Subtracting j~*M via the
    radix complement leaves v' in [0, 3M); a conditional subtract of 2M
    then M lands canonical in [0, M).

    Static shift geometry is encoded in pad-array SHAPES (pytree-safe,
    like RNSSystem.k): i0 = limb_pad.shape[0], r = shift_pad.shape[0].
    """

    mu: jnp.ndarray  # [1] uint32: floor(2^18 * 2^s / M)
    comp1: jnp.ndarray  # [W] canonical limbs of 2^(14 W) - M
    comp2: jnp.ndarray  # [W] canonical limbs of 2^(14 W) - 2M
    limb_pad: jnp.ndarray  # shape (i0,): s // 14, encoded as a shape
    shift_pad: jnp.ndarray  # shape (r,): s % 14, encoded as a shape

    @property
    def i0(self):
        return self.limb_pad.shape[0]

    @property
    def r(self):
        return self.shift_pad.shape[0]

    @property
    def in_limbs(self):
        return self.comp1.shape[0]


def build_excess_reducer(modulus, in_limbs):
    """Host-side constants for reduce_excess over in_limbs-wide inputs."""
    M = int(modulus)
    bits = M.bit_length()
    s = bits - 4
    W = in_limbs
    R_w = 1 << (lm.LIMB_BITS * W)
    if not 2 * M < R_w:
        raise ValueError("input width too narrow for the 2M complement")
    return ExcessReducer(
        mu=jnp.asarray(np.array([(1 << 18 << s) // M], np.uint32)),
        comp1=jnp.asarray(hl.int_to_limbs(R_w - M, W)),
        comp2=jnp.asarray(hl.int_to_limbs(R_w - 2 * M, W)),
        limb_pad=jnp.zeros((s // lm.LIMB_BITS,), jnp.uint8),
        shift_pad=jnp.zeros((s % lm.LIMB_BITS,), jnp.uint8),
    )


def reduce_excess(v, red):
    """Reduce canonical limbs [..., W], value <= 2^10 * M, to [0, M).

    See ExcessReducer for the derivation. Output: canonical [..., W]
    limbs (value < M; callers slice to the context width — exact, since
    M < beta^L).
    """
    i0, r = red.i0, red.r
    W = red.in_limbs
    # a = floor(v / 2^s) < 2^14: spans limbs i0 (from bit r) and i0+1
    # (v < 2^(s+14) so no higher limb contributes; bit r+13 <= 26).
    a = v[..., i0] >> r
    if i0 + 1 < W and r:
        a = a + (v[..., i0 + 1] << (lm.LIMB_BITS - r))
    jt = (a * red.mu[0]) >> 18  # floor(v/M) - 2 <= jt <= floor(v/M)
    # v - jt*M via the radix complement: slot products < 2^24, one
    # normalize ripples every carry and drops the jt * 2^(14 W) excess.
    v1 = lm.normalize(v + jt[..., None] * red.comp1)  # < 3M, canonical
    v2 = lm.cond_sub(v1, red.comp2, W)  # < 2M
    return lm.cond_sub(v2, red.comp1, W)  # < M, canonical


def _windowed_table(base, ctx, window):
    """Powers table [2**w, ..., L]: table[k] = base^k in Montgomery form."""
    one = jnp.broadcast_to(ctx.one, base.shape).astype(jnp.uint32)

    def step(prev, _):
        nxt = mont_mul(prev, base, ctx)
        return nxt, nxt

    _, powers = jax.lax.scan(step, one, None, length=2**window - 1)
    return jnp.concatenate([one[None], powers], axis=0)


def exponent_digits(exponent, exponent_bits, window=DEFAULT_WINDOW):
    """Host helper: fixed-width base-2**window digits, MSB first (int32)."""
    n_windows = -(-exponent_bits // window)
    mask = (1 << window) - 1
    return np.array(
        [(exponent >> (window * i)) & mask for i in reversed(range(n_windows))],
        dtype=np.int32,
    )


def _use_pallas():
    from phe_tpu import config as _config

    return _config.use_pallas_backend()


def mont_pow_shared(base, digits, ctx, window=DEFAULT_WINDOW):
    """base^e in Montgomery form, one exponent shared across the batch.

    This covers every key-defined exponent in Paillier: r^n mod n^2
    (obfuscation), c^(p-1) mod p^2 and c^(q-1) mod q^2 (CRT decrypt) —
    the exponent is a property of the key, the bases vary per element.

    On TPU this dispatches to the VMEM-resident Pallas kernel
    (phe_tpu.ops.pallas_modexp), which runs the whole windowed modexp
    on-chip; the XLA formulation below is the portable fallback (and the
    CPU test path). Override with PHE_TPU_BACKEND=xla|pallas.

    Args:
      base: [..., L] Montgomery-domain bases.
      digits: [n_windows] int32, MSB-first base-2**window digits of e.
      ctx: MontgomeryContext (arrays broadcastable against base).
    Returns [..., L] base^e * R mod M (redundant form).
    """
    if (
        _use_pallas()
        and base.ndim == 2
        and ctx.num_limbs % 8 == 0
        and getattr(digits, "ndim", 1) == 1
    ):
        from phe_tpu.ops import pallas_modexp

        return pallas_modexp.mont_pow_shared(base, digits, ctx, window=window)
    return _mont_pow_shared_xla(base, digits, ctx, window=window)


@functools.partial(jax.jit, static_argnames=("window",))
def _mont_pow_shared_xla(base, digits, ctx, window=DEFAULT_WINDOW):
    """XLA scan formulation of the shared-exponent windowed modexp."""
    table = _windowed_table(base, ctx, window)
    one = jnp.broadcast_to(ctx.one, base.shape).astype(jnp.uint32)

    def step(acc, digit):
        for _ in range(window):
            acc = mont_mul(acc, acc, ctx)
        factor = jax.lax.dynamic_index_in_dim(table, digit, 0, keepdims=False)
        return mont_mul(acc, factor, ctx), None

    acc, _ = jax.lax.scan(step, one, digits)
    return acc


def mont_pow(base, digits, ctx, window=DEFAULT_WINDOW):
    """base^e with per-element exponents (scalar-multiply / alignment path).

    base: [..., L]; digits: [..., n_windows] matching leading dims. On TPU
    the leading dims are flattened and the per-lane Pallas kernel runs the
    whole windowed scan in VMEM; CPU and exotic ranks use the XLA scan.
    """
    if (
        _use_pallas()
        and ctx.num_limbs % 8 == 0
        and base.ndim >= 2
        and getattr(digits, "ndim", 0) == base.ndim
        and base.shape[-1] == ctx.num_limbs
    ):
        from phe_tpu.ops import pallas_modexp

        lead = base.shape[:-1]
        out = pallas_modexp.mont_pow(
            base.reshape((-1, base.shape[-1])),
            digits.reshape((-1, digits.shape[-1])),
            ctx,
            window=window,
        )
        return out.reshape(lead + (base.shape[-1],))
    return _mont_pow_xla(base, digits, ctx, window=window)


@functools.partial(jax.jit, static_argnames=("window",))
def _mont_pow_xla(base, digits, ctx, window=DEFAULT_WINDOW):
    """XLA scan formulation of the per-element-exponent windowed modexp.

    Args:
      base: [..., L] Montgomery-domain bases.
      digits: [..., n_windows] int32 MSB-first digits, one row per element.
    Returns [..., L].

    The table entry is selected by a one-hot contraction rather than a
    gather: constant-time in the exponent and VPU-friendly (16 fused
    multiply-selects per window versus the ~L^2 cost of the modmul).
    """
    table = _windowed_table(base, ctx, window)  # [K, ..., L]
    one = jnp.broadcast_to(ctx.one, base.shape).astype(jnp.uint32)
    digits_first = jnp.moveaxis(digits, -1, 0)  # [n_windows, ...]

    K = 2**window

    def step(acc, digit):
        for _ in range(window):
            acc = mont_mul(acc, acc, ctx)
        onehot = (
            digit[None, ...] == jnp.arange(K, dtype=digit.dtype).reshape(
                (K,) + (1,) * digit.ndim
            )
        ).astype(jnp.uint32)
        factor = jnp.sum(table * onehot[..., None], axis=0)
        return mont_mul(acc, factor, ctx), None

    acc, _ = jax.lax.scan(step, one, digits_first)
    return acc


class ConstMulTable(NamedTuple):
    """Digit-matmul constants for a limb product with a SHARED constant.

    The generic limb product (lm.mul_full / mul_low) materialises a
    [..., La, Lc] outer product plus diag_sum shear buffers — hundreds of
    MB of HBM traffic per 8k-element batch at decrypt's half-width
    geometry (measured ~10-20 ms per call, scripts/dec_stage_marginals).
    With one operand constant, the product is a band-matrix contraction
    the MXU can do directly: value = sum_{w,i} d_{w,i} 2^(6w) 2^(14 i) C
    for the three 6-bit input planes d, so with row blocks
    M_w[i, k] = limb_{k-i}(C << 6w) the slot vector is one int8 matmul.

    w: int8 [3*in_limbs, 2*out_limbs] — the three plane blocks stacked,
    each split into lo-7 | hi-7 bit column halves (entries < 2^14).
    """

    w: jnp.ndarray

    @property
    def out_limbs(self):
        return self.w.shape[1] // 2


def build_const_mul(const_value, in_limbs, out_limbs):
    """ConstMulTable for (a * const) mod 2^(14*out_limbs).

    Exact for inputs a with limbs <= 2^16 (redundant headroom): digit
    planes are < 64 (int8-safe), matmul accumulators sum 3*in_limbs
    terms of 63*127 < 2^13 — int32-exact and, recombined as
    c0 + (c1 << 7), under 2^31 (carry_fix's soundness bound) for
    in_limbs <= 698. Choose out_limbs >= in + width(const) for the
    exact full product; smaller out gives the product mod 2^(14*out)
    (top carries drop in carry_fix, i.e. exact modular truncation).
    """
    if in_limbs > 698:
        raise ValueError(
            "const_mul accumulator bound holds for <= 698 input limbs"
        )
    c = int(const_value)
    blocks = []
    for w in (0, 6, 12):
        sl = hl.int_to_limbs((c << w) & ((1 << (14 * out_limbs)) - 1),
                             out_limbs)
        M = np.zeros((in_limbs, out_limbs), np.uint32)
        for i in range(in_limbs):
            M[i, i:] = sl[: out_limbs - i]
        blocks.append(M)
    Mall = np.concatenate(blocks, axis=0)  # [3*in, out], entries < 2^14
    w8 = np.concatenate(
        [(Mall & 0x7F).astype(np.int8), (Mall >> 7).astype(np.int8)],
        axis=1,
    )
    return ConstMulTable(w=jnp.asarray(w8))


def const_mul(a, table):
    """(a * const) mod 2^(14*out_limbs) -> redundant limbs [..., out].

    a: [..., in_limbs] limbs <= 2^16. Output limbs <= 2^14 (carry_fix
    invariant); value is the exact modular product — callers needing
    canonical form normalize (mod-2^(14*out) truncation semantics match
    lm.mul_low's: value(limbs) == product mod 2^(14*out)).
    """
    dig = jnp.concatenate(
        [
            (a & 0x3F).astype(jnp.int8),
            ((a >> 6) & 0x3F).astype(jnp.int8),
            (a >> 12).astype(jnp.int8),
        ],
        axis=-1,
    )
    out = jax.lax.dot_general(
        dig, table.w,
        (((dig.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    ).astype(jnp.uint32)
    O = table.out_limbs
    return lm.carry_fix(out[..., :O] + (out[..., O:] << 7))


class ReduceTable(NamedTuple):
    """Constants for reducing wide values mod M: powers beta^(L+j) mod M."""

    powers: jnp.ndarray  # [K, L] canonical limbs of 2**(14*(L+j)) mod M
    # int8 [3K, 2(L+1)] digit matrix for the MXU fold: rows are the lo-7 |
    # hi-7 digit blocks of the limbs of (2**w * (beta^(L+j) mod M)) for
    # w in (0, 6, 12), j-major within each w plane — matching the 6-bit
    # input digit planes mod_reduce feeds it.
    digit_w: jnp.ndarray

    @property
    def extra_limbs(self):
        return self.powers.shape[0]


def build_reduce_table(modulus, ctx, in_limbs):
    """Host-side table for mod_reduce of in_limbs-wide inputs."""
    L = ctx.num_limbs
    K = in_limbs - L
    if K <= 0:
        raise ValueError("input is not wider than the modulus context")
    rows = [
        hl.int_to_limbs(pow(1 << lm.LIMB_BITS, L + j, modulus), L)
        for j in range(K)
    ]
    # MXU fold rows: the exact integer 2**w * (beta^(L+j) mod M), whose
    # limbs (< 2**14, width L+1 — the w=12 shift crosses one limb) split
    # into two 7-bit int8 blocks.
    wrows = np.stack([
        hl.int_to_limbs(pow(1 << lm.LIMB_BITS, L + j, modulus) << w, L + 1)
        for w in (0, 6, 12)
        for j in range(K)
    ]).astype(np.uint32)
    digit_w = np.concatenate(
        [(wrows & 0x7F).astype(np.int8), (wrows >> 7).astype(np.int8)],
        axis=1,
    )
    return ReduceTable(
        powers=jnp.asarray(np.stack(rows)), digit_w=jnp.asarray(digit_w)
    )


def mod_reduce(x, ctx, table):
    """Partially reduce a wide value: [..., Lx] -> [..., L+1], value < 1.51*R.

    Folds every limb above position L through the precomputed
    beta^(L+j) mod M powers, twice (the second fold sees at most two
    over-limbs). The result is small enough for to_mont (value < R, with
    product against R^2 mod M staying under 16*M*R).

    The first (wide) fold rides the MXU as an int8 digit matmul: the
    over-limbs (<= 2**16, redundant headroom) split into three 6-bit
    planes d0,d1,d2 (< 64: int8-safe), and the table carries the exact
    shifted row integers 2**w * (beta^(L+j) mod M) as two 7-bit limb
    blocks, so sum_j high_j * powers[j] = dig[B,3K] @ rows[3K,2(L+1)] —
    one matmul instead of three uint32 VPU contractions (which cost
    ~15 ms per decrypt half at B=8192; the matmul is ~0.4M MACs/elem).
    Exactness: output planes c0,c1 sum 3K <= 1320 terms of 63*127
    < 2**23.4 (int32-exact); accumulator slots are
    low + c0 + (c1 << 7) < 2**16 + 2**23.4 + 2**30.4 < 2**31, inside
    carry_fix's soundness bound. Narrow folds (K <= 2 after the first
    pass) keep the uint32 einsum path.
    """
    L = ctx.num_limbs

    def fold(v):
        low = v[..., :L]
        high = v[..., L:]  # [..., K] limbs <= 2**16 (redundant headroom)
        K = high.shape[-1]
        if K >= 1024:
            # The 6-bit-part contraction below sums K terms of < 2**21
            # each; K >= 1024 would overflow the uint32 accumulator.
            raise ValueError(
                "mod_reduce fold of %d over-limbs would overflow uint32 "
                "(max 1023); reduce in stages" % K
            )
        nbatch = v.ndim - 1
        if 3 * K == table.digit_w.shape[0] and K >= 8:
            dig = jnp.concatenate(
                [
                    (high & 0x3F).astype(jnp.int8),
                    ((high >> 6) & 0x3F).astype(jnp.int8),
                    (high >> 12).astype(jnp.int8),
                ],
                axis=-1,
            )  # [..., 3K], every digit < 64
            out = jax.lax.dot_general(
                dig, table.digit_w,
                (((dig.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.uint32)  # [..., 2(L+1)]: lo | hi planes < 2**23.4
            c0, c1 = out[..., : L + 1], out[..., L + 1 :]
            acc = jnp.pad(low, [(0, 0)] * nbatch + [(0, 1)])
            return lm.carry_fix(acc + c0 + (c1 << 7))  # slots < 2**31
        acc = jnp.pad(low, [(0, 0)] * nbatch + [(0, 1)])  # [..., L+1]
        # sum_j high_j * powers[j] as three static uint32 contractions —
        # high split into 6-bit parts so each product is < 2**21 and a
        # K-term sum stays < 2**31 for K < 1024 (no loops, no dynamic
        # slices: the fold is a plain [K] x [K, L] integer matmul).
        # The table MUST be sliced to this fold's actual over-limb count:
        # jnp.einsum silently broadcasts a size-1 contraction dim against
        # the full table, which would sum every power row.
        powers = table.powers[:K]
        dot = lambda h: jnp.einsum(
            "...k,kl->...l", h, powers,
            preferred_element_type=jnp.uint32,
        )
        pad_lo = [(0, 0)] * nbatch + [(0, 1)]
        pad_hi = [(0, 0)] * nbatch + [(1, 0)]
        for w in (0, 6, 12):
            part = (high >> w) & 0x3F if w < 12 else high >> 12
            s = dot(part)  # [..., L], < 2**30
            # value(s) * 2**w folded into 14-bit slots; every addend is
            # < 2**27, keeping accumulator slots < 2**31 for carry_fix.
            acc = acc + jnp.pad((s & lm.LIMB_MASK) << w, pad_lo)
            acc = acc + jnp.pad((s >> lm.LIMB_BITS) << w, pad_hi)
        return lm.carry_fix(acc)  # [..., L+1]

    y = fold(x)  # value <= beta^L(1+eps) + K*2**16*M <= 2**8 * R
    y = fold(y)  # value <= beta^L(1+eps) + 2**16*M < 1.51 * R
    return y  # [..., L+1]; to_mont accepts this width and value bound
