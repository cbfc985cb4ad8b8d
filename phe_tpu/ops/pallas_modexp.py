"""Pallas TPU kernel: fully VMEM-resident windowed Montgomery modexp.

This is the production hot kernel replacing the reference's GMP ``powmod``
(phe/util.py:38-50) for the batched device paths: encryption obfuscation
``r^n mod n^2`` (phe/paillier.py:136-139) and CRT decryption
``c^(p-1) mod p^2`` / ``c^(q-1) mod q^2`` (phe/paillier.py:346-353) — all
"shared exponent, per-element base" modexps.

Design (TPU-first, not a GMP translation):

* **Sublane-major layout.** A batch tile of bignums lives as
  ``uint32[L, TB]``: limbs down the sublane axis, batch elements across the
  128-wide lane axis. Every schoolbook step is then a full-width vector
  multiply-accumulate into a sublane-offset window of a VMEM accumulator —
  no lane shuffles, no [B, L, L] outer-product tensors, no HBM traffic
  between Montgomery steps (the XLA formulation in
  phe_tpu.ops.montgomery materialises exactly those, which is why it runs
  memory-bound and falls over at large batches).
* **Redundant base-2^14 limbs** as in phe_tpu.ops.limb_math: limbs carried
  at <= 2**14, products of redundant limbs fit uint32, and a schoolbook
  accumulator slot absorbs <= 2*min(La,Lb) 14-bit halves (< 2**25) before
  one three-pass carry fix. Same subtraction-free Montgomery variant
  (R >= 2**16 * M, chain values < 1.01 M, no data-dependent branches — the
  kernel is constant-time with respect to both bases and exponent).
* **Whole modexp in one kernel.** The window table (2^w entries), the
  accumulator and the wide product stay in VMEM scratch across all
  ~bits/w windows; HBM sees one [L, TB] read of the bases and one [L, TB]
  write of the result per batch tile.
* **REDC fused into the accumulator**: the ``m_q * M`` product is
  multiply-accumulated straight into the wide product (slots < 2**26),
  saving a buffer and a full-width add.
* **REDC on the MXU.** Both inner REDC products have a *key-constant*
  operand (M' and M), so each is a constant-matrix product over the other
  operand's 7-bit digits: ``q = W_M' @ digits(t_low)`` and
  ``qM = W_M @ digits(q)`` run as uint8 matmuls with exact int32
  accumulation (see montgomery._build_redc_matrices). That moves two of the three
  schoolbook O(L^2) limb products per Montgomery multiply off the VPU
  onto the systolic array; only the data-dependent ``a*b`` stays on the
  VPU. Enabled whenever the context carries the matrices
  (montgomery.build_context(mxu=True), the default).
* Mutation happens only through scratch refs (Mosaic has no lowering for
  ``dynamic_update_slice``/``scatter`` on values).

Interpret mode runs the identical kernel on CPU for the test suite.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phe_tpu.ops import limb_math as lm

LANES = 128


def _interpret():
    return jax.default_backend() != "tpu"


def _carry_fix_cols(x, passes=3):
    """Carry restore on [W, TB] columns (slots < 2**31 -> limbs <= 2**14)."""
    zero = jnp.zeros_like(x[:1])
    for _ in range(passes):
        hi = x >> lm.LIMB_BITS
        x = (x & lm.LIMB_MASK) + jnp.concatenate([zero, hi[:-1]], axis=0)
    return x


def _mul_into(t_ref, a_ref, b, La, accumulate=False, fix=True):
    """Schoolbook multiply-accumulate: t_ref[0:La+Lb] (+)= a_ref[0:La] * b.

    a_ref: scratch/input ref holding the dynamically-indexed operand
      (limbs <= 2**14).
    b: [Lb, TB] value operand (limbs <= 2**14).
    Four limbs of ``a`` per fori_loop step: the four raw products
    (each < 2**28) are aligned with a padded tree-add into a [Lb+3, TB]
    window (slots < 2**30), split once into 14-bit halves, and written
    with one read-modify-write of a [Lb+4, TB] window at sublane offset
    4i — a ~2x cut in VPU passes versus one limb per step. Slot growth
    in t: a slot receives <= La/4 (lo <= 2**14) + (hi <= 2**16) pairs,
    < 2**23 total on top of the existing contents — callers keep totals
    < 2**31. Requires La % 4 == 0 (all callers use L, a multiple of 8).
    """
    Lb, TB = b.shape
    zrow = jnp.zeros((1, TB), jnp.uint32)
    if not accumulate:
        t_ref[0 : La + Lb, :] = jnp.zeros((La + Lb, TB), jnp.uint32)

    def body(i4, _):
        a4 = a_ref[pl.ds(4 * i4, 4), :]  # [4, TB]
        p = [a4[j : j + 1, :] * b for j in range(4)]  # 4 x [Lb, TB] < 2**28
        z2 = jnp.zeros((2, TB), jnp.uint32)
        s01 = jnp.concatenate([p[0], zrow], 0) + jnp.concatenate([zrow, p[1]], 0)
        s23 = jnp.concatenate([p[2], zrow], 0) + jnp.concatenate([zrow, p[3]], 0)
        acc = jnp.concatenate([s01, z2], 0) + jnp.concatenate([z2, s23], 0)
        # acc: [Lb+3, TB], slots < 2**30; one split into 14-bit halves.
        contrib = jnp.concatenate(
            [acc & lm.LIMB_MASK, zrow], 0
        ) + jnp.concatenate([zrow, acc >> lm.LIMB_BITS], 0)  # [Lb+4, TB]
        t_ref[pl.ds(4 * i4, Lb + 4), :] = (
            t_ref[pl.ds(4 * i4, Lb + 4), :] + contrib
        )
        return 0

    jax.lax.fori_loop(0, La // 4, body, 0)
    if fix:
        t_ref[0 : La + Lb, :] = _carry_fix_cols(t_ref[0 : La + Lb, :])


def _digits_i8(x):
    """[W, TB] limbs <= 2**14 -> [2W, TB] int8 block-order digits, biased.

    Rows [0:W] are the low 7 bits (<= 127). Rows [W:2W] are the high bits
    MINUS 64: redundant limbs can hit 2**14, making the raw high digit
    128, and the MXU's 8-bit path is signed (it wraps 128 to -128, even
    for nominally-uint8 operands) — so high digits are carried biased in
    [-64, 64] and the matmul output is restored with the context's
    precomputed compensation vector (montgomery._build_redc_matrices).
    """
    lo = (x & 0x7F).astype(jnp.int32)
    hi = (x >> 7).astype(jnp.int32) - 64
    return jnp.concatenate([lo, hi], axis=0).astype(jnp.int8)


def _undigit(d, comp, W):
    """int32 [2W, TB] biased digit sums -> uint32 [W, TB] slots.

    comp: int32 [2W] bias compensation (64 * high-digit column sums);
    d + comp is the exact non-negative digit sum <= 2L * 127 * 128
    = 2L * 2**14, so slots stay <= 2L * 2**14 * 129, inside the < 2**31
    three-pass carry-fix bound for L <= 507 (enforced by
    montgomery._build_redc_matrices; larger geometries use the VPU path).
    """
    u = (d + comp[:, None]).astype(jnp.uint32)
    return u[:W] + (u[W:] << 7)


def _redc_tail(t2l, L, TB, out_write):
    """Shared REDC tail: t2l = t + q*M (slots < 2**31) -> out = t2l / R."""
    u = _carry_fix_cols(t2l)
    low, high = u[:L], u[L:]
    # Exact /R: the low half's value is a multiple of R and < 2R, so the
    # carry into the high half is 1 iff any low limb is non-zero.
    carry = jnp.any(low != 0, axis=0, keepdims=True).astype(jnp.uint32)
    high = high + jnp.concatenate(
        [carry, jnp.zeros((L - 1, TB), jnp.uint32)], axis=0
    )
    out_write(_carry_fix_cols(high))


def _mont_mul_into(out_write, a_ref, b, m, mp, t_ref, w_ref, mx=None):
    """out = REDC(a * b): Montgomery product via two VMEM scratch buffers.

    out_write: callable consuming the [L, TB] result (written via the
      caller's ref so the result can land in the accumulator, the table, or
      the kernel output without an extra copy).
    a_ref: ref with the left operand in limbs [0:L] (<= 2**14 each).
    b: [L, TB] value, right operand.
    mx: optional (wq, wm, cq, cm) — the int8 REDC constant matrices
      ([2L, 2L] and [4L, 2L]) and their int32 bias-compensation vectors
      (montgomery._build_redc_matrices). When present, both REDC products
      run as exact MXU matmuls over biased 7-bit digits; otherwise the
      VPU schoolbook loops are used.
    """
    L, TB = b.shape
    _mul_into(t_ref, a_ref, b, L)  # t = a*b, carry-fixed
    if mx is not None:
        wq, wm, cq, cm = mx
        # q = t_low * M' mod R on the MXU: constant-matrix product over
        # t_low's biased digits, int8 operands with exact int32 sums.
        qd = jax.lax.dot_general(
            wq,
            _digits_i8(t_ref[0:L, :]),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [2L, TB]
        q = _carry_fix_cols(_undigit(qd, cq, L))  # [L, TB] <= 2**14, q mod R
        # q*M on the MXU: [4L, 2L] @ digits(q) -> 2L limbs of the product.
        pd = jax.lax.dot_general(
            wm,
            _digits_i8(q),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )  # [4L, TB]
        t2l = t_ref[0 : 2 * L, :] + _undigit(pd, cm, 2 * L)
        _redc_tail(t2l, L, TB, out_write)
        return
    # m_q = (t mod R) * M' mod R: low L limbs of t[0:L] * mp.
    _mul_into(w_ref, t_ref, mp, L)  # w[0:2L] = t[0:L] * mp (only [0:L] used)
    # t += m_q * M, accumulated in place (slots < 2**25 + 2**14 < 2**26).
    _mul_into(t_ref, w_ref, m, L, accumulate=True, fix=False)
    _redc_tail(t_ref[0 : 2 * L, :], L, TB, out_write)


def _pow_kernel(digits_ref, base_ref, m_ref, mp_ref, one_ref, *rest, window, mxu):
    if mxu:
        wq_ref, wm_ref, cq_ref, cm_ref, out_ref, acc_ref, t_ref, tab_ref = rest
        w_ref = None
        mx = (wq_ref[:, :], wm_ref[:, :], cq_ref[:, 0], cm_ref[:, 0])
    else:
        out_ref, acc_ref, t_ref, w_ref, tab_ref = rest
        mx = None
    L, TB = base_ref.shape
    m = jnp.broadcast_to(m_ref[:, :], (L, TB))
    mp = jnp.broadcast_to(mp_ref[:, :], (L, TB))
    one = jnp.broadcast_to(one_ref[:, :], (L, TB)).astype(jnp.uint32)

    # Window table: tab[k] = base^k in Montgomery form.
    K = 2**window
    tab_ref[0] = one
    tab_ref[1] = base_ref[:, :]

    def build(k, _):
        def write(v):
            tab_ref[k] = v

        # tab[k] = tab[k-1] * base; acc_ref holds tab[k-1] as the
        # dynamically-indexed operand.
        acc_ref[:, :] = tab_ref[k - 1]
        _mont_mul_into(write, acc_ref, base_ref[:, :], m, mp, t_ref, w_ref, mx)
        return 0

    jax.lax.fori_loop(2, K, build, 0)

    acc_ref[:, :] = one
    n_windows = digits_ref.shape[0]

    def acc_write(v):
        acc_ref[:, :] = v

    # One flat loop of (window + 1) multiplies per exponent window — j <
    # window is a squaring, j == window multiplies in the table factor.
    # A single _mont_mul_into instance in the loop body keeps Mosaic's
    # scoped-VMEM footprint at one multiply's worth of temporaries (the
    # unrolled form OOMs the 16M scoped limit with the MXU temporaries).
    def step(i, _):
        wi, j = i // (window + 1), i % (window + 1)
        factor = tab_ref[digits_ref[wi]]
        b = jnp.where(j < window, acc_ref[:, :], factor)
        _mont_mul_into(acc_write, acc_ref, b, m, mp, t_ref, w_ref, mx)
        return 0

    jax.lax.fori_loop(0, n_windows * (window + 1), step, 0)
    out_ref[:, :] = acc_ref[:, :]


@functools.partial(jax.jit, static_argnames=("window", "tb"))
def mont_pow_shared_cols(base_cols, digits, ctx, window=4, tb=LANES):
    """Windowed modexp over column-major bases, one shared exponent.

    Args:
      base_cols: uint32[L, B] Montgomery-domain bases, limbs on the sublane
        axis (L must be a multiple of 8; use a context built with padded
        limb count).
      digits: int32[n_windows] MSB-first base-2**window exponent digits.
      ctx: montgomery.MontgomeryContext for the modulus.
    Returns uint32[L, B] of base^e * R mod M (redundant form, < 1.01 M).
    """
    L, B = base_cols.shape
    if L % 8:
        raise ValueError("limb count must be padded to a multiple of 8")
    if B == 0:  # empty batch: x^e over zero elements (grid would be empty)
        return base_cols
    pad = (-B) % tb
    if pad:
        base_cols = jnp.pad(base_cols, ((0, 0), (0, pad)))
    Bp = base_cols.shape[1]
    mxu = ctx.w_mq is not None
    in_specs = [
        pl.BlockSpec((L, tb), lambda i, _: (0, i)),
        pl.BlockSpec((L, 1), lambda i, _: (0, 0)),
        pl.BlockSpec((L, 1), lambda i, _: (0, 0)),
        pl.BlockSpec((L, 1), lambda i, _: (0, 0)),
    ]
    inputs = [base_cols, ctx.m[:, None], ctx.m_prime[:, None], ctx.one[:, None]]
    scratch = [
        pltpu.VMEM((L, tb), jnp.uint32),  # acc
        pltpu.VMEM((2 * L, tb), jnp.uint32),  # wide product
    ]
    if mxu:
        in_specs += [
            pl.BlockSpec((2 * L, 2 * L), lambda i, _: (0, 0)),
            pl.BlockSpec((4 * L, 2 * L), lambda i, _: (0, 0)),
            pl.BlockSpec((2 * L, 1), lambda i, _: (0, 0)),
            pl.BlockSpec((4 * L, 1), lambda i, _: (0, 0)),
        ]
        inputs += [ctx.w_mq, ctx.w_m, ctx.c_mq[:, None], ctx.c_m[:, None]]
    else:
        scratch.append(pltpu.VMEM((2 * L, tb), jnp.uint32))  # m_q scratch
    scratch.append(pltpu.VMEM((2**window, L, tb), jnp.uint32))  # window table
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((L, tb), lambda i, _: (0, i)),
        scratch_shapes=scratch,
    )
    out = pl.pallas_call(
        functools.partial(_pow_kernel, window=window, mxu=mxu),
        out_shape=jax.ShapeDtypeStruct((L, Bp), jnp.uint32),
        grid_spec=grid_spec,
        # The window table is 2^w * L * tb * 4 bytes of scratch — 19 MB
        # at the 8192-bit-key geometry (L=1176, window 5), past Mosaic's
        # default 16 MB scoped-VMEM ceiling; raise it as pallas_rns does.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=_interpret(),
    )(jnp.asarray(digits, jnp.int32), *inputs)
    return out[:, :B]


def mont_pow_shared(base, digits, ctx, window=4, tb=LANES):
    """Row-major convenience wrapper: [B, L] in, [B, L] out."""
    out = mont_pow_shared_cols(base.T, digits, ctx, window=window, tb=tb)
    return out.T


# -- single Montgomery multiply (homomorphic add / ciphertext product) -------


def _mul_kernel(a_ref, b_ref, m_ref, mp_ref, *rest, mxu, b_const=False):
    if mxu:
        wq_ref, wm_ref, cq_ref, cm_ref, out_ref, t_ref = rest
        w_ref = None
        mx = (wq_ref[:, :], wm_ref[:, :], cq_ref[:, 0], cm_ref[:, 0])
    else:
        out_ref, t_ref, w_ref = rest
        mx = None
    L, TB = a_ref.shape
    m = jnp.broadcast_to(m_ref[:, :], (L, TB))
    mp = jnp.broadcast_to(mp_ref[:, :], (L, TB))
    b = jnp.broadcast_to(b_ref[:, :], (L, TB)) if b_const else b_ref[:, :]

    def write(v):
        out_ref[:, :] = v

    _mont_mul_into(write, a_ref, b, m, mp, t_ref, w_ref, mx)


@functools.partial(jax.jit, static_argnames=("tb",))
def mont_mul_cols(a_cols, b_cols, ctx, tb=LANES):
    """Batched Montgomery product a*b*R^-1 mod M over [L, B] columns.

    One VMEM-resident multiply per batch tile: the reference's
    ciphertext-add ``mulmod(c_a, c_b, n^2)`` (phe/paillier.py:705-719)
    runs as this single kernel instead of an HBM-bound [B, L, L] einsum.
    """
    L, B = a_cols.shape
    if B == 0:
        return a_cols
    pad = (-B) % tb
    if pad:
        a_cols = jnp.pad(a_cols, ((0, 0), (0, pad)))
        b_cols = jnp.pad(b_cols, ((0, 0), (0, pad)))
    Bp = a_cols.shape[1]
    mxu = ctx.w_mq is not None
    in_specs = [
        pl.BlockSpec((L, tb), lambda i: (0, i)),
        pl.BlockSpec((L, tb), lambda i: (0, i)),
        pl.BlockSpec((L, 1), lambda i: (0, 0)),
        pl.BlockSpec((L, 1), lambda i: (0, 0)),
    ]
    inputs = [a_cols, b_cols, ctx.m[:, None], ctx.m_prime[:, None]]
    scratch = [pltpu.VMEM((2 * L, tb), jnp.uint32)]
    if mxu:
        in_specs += [
            pl.BlockSpec((2 * L, 2 * L), lambda i: (0, 0)),
            pl.BlockSpec((4 * L, 2 * L), lambda i: (0, 0)),
            pl.BlockSpec((2 * L, 1), lambda i: (0, 0)),
            pl.BlockSpec((4 * L, 1), lambda i: (0, 0)),
        ]
        inputs += [ctx.w_mq, ctx.w_m, ctx.c_mq[:, None], ctx.c_m[:, None]]
    else:
        scratch.append(pltpu.VMEM((2 * L, tb), jnp.uint32))
    out = pl.pallas_call(
        functools.partial(_mul_kernel, mxu=mxu),
        out_shape=jax.ShapeDtypeStruct((L, Bp), jnp.uint32),
        grid=(Bp // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((L, tb), lambda i: (0, i)),
        scratch_shapes=scratch,
        # Raised scoped-VMEM ceiling: big-key geometries (L ~ 1176 at
        # 8192-bit keys) exceed the 16 MB default with the MXU REDC
        # matrices (and the window table, for the vec-pow kernel).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=_interpret(),
    )(*inputs)
    return out[:, :B]


def mont_mul(a, b, ctx, tb=LANES):
    """Row-major convenience wrapper: [B, L] x [B, L] -> [B, L]."""
    return mont_mul_cols(a.T, b.T, ctx, tb=tb).T


@functools.partial(jax.jit, static_argnames=("tb",))
def mont_mul_const_cols(a_cols, b_limbs, ctx, tb=LANES):
    """Batched Montgomery product against one shared operand.

    a_cols: [L, B] columns; b_limbs: [L] canonical limbs shared across the
    batch (e.g. R^2 for to_mont, n*R^2 mod n^2 for the (n*m+1) encryption
    prologue). One VMEM-resident kernel instead of the XLA [B, L, L]
    outer-product formulation.
    """
    L, B = a_cols.shape
    if B == 0:
        return a_cols
    pad = (-B) % tb
    if pad:
        a_cols = jnp.pad(a_cols, ((0, 0), (0, pad)))
    Bp = a_cols.shape[1]
    mxu = ctx.w_mq is not None
    in_specs = [
        pl.BlockSpec((L, tb), lambda i: (0, i)),
        pl.BlockSpec((L, 1), lambda i: (0, 0)),
        pl.BlockSpec((L, 1), lambda i: (0, 0)),
        pl.BlockSpec((L, 1), lambda i: (0, 0)),
    ]
    inputs = [a_cols, b_limbs[:, None], ctx.m[:, None], ctx.m_prime[:, None]]
    scratch = [pltpu.VMEM((2 * L, tb), jnp.uint32)]
    if mxu:
        in_specs += [
            pl.BlockSpec((2 * L, 2 * L), lambda i: (0, 0)),
            pl.BlockSpec((4 * L, 2 * L), lambda i: (0, 0)),
            pl.BlockSpec((2 * L, 1), lambda i: (0, 0)),
            pl.BlockSpec((4 * L, 1), lambda i: (0, 0)),
        ]
        inputs += [ctx.w_mq, ctx.w_m, ctx.c_mq[:, None], ctx.c_m[:, None]]
    else:
        scratch.append(pltpu.VMEM((2 * L, tb), jnp.uint32))
    out = pl.pallas_call(
        functools.partial(_mul_kernel, mxu=mxu, b_const=True),
        out_shape=jax.ShapeDtypeStruct((L, Bp), jnp.uint32),
        grid=(Bp // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((L, tb), lambda i: (0, i)),
        scratch_shapes=scratch,
        # Raised scoped-VMEM ceiling: big-key geometries (L ~ 1176 at
        # 8192-bit keys) exceed the 16 MB default with the MXU REDC
        # matrices (and the window table, for the vec-pow kernel).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=_interpret(),
    )(*inputs)
    return out[:, :B]


def mont_mul_const(a, b_limbs, ctx, tb=LANES):
    """Row-major wrapper: [B, L] x shared [L] -> [B, L]."""
    return mont_mul_const_cols(a.T, b_limbs, ctx, tb=tb).T


# -- per-element exponents (scalar multiply / exponent alignment) ------------


def _pow_vec_kernel(
    digits_ref, base_ref, m_ref, mp_ref, one_ref, *rest, window, mxu,
):
    """Windowed modexp with a per-element (per-lane) exponent.

    digits_ref: [n_windows, TB] int32 — each lane carries its own MSB-first
    digit schedule. The table factor is selected lane-wise with a one-hot
    sum over the 2**window entries: constant-time in the exponent and free
    of gathers (the reference's pow() leaks exponent timing;
    docs/caveats.rst ignores it, here uniformity falls out of SIMD).
    """
    if mxu:
        wq_ref, wm_ref, cq_ref, cm_ref, out_ref, acc_ref, t_ref, tab_ref = rest
        w_ref = None
        mx = (wq_ref[:, :], wm_ref[:, :], cq_ref[:, 0], cm_ref[:, 0])
    else:
        out_ref, acc_ref, t_ref, w_ref, tab_ref = rest
        mx = None
    L, TB = base_ref.shape
    m = jnp.broadcast_to(m_ref[:, :], (L, TB))
    mp = jnp.broadcast_to(mp_ref[:, :], (L, TB))
    one = jnp.broadcast_to(one_ref[:, :], (L, TB)).astype(jnp.uint32)

    K = 2**window
    tab_ref[0] = one
    tab_ref[1] = base_ref[:, :]

    def build(k, _):
        def write(v):
            tab_ref[k] = v

        acc_ref[:, :] = tab_ref[k - 1]
        _mont_mul_into(write, acc_ref, base_ref[:, :], m, mp, t_ref, w_ref, mx)
        return 0

    jax.lax.fori_loop(2, K, build, 0)

    acc_ref[:, :] = one
    n_windows = digits_ref.shape[0]

    def acc_write(v):
        acc_ref[:, :] = v

    # Flat (window + 1)-multiply loop as in _pow_kernel: one multiply
    # instance bounds the scoped-VMEM temporaries.
    def step(i, _):
        wi, j = i // (window + 1), i % (window + 1)
        d = digits_ref[pl.ds(wi, 1), :]  # [1, TB]
        factor = jnp.zeros((L, TB), jnp.uint32)
        for k in range(K):
            sel = (d == k).astype(jnp.uint32)  # [1, TB]
            factor = factor + tab_ref[k] * sel
        b = jnp.where(j < window, acc_ref[:, :], factor)
        _mont_mul_into(acc_write, acc_ref, b, m, mp, t_ref, w_ref, mx)
        return 0

    jax.lax.fori_loop(0, n_windows * (window + 1), step, 0)
    out_ref[:, :] = acc_ref[:, :]


@functools.partial(jax.jit, static_argnames=("window", "tb"))
def mont_pow_cols(base_cols, digits_cols, ctx, window=4, tb=LANES):
    """Per-element-exponent windowed modexp over [L, B] columns.

    digits_cols: int32[n_windows, B] MSB-first digit schedules (one column
    per element). Padded lanes use the schedule of exponent 1.
    """
    L, B = base_cols.shape
    if L % 8:
        raise ValueError("limb count must be padded to a multiple of 8")
    if B == 0:
        return base_cols
    pad = (-B) % tb
    if pad:
        base_cols = jnp.pad(base_cols, ((0, 0), (0, pad)))
        # exponent 1 schedule for pad lanes: all-zero windows then 1.
        pad_digits = jnp.zeros((digits_cols.shape[0], pad), jnp.int32)
        pad_digits = pad_digits.at[-1, :].set(1)
        digits_cols = jnp.concatenate(
            [jnp.asarray(digits_cols, jnp.int32), pad_digits], axis=1
        )
    Bp = base_cols.shape[1]
    mxu = ctx.w_mq is not None
    in_specs = [
        pl.BlockSpec((digits_cols.shape[0], tb), lambda i: (0, i)),
        pl.BlockSpec((L, tb), lambda i: (0, i)),
        pl.BlockSpec((L, 1), lambda i: (0, 0)),
        pl.BlockSpec((L, 1), lambda i: (0, 0)),
        pl.BlockSpec((L, 1), lambda i: (0, 0)),
    ]
    inputs = [
        jnp.asarray(digits_cols, jnp.int32),
        base_cols,
        ctx.m[:, None],
        ctx.m_prime[:, None],
        ctx.one[:, None],
    ]
    scratch = [
        pltpu.VMEM((L, tb), jnp.uint32),
        pltpu.VMEM((2 * L, tb), jnp.uint32),
    ]
    if mxu:
        in_specs += [
            pl.BlockSpec((2 * L, 2 * L), lambda i: (0, 0)),
            pl.BlockSpec((4 * L, 2 * L), lambda i: (0, 0)),
            pl.BlockSpec((2 * L, 1), lambda i: (0, 0)),
            pl.BlockSpec((4 * L, 1), lambda i: (0, 0)),
        ]
        inputs += [ctx.w_mq, ctx.w_m, ctx.c_mq[:, None], ctx.c_m[:, None]]
    else:
        scratch.append(pltpu.VMEM((2 * L, tb), jnp.uint32))
    scratch.append(pltpu.VMEM((2**window, L, tb), jnp.uint32))
    out = pl.pallas_call(
        functools.partial(_pow_vec_kernel, window=window, mxu=mxu),
        out_shape=jax.ShapeDtypeStruct((L, Bp), jnp.uint32),
        grid=(Bp // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((L, tb), lambda i: (0, i)),
        scratch_shapes=scratch,
        # Raised scoped-VMEM ceiling: big-key geometries (L ~ 1176 at
        # 8192-bit keys) exceed the 16 MB default with the MXU REDC
        # matrices (and the window table, for the vec-pow kernel).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=_interpret(),
    )(*inputs)
    return out[:, :B]


def mont_pow(base, digits, ctx, window=4, tb=LANES):
    """Row-major wrapper: base [B, L], digits [B, n_windows] -> [B, L]."""
    out = mont_pow_cols(base.T, digits.T, ctx, window=window, tb=tb)
    return out.T
