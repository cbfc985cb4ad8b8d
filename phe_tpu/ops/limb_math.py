"""Batched fixed-width big-integer arithmetic in base-2^14 limbs on uint32 lanes.

This is the device-side replacement for the reference's GMP backend
(phe/util.py:38-64 — powmod/mulmod are the only hot primitives): instead of
per-number C calls, whole batches of big integers live as ``uint32[..., L]``
tensors (least-significant limb first) and flow through vectorised
multiply / carry / Montgomery-reduce steps that XLA maps onto the TPU VPU.
Every function here is shape-polymorphic over leading (batch/group) dims.

Representation and bounds
=========================
A big integer is ``sum(limb[i] << (14 * i))`` with limbs held *redundantly*:
the invariant restored after every step is ``limb <= 2**14`` (one over the
canonical maximum 2**14 - 1). That makes a **fixed three-pass carry** sound:

* products: operand limbs <= 2**14 give partial products <= 2**28 < 2**32;
* schoolbook accumulation: an output slot receives at most 2L product
  halves, each <= 2**14, so slots stay < 2L * 2**14 < 2**31 for L < 2**16;
* carry pass 1 on slots < 2**31 leaves limbs < 2**14 + 2**17;
* pass 2 carries are <= 9, leaving limbs <= 2**14 + 8;
* pass 3 carries are <= 1, restoring limbs <= 2**14.

A sub-16-bit radix is what keeps products of two *redundant* limbs inside
uint32 (a 16-bit radix would need a full sequential normalisation between
steps); 14 bits specifically makes every limb exactly two 7-bit digits,
which is the exactness bound for the bf16 MXU matmuls in the Pallas REDC
path (products < 2**14, f32-accumulated over <= 2**9.3 terms < 2**24).

Carries out of the top limb are dropped by design: all callers bound the
represented value below the array's capacity, and with non-negative limbs
that forces the dropped carry to be zero (value < 2**(14*L) and
limb[L] >= 1 would contradict each other).

Montgomery usage (phe_tpu.ops.montgomery): L = ceil((bits + 16) / 14) always gives
the Montgomery radix R = 2**(14 L) at least 2**7 of headroom over the
modulus M, so the "no final subtraction" variant applies — chain values
stay < 2M with no data-dependent branches inside modexp (which also closes
the timing side channel the reference ignores). Normalisation to canonical
form happens only at boundaries (export / compare / decrypt windows).
"""

import jax
import jax.numpy as jnp
import numpy as np

LIMB_BITS = 14
LIMB_MASK = (1 << LIMB_BITS) - 1


def _shift_up(c):
    """Move a carry vector up one limb (c[i] contributes at position i+1)."""
    pad = [(0, 0)] * (c.ndim - 1) + [(1, 0)]
    return jnp.pad(c[..., :-1], pad)


def carry_pass(x):
    """One redistribute step: keep low 14 bits, push the rest up one limb."""
    return (x & LIMB_MASK) + _shift_up(x >> LIMB_BITS)


def carry_fix(x):
    """Restore the redundant invariant (limbs <= 2**14).

    Sound for any accumulator with limbs < 2**31 (all accumulators in this
    module are; see module docstring for the three-pass bound chain).
    """
    return carry_pass(carry_pass(carry_pass(x)))


def add(a, b):
    """Redundant add of equal-width limb arrays (limb sums <= 2**16)."""
    return carry_fix(a + b)


def diag_sum(m):
    """Anti-diagonal sums: [..., R, C] -> [..., R+C-1], out[k] = sum_i m[i, k-i].

    The polynomial-product gather, done with a static shear-reshape instead
    of per-diagonal slicing: pad each row with R zeros, flatten the last two
    axes, drop the final R elements and reshape to [R, C+R-1] — row i lands
    shifted right by i, so a plain sum over rows realigns every product
    m[i, j] onto output slot i+j. Pure static reshapes: no loops, no
    dynamic slices, compiles to straight-line VPU code.
    """
    batch = m.shape[:-2]
    R, C = m.shape[-2], m.shape[-1]
    if R == 1:
        return m[..., 0, :]
    p = jnp.pad(m, [(0, 0)] * len(batch) + [(0, 0), (0, R)])
    f = p.reshape(batch + (R * (C + R),))[..., : R * (C + R - 1)]
    return f.reshape(batch + (R, C + R - 1)).sum(axis=-2)


def mul_full(a, b):
    """Full schoolbook product: [..., La] x [..., Lb] -> [..., La+Lb].

    Batched independent big-int multiply: each leading-dim element
    multiplies its own (a, b) pair. One broadcast outer product gives every
    partial product at once (operand limbs <= 2**14 keep products < 2**28
    in uint32); the 14-bit halves are summed along anti-diagonals with the
    static shear of :func:`diag_sum`. Output slots receive at most
    2*min(La, Lb) halves of <= 2**14 each, staying under 2**31 for the one
    carry_fix at the end.

    Requires value(a) * value(b) < 2**(14 * (La + Lb)) (all callers keep
    values far below limb-array capacity).
    """
    nbatch = max(a.ndim, b.ndim) - 1
    outer = a[..., :, None] * b[..., None, :]  # [..., La, Lb]
    lo = diag_sum(outer & LIMB_MASK)  # contributes at slot i+j
    hi = diag_sum(outer >> LIMB_BITS)  # contributes at slot i+j+1
    acc = jnp.pad(lo, [(0, 0)] * nbatch + [(0, 1)]) + jnp.pad(
        hi, [(0, 0)] * nbatch + [(1, 0)]
    )
    return carry_fix(acc)


def mul_low(a, b, out_limbs):
    """Low ``out_limbs`` limbs of a*b: the product mod 2**(14*out_limbs).

    Used for the Montgomery quotient m = (T mod R) * M' mod R. Truncating
    the redundant full product keeps the value congruent mod R; the result
    may represent a value slightly above R (redundant headroom), which the
    Montgomery bound analysis in phe_tpu.ops.montgomery accounts for.
    """
    a = a[..., :out_limbs]
    b = b[..., :out_limbs]
    return mul_full(a, b)[..., :out_limbs]


def shift_right_limbs_exact(x, nlimbs):
    """Divide by R = 2**(14*nlimbs) when value(x) is an exact multiple of R.

    In redundant form the low limbs' partial sum S_low is a multiple of R
    (Montgomery invariant) and < 2R (limbs <= 2**14), hence S_low is 0 or
    exactly R: the carry into the high half is 1 iff any low limb is
    non-zero.
    """
    low = x[..., :nlimbs]
    high = x[..., nlimbs:]
    carry = jnp.any(low != 0, axis=-1).astype(jnp.uint32)
    return carry_fix(high.at[..., 0].add(carry))


def normalize(x):
    """Fully propagate carries to canonical limbs (<= 2**14 - 1).

    Boundary-only helper (export, compare, decode windows); Montgomery
    chains stay redundant. while_loop until stable — expected 2-3 trips,
    worst case one per limb for a +1 ripple through 0x7fff runs.
    """
    return jax.lax.while_loop(
        lambda s: jnp.any(s > LIMB_MASK), carry_pass, x
    )


def pack_bytes(x):
    """Canonical limbs [..., L] -> little-endian bytes [..., ceil(14L/8)].

    Device-side base conversion so the host can rebuild Python ints with
    one C-speed int.from_bytes per row instead of a per-limb Horner loop.
    Byte j covers bits [8j, 8j+8), spanning at most two 14-bit limbs; the
    source indices and shifts are static arrays, so this is two gathers
    and a shift-or. Input must be canonical (limbs <= 2**14 - 1).
    """
    L = x.shape[-1]
    nbytes = (LIMB_BITS * L + 7) // 8
    j = np.arange(nbytes)
    a = (8 * j) // LIMB_BITS
    s = jnp.asarray(((8 * j) % LIMB_BITS).astype(np.uint32))
    hi_ok = jnp.asarray((a + 1 < L).astype(np.uint32))
    lo = jnp.take(x, jnp.asarray(a), axis=-1) >> s
    hi = jnp.take(x, jnp.asarray(np.minimum(a + 1, L - 1)), axis=-1) * hi_ok
    return ((lo | (hi << (LIMB_BITS - s))) & 0xFF).astype(jnp.uint8)


def unpack_bytes(buf, num_limbs):
    """Little-endian bytes [..., nbytes] -> limbs [..., num_limbs] on device.

    The device-side inverse of utils.limbs.bytes_to_limbs: limb j covers
    bits [14j, 14j+14), spanning at most three bytes — three static
    gathers, a shift and a mask. Lets hosts ship values (messages,
    blinding entropy) at 1 byte per 8 bits instead of 4 bytes per 14 bits
    — a 2.3x cut in host->device transfer, which dominates over a
    tunnelled TPU link. Bits beyond the requested limbs are ignored.
    """
    nbytes = buf.shape[-1]
    need = (LIMB_BITS * num_limbs + 7) // 8 + 2
    if nbytes < need:
        buf = jnp.pad(buf, [(0, 0)] * (buf.ndim - 1) + [(0, need - nbytes)])
    j = np.arange(num_limbs)
    o = (LIMB_BITS * j) // 8
    s = jnp.asarray(((LIMB_BITS * j) % 8).astype(np.uint32))
    b = buf.astype(jnp.uint32)
    word = (
        jnp.take(b, jnp.asarray(o), axis=-1)
        | (jnp.take(b, jnp.asarray(o + 1), axis=-1) << 8)
        | (jnp.take(b, jnp.asarray(o + 2), axis=-1) << 16)
    )
    return (word >> s) & LIMB_MASK


def cond_sub(x, m_complement, m_width):
    """Map canonical x < 2M into [0, M): subtract M once if x >= M.

    Branch-free via the radix complement: with comp = R - M (host
    precomputed, canonical limbs), s = x + comp < 2R, and after
    normalisation over m_width+1 limbs the top limb is 1 iff x >= M, in
    which case the low limbs are exactly x - M.

    Args:
      x: canonical limbs [..., m_width], value < 2M.
      m_complement: canonical limbs [m_width] (broadcastable), R - M.
      m_width: number of limbs L with R = 2**(14 L).
    """
    nbatch = x.ndim - 1
    widen = [(0, 0)] * nbatch + [(0, 1)]
    s = jnp.pad(x, widen) + jnp.pad(
        jnp.broadcast_to(m_complement, x.shape), widen
    )
    s = normalize(s)
    ge = s[..., m_width] >= 1
    return jnp.where(ge[..., None], s[..., :m_width], x)
