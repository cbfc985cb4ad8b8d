"""Pallas TPU kernel: VMEM-resident RNS Montgomery exponentiation ladder.

The XLA formulation of the RNS engine (phe_tpu.ops.rns) already runs its
base-extension matmuls on the MXU, but every Montgomery product round-trips
its [B, cpad] intermediates through HBM and fuses imperfectly. This kernel
keeps the whole windowed ladder — entry multiply, 2^w table, all
~bits/w * (w+1) Montgomery products, exit multiply — resident in VMEM per
batch tile: HBM sees one [cpad, TB] read of the input residues and one
[cpad, TB] write of the result.

Scope: residues in, residues out. The binary<->RNS conversions stay in XLA
(one digit matmul each per modexp — negligible, and keeping their large
constant matrices out of the kernel buys ~2 MB of VMEM). The Montgomery
product is algebraically identical to rns.rns_mont_mul (same constants,
same Barrett staging, same Shenoy-Kumaresan beta) transposed to
channel-major [cpad, TB] layout; tests pin the two bit-equal.

VMEM at the production geometry (N = n^2 of 4096 bits, k = 304,
cpad = 616, TB = 128, window 4): table 16 x 616 x 128 x 4 = 5.0 MB,
extension matrices 2 x ~0.57 MB int8, accumulator 0.32 MB, plus one
product's transients — ~8 MB, comfortably inside scoped VMEM.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from phe_tpu.ops import rns as _rns

LANES = 128


def _interpret():
    return jax.default_backend() != "tpu"


def _mod_cols(x, m, mu, steps=3):
    """Barrett on [R, TB] rows with [R, 1] constants (bounds: rns._mod).

    steps=3 covers every call site down to the M_MIN=4099 channel floor
    (per-site bound table in rns.py's module docstring).
    """
    q = ((x >> 14) * mu) >> 14
    r = x - q * m
    for s in range(steps - 1, -1, -1):
        step = m << s
        r = jnp.where(r >= step, r - step, r)
    return r


def _digits_cols(x):
    """[R, TB] canonical < 2^14 -> [2R, TB] int8 (lo block, hi block)."""
    lo = (x & 0x7F).astype(jnp.int8)
    hi = (x >> 7).astype(jnp.int8)
    return jnp.concatenate([lo, hi], axis=0)


def _ladder_kernel(
    digits_ref,
    x_ref,
    m_ref,
    mu_ref,
    t14_ref,
    sig1_ref,
    sig2_ref,
    d1_ref,
    d2_ref,
    e1_ref,
    negmb_ref,
    onedom_ref,
    r2dom_ref,
    exitc_ref,
    mbinv_ref,
    w1_ref,
    w2_ref,
    out_ref,
    acc_ref,
    tab_ref,
    *,
    window,
    k,
):
    C, TB = x_ref.shape
    K1 = (C - 2 * k) + k  # = k + spare rows: ext output row count
    m = m_ref[:, :]
    mu = mu_ref[:, :]
    t14 = t14_ref[:, :]
    sig1 = sig1_ref[:, :]
    sig2 = sig2_ref[:, :]
    d1 = d1_ref[:, :]
    d2 = d2_ref[:, :]
    e1 = e1_ref[:, :]
    negmb = negmb_ref[:, :]
    mbinv = mbinv_ref[:, :]
    w1 = w1_ref[:, :]
    w2 = w2_ref[:, :]
    m_r, mu_r = m[2 * k : 2 * k + 1], mu[2 * k : 2 * k + 1]
    # ext2 output rows are A u r u pads: their constants, prebuilt once.
    mi = jnp.concatenate([m[:k], m[2 * k :]], axis=0)
    mui = jnp.concatenate([mu[:k], mu[2 * k :]], axis=0)
    t14i = jnp.concatenate([t14[:k], t14[2 * k :]], axis=0)
    one = jnp.broadcast_to(onedom_ref[:, :], (C, TB)).astype(jnp.uint32)

    def dot(w, dig):
        return jax.lax.dot_general(
            w, dig, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def combine_raw(o, mm, mmu, tt14):
        c0 = o[:K1].astype(jnp.uint32)
        c1 = o[K1 : 2 * K1].astype(jnp.uint32)
        c2 = o[2 * K1 :].astype(jnp.uint32)
        e = _mod_cols(c2 + (c1 >> 7), mm, mmu)
        return c0 + ((c1 & 0x7F) << 7) + e * tt14

    def montmul(x, y):
        """rns.rns_mont_mul (fused tau-domain staging), channel-major."""
        raw = x * y  # < 2^28, consumed via the h/l split, never reduced
        hh = raw >> 14
        ll = raw & 0x3FFF
        sigma = _mod_cols(
            hh[:k] * sig2[:k] + ll[:k] * sig1[:k], m[:k], mu[:k]
        )
        qhat = _mod_cols(
            combine_raw(dot(w1, _digits_cols(sigma)), m[k:], mu[k:], t14[k:]),
            m[k:],
            mu[k:],
        )
        u_br = _mod_cols(
            hh[k:] * d2[k:] + ll[k:] * d1[k:] + qhat * e1[k:], m[k:], mu[k:]
        )
        # Stored B residues are tau: ext2 consumes them directly.
        s_raw = combine_raw(dot(w2, _digits_cols(u_br[:k])), mi, mui, t14i)
        s_r = _mod_cols(s_raw[k : k + 1], m_r, mu_r)
        beta = _mod_cols(
            (s_r + (m_r - u_br[k : k + 1])) * mbinv, m_r, mu_r
        )
        u_a = _mod_cols(s_raw[:k] + beta * negmb[:k], m[:k], mu[:k])
        return jnp.concatenate([u_a, u_br], axis=0)

    # Enter the Montgomery domain; seed the window table.
    xd = montmul(x_ref[:, :], jnp.broadcast_to(r2dom_ref[:, :], (C, TB)))
    tab_ref[0] = one
    tab_ref[1] = xd

    def build(j, _):
        tab_ref[j] = montmul(tab_ref[j - 1], xd)
        return 0

    jax.lax.fori_loop(2, 2**window, build, 0)

    acc_ref[:, :] = one
    n_windows = digits_ref.shape[0]

    # Flat (window + 1)-product loop: one montmul instance bounds the
    # scoped-VMEM transients and the lowered code size.
    def step(i, _):
        wi, j = i // (window + 1), i % (window + 1)
        b = jnp.where(j < window, acc_ref[:, :], tab_ref[digits_ref[wi]])
        acc_ref[:, :] = montmul(acc_ref[:, :], b)
        return 0

    jax.lax.fori_loop(0, n_windows * (window + 1), step, 0)
    # Leave the domain: multiply by the exit constant (the integer 1 by
    # default, or a per-key domain correction — see rns.pow_shared_xla).
    # An input ref, never an inline (C, TB) constant: inline constants
    # send the Mosaic compiler into a pathological (>400 s) loop.
    unit = jnp.broadcast_to(exitc_ref[:, :], (C, TB)).astype(jnp.uint32)
    out_ref[:, :] = montmul(acc_ref[:, :], unit)


@functools.partial(jax.jit, static_argnames=("window", "tb"))
def ladder_cols(x_res, digits, sys_, window=_rns.DEFAULT_WINDOW, tb=LANES,
                exit_res=None, entry_res=None):
    """Windowed RNS modexp over [cpad, B] residue columns, shared exponent.

    Returns [cpad, B] residues of x^e in plain (non-Montgomery) RNS form,
    value <= kN + 1. Padded lanes compute on residue columns of 0.
    exit_res / entry_res: optional [cpad] stored residues of the exit /
    domain-entry constants (see rns.pow_shared_xla); defaults are the
    integer 1 and M_A^2 mod N. The kernel is unchanged — the constants
    ride the existing exitc / r2dom input slots.
    """
    C, B = x_res.shape
    k = sys_.k
    pad = (-B) % tb
    if pad:
        x_res = jnp.pad(x_res, ((0, 0), (0, pad)))
    Bp = x_res.shape[1]
    col = lambda v: v[:, None]
    # Integer 1's stored residues are the scale vector (tau domain).
    exit_col = (
        col(sys_.scale) if exit_res is None else exit_res[:, None]
    )
    vec_specs = [pl.BlockSpec((C, 1), lambda i, _: (0, 0))] * 12
    in_specs = [pl.BlockSpec((C, tb), lambda i, _: (0, i))] + vec_specs + [
        pl.BlockSpec((1, 1), lambda i, _: (0, 0)),
        pl.BlockSpec(sys_.w_ext1.shape, lambda i, _: (0, 0)),
        pl.BlockSpec(sys_.w_ext2.shape, lambda i, _: (0, 0)),
    ]
    inputs = [
        x_res,
        col(sys_.m),
        col(sys_.mu),
        col(sys_.t14),
        col(sys_.sig1),
        col(sys_.sig2),
        col(sys_.d1),
        col(sys_.d2),
        col(sys_.e1),
        col(sys_.neg_mb),
        col(sys_.one_dom),
        col(sys_.r2_dom if entry_res is None else entry_res),
        exit_col,
        sys_.mbinv_r[:, None],
        sys_.w_ext1,
        sys_.w_ext2,
    ]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(Bp // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((C, tb), lambda i, _: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((C, tb), jnp.uint32),  # accumulator
            pltpu.VMEM((2**window, C, tb), jnp.uint32),  # window table
        ],
    )
    out = pl.pallas_call(
        functools.partial(_ladder_kernel, window=window, k=k),
        out_shape=jax.ShapeDtypeStruct((C, Bp), jnp.uint32),
        grid_spec=grid_spec,
        # The window table alone is 2^w * C * tb * 4 bytes (10.1 MB at the
        # 2048-bit-key geometry with window 5); raise Mosaic's default
        # 16 MB scoped-VMEM ceiling to fit table + matrices + transients.
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=_interpret(),
    )(jnp.asarray(digits, jnp.int32), *inputs)
    return out[:, :B]


def pow_shared_rows(x_limbs, digits, conv, sys_, window=_rns.DEFAULT_WINDOW,
                    exit_res=None, entry_res=None):
    """Row-major wrapper: binary limbs [B, Lin] -> binary limbs [B, out].

    XLA converts to residues, the Pallas kernel runs the ladder, XLA
    reconstructs binary limbs (rns.from_rns, incl. normalisation).
    """
    x_res = _rns.to_rns(x_limbs, conv, sys_)
    u = ladder_cols(
        x_res.T, digits, sys_, window=window, exit_res=exit_res,
        entry_res=entry_res,
    ).T
    return _rns.from_rns(u, sys_)


# -- per-element exponents (scalar multiply / exponent alignment) ------------


def _ladder_vec_kernel(
    digits_ref,
    x_ref,
    m_ref,
    mu_ref,
    t14_ref,
    sig1_ref,
    sig2_ref,
    d1_ref,
    d2_ref,
    e1_ref,
    negmb_ref,
    onedom_ref,
    r2dom_ref,
    exitc_ref,
    mbinv_ref,
    w1_ref,
    w2_ref,
    out_ref,
    acc_ref,
    tab_ref,
    *,
    window,
    k,
):
    """_ladder_kernel with a per-lane exponent (digits_ref: [n_windows, TB]).

    The table factor is selected lane-wise by a one-hot sum over the
    2**window entries (16 multiply-adds over [C, TB] per window) —
    constant-time in the exponent like the limb engine's variant
    (pallas_modexp._pow_vec_kernel), mirroring rns.pow_vec_xla.
    """
    C, TB = x_ref.shape
    K1 = (C - 2 * k) + k
    m = m_ref[:, :]
    mu = mu_ref[:, :]
    t14 = t14_ref[:, :]
    sig1 = sig1_ref[:, :]
    sig2 = sig2_ref[:, :]
    d1 = d1_ref[:, :]
    d2 = d2_ref[:, :]
    e1 = e1_ref[:, :]
    negmb = negmb_ref[:, :]
    mbinv = mbinv_ref[:, :]
    w1 = w1_ref[:, :]
    w2 = w2_ref[:, :]
    m_r, mu_r = m[2 * k : 2 * k + 1], mu[2 * k : 2 * k + 1]
    mi = jnp.concatenate([m[:k], m[2 * k :]], axis=0)
    mui = jnp.concatenate([mu[:k], mu[2 * k :]], axis=0)
    t14i = jnp.concatenate([t14[:k], t14[2 * k :]], axis=0)
    one = jnp.broadcast_to(onedom_ref[:, :], (C, TB)).astype(jnp.uint32)

    def dot(w, dig):
        return jax.lax.dot_general(
            w, dig, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    def combine_raw(o, mm, mmu, tt14):
        c0 = o[:K1].astype(jnp.uint32)
        c1 = o[K1 : 2 * K1].astype(jnp.uint32)
        c2 = o[2 * K1 :].astype(jnp.uint32)
        e = _mod_cols(c2 + (c1 >> 7), mm, mmu)
        return c0 + ((c1 & 0x7F) << 7) + e * tt14

    def montmul(x, y):
        raw = x * y
        hh = raw >> 14
        ll = raw & 0x3FFF
        sigma = _mod_cols(
            hh[:k] * sig2[:k] + ll[:k] * sig1[:k], m[:k], mu[:k]
        )
        qhat = _mod_cols(
            combine_raw(dot(w1, _digits_cols(sigma)), m[k:], mu[k:], t14[k:]),
            m[k:],
            mu[k:],
        )
        u_br = _mod_cols(
            hh[k:] * d2[k:] + ll[k:] * d1[k:] + qhat * e1[k:], m[k:], mu[k:]
        )
        s_raw = combine_raw(dot(w2, _digits_cols(u_br[:k])), mi, mui, t14i)
        s_r = _mod_cols(s_raw[k : k + 1], m_r, mu_r)
        beta = _mod_cols(
            (s_r + (m_r - u_br[k : k + 1])) * mbinv, m_r, mu_r
        )
        u_a = _mod_cols(s_raw[:k] + beta * negmb[:k], m[:k], mu[:k])
        return jnp.concatenate([u_a, u_br], axis=0)

    xd = montmul(x_ref[:, :], jnp.broadcast_to(r2dom_ref[:, :], (C, TB)))
    tab_ref[0] = one
    tab_ref[1] = xd

    def build(j, _):
        tab_ref[j] = montmul(tab_ref[j - 1], xd)
        return 0

    jax.lax.fori_loop(2, 2**window, build, 0)

    acc_ref[:, :] = one
    n_windows = digits_ref.shape[0]

    def step(i, _):
        wi, j = i // (window + 1), i % (window + 1)
        d = digits_ref[pl.ds(wi, 1), :]  # [1, TB] this element's digit
        # Constant-time table lookup as a binary select tree: `window`
        # levels of [C, TB] lane-selects keyed on digit bits — 2^w - 1
        # wheres versus 2^w (compare + multiply + add) triples for the
        # one-hot sum (~15% of the whole vec-ladder's lane-ops at
        # window 4). Every entry is still touched on every step:
        # constant-time in the exponent, like the one-hot form, and the
        # result is exactly tab[d] (bit-equal to rns.pow_vec_xla).
        sel = [tab_ref[kk] for kk in range(2**window)]
        for bit in range(window):
            pick_hi = (d & (1 << bit)) != 0  # [1, TB]
            sel = [
                jnp.where(pick_hi, sel[2 * k + 1], sel[2 * k])
                for k in range(len(sel) // 2)
            ]
        b = jnp.where(j < window, acc_ref[:, :], sel[0])
        acc_ref[:, :] = montmul(acc_ref[:, :], b)
        return 0

    jax.lax.fori_loop(0, n_windows * (window + 1), step, 0)
    # Exit constant ref (integer 1's stored residues = the scale vector);
    # an input ref, not an inline constant — see _ladder_kernel's note.
    unit = jnp.broadcast_to(exitc_ref[:, :], (C, TB)).astype(jnp.uint32)
    out_ref[:, :] = montmul(acc_ref[:, :], unit)


@functools.partial(jax.jit, static_argnames=("window", "tb"))
def ladder_vec_cols(x_res, digits_cols, sys_, window=_rns.DEFAULT_WINDOW,
                    tb=LANES, exit_res=None, entry_res=None):
    """Windowed RNS modexp over [cpad, B] columns, per-element exponents.

    digits_cols: int32[n_windows, B] MSB-first digit schedules, one column
    per element. Returns [cpad, B] plain-RNS residues of x^e, <= kN + 1.
    Padded lanes run the schedule of exponent 1 (a no-op power).
    exit_res / entry_res: shared [cpad] stored residues of the exit /
    domain-entry constants (rns.pow_shared_xla semantics).
    """
    C, B = x_res.shape
    k = sys_.k
    pad = (-B) % tb
    if pad:
        x_res = jnp.pad(x_res, ((0, 0), (0, pad)))
        pad_digits = jnp.zeros((digits_cols.shape[0], pad), jnp.int32)
        pad_digits = pad_digits.at[-1, :].set(1)
        digits_cols = jnp.concatenate(
            [jnp.asarray(digits_cols, jnp.int32), pad_digits], axis=1
        )
    Bp = x_res.shape[1]
    col = lambda v: v[:, None]
    vec_specs = [pl.BlockSpec((C, 1), lambda i: (0, 0))] * 12
    in_specs = (
        [pl.BlockSpec((digits_cols.shape[0], tb), lambda i: (0, i))]
        + [pl.BlockSpec((C, tb), lambda i: (0, i))]
        + vec_specs
        + [
            pl.BlockSpec((1, 1), lambda i: (0, 0)),
            pl.BlockSpec(sys_.w_ext1.shape, lambda i: (0, 0)),
            pl.BlockSpec(sys_.w_ext2.shape, lambda i: (0, 0)),
        ]
    )
    inputs = [
        jnp.asarray(digits_cols, jnp.int32),
        x_res,
        col(sys_.m),
        col(sys_.mu),
        col(sys_.t14),
        col(sys_.sig1),
        col(sys_.sig2),
        col(sys_.d1),
        col(sys_.d2),
        col(sys_.e1),
        col(sys_.neg_mb),
        col(sys_.one_dom),
        col(sys_.r2_dom if entry_res is None else entry_res),
        col(sys_.scale if exit_res is None else exit_res),
        sys_.mbinv_r[:, None],
        sys_.w_ext1,
        sys_.w_ext2,
    ]
    out = pl.pallas_call(
        functools.partial(_ladder_vec_kernel, window=window, k=k),
        out_shape=jax.ShapeDtypeStruct((C, Bp), jnp.uint32),
        grid=(Bp // tb,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((C, tb), lambda i: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((C, tb), jnp.uint32),  # accumulator
            pltpu.VMEM((2**window, C, tb), jnp.uint32),  # window table
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        interpret=_interpret(),
    )(*inputs)
    return out[:, :B]


def pow_vec_rows(x_limbs, digits, conv, sys_, window=_rns.DEFAULT_WINDOW,
                 exit_res=None, entry_res=None):
    """Row-major per-element-exponent wrapper (rns.pow_vec's TPU target).

    x_limbs: [B, Lin] binary limbs (value < 2kN); digits: [B, n_windows]
    int32 MSB-first schedules, one row per element. Bit-equal to
    rns.pow_vec_xla (same integer representatives at every step).
    """
    x_res = _rns.to_rns(x_limbs, conv, sys_)
    u = ladder_vec_cols(x_res.T, digits.T, sys_, window=window,
                        exit_res=exit_res, entry_res=entry_res).T
    return _rns.from_rns(u, sys_)
