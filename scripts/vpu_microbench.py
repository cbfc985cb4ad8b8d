"""Empirical VPU issue-rate calibration for the roofline model.

The round-3 roofline (phe_tpu/profiling.py) assumed one u32 multiply per
VPU lane-cycle (962 G mul/s on v5e) and counted ONLY multiplies. Both
halves are wrong in opposite directions: measured sustained u32 multiply
issue is ~0.65 T/s (multiply and add issue at the SAME rate — the binding
resource is elementwise op issue, not multiplier throughput), while mixed
multiply/add/shift/compare streams superscalar up to ~1.1-1.8 T op/s.
This script measures both on the attached chip; profiling.py's
`_MEASURED_VPU` table records the results.

Methodology: a Pallas kernel chains K serially-dependent elementwise ops
over a [256, 512] uint32 tile (131k lanes — full ILP within each step).
Two K values cancel the fixed dispatch/launch cost; the device is fenced
with jax.device_get (block_until_ready does not fence the tunnelled TPU
transport). Run:  python scripts/vpu_microbench.py
"""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

R, TB = 256, 512


def _mk(body, K):
    def kern(x_ref, o_ref):
        x = x_ref[:, :]
        o_ref[:, :] = jax.lax.fori_loop(0, K, lambda i, a: body(a, x), x)

    return jax.jit(
        pl.pallas_call(kern, out_shape=jax.ShapeDtypeStruct((R, TB), jnp.uint32))
    )


def bench(name, body, ops_per_iter, x):
    f_lo, f_hi = _mk(body, 4000), _mk(body, 32000)
    for f in (f_lo, f_hi):
        np.asarray(jax.device_get(f(x)))

    def t(f, n=8):
        t0 = time.perf_counter()
        for _ in range(n):
            r = f(x)
        np.asarray(jax.device_get(r))
        return (time.perf_counter() - t0) / n

    per_iter = (t(f_hi) - t(f_lo)) / (32000 - 4000)
    lane_rate = R * TB / per_iter
    print(
        "%-10s %7.2f ns/iter  %7.1f G lane-iter/s  %6.2f T op/s (%d op/iter)"
        % (name, per_iter * 1e9, lane_rate / 1e9, lane_rate * ops_per_iter / 1e12,
           ops_per_iter)
    )
    return lane_rate


def barrett(a, x):
    q = ((a >> 14) * x) >> 14
    r = a - q * x
    return jnp.where(r >= x, r - x, r)


def main():
    print("device:", jax.devices()[0].device_kind)
    x = jnp.asarray(np.random.randint(1, 1 << 14, (R, TB), np.uint32))
    mul = bench("mul", lambda a, b: a * b, 1, x)
    bench("add", lambda a, b: a + b, 1, x)
    bench("muladd", lambda a, b: a * b + b, 2, x)
    bench("shiftmul", lambda a, b: ((a >> 14) * b) >> 14, 3, x)
    mixed = bench("barrett", barrett, 7, x)
    print(
        "\ncalibration: vpu_u32_mul_per_s = %.3g, vpu_mixed_op_per_s = %.3g"
        % (mul, mixed * 7)
    )


if __name__ == "__main__":
    main()
