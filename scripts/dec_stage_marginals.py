"""In-program marginal costs of the fused RNS decrypt (TPU diagnostic).

Jits cumulative prefixes of the _decrypt_residue_rns pipeline and times
each at a production batch; successive differences attribute the fused
program's wall time to its stages. XLA re-fuses every prefix (and each
prefix pays one dispatch + an HBM write of its intermediate), so
marginals are approximate — their job is to locate the tens-of-ms
chunks, not to account microseconds.

    python scripts/dec_stage_marginals.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def t(fn, runs=5, warmup=2):
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn())
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fixed_key
    from phe_tpu import batch as bt
    from phe_tpu.batch import EncryptedBatch
    from phe_tpu.ops import limb_math as lm
    from phe_tpu.ops import montgomery as mg
    from phe_tpu.ops import pallas_rns, rns

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    pub, priv = _fixed_key(2048)
    dc = pub.device_context()
    pdc = priv.device_context()
    pk = pdc.consts
    half_p, half_q = pdc.rns_state()
    halves = [
        (pk.ctx_p, pk.red_p, pk.dp_digits, half_p, pk.ctx_hp,
         pk.cm_pinv_p, pk.hp_limbs),
        (pk.ctx_q, pk.red_q, pk.dq_digits, half_q, pk.ctx_hq,
         pk.cm_pinv_q, pk.hq_limbs),
    ]

    rng = np.random.default_rng(3)
    ct = EncryptedBatch.encrypt(
        pub, [float(v) for v in rng.uniform(-1e6, 1e6, B)]
    )
    jax.block_until_ready(ct.mont)

    STAGES = [
        "from_mont", "mod_reduce", "mont_entry", "to_rns", "ladder",
        "from_rns", "reduce_excess", "lfunction", "recombine", "pack",
    ]

    def prefix(stage):
        @jax.jit
        def f(ct_mont):
            plain = mg.from_mont(ct_mont, dc.ctx)
            if stage == 0:
                return plain
            outs = []
            for ctx2, red, ddig, (rsys, conv, ers, red2), ctxh, pinv, h in halves:
                x = mg.mod_reduce(plain, ctx2, red)
                if stage == 1:
                    outs.append(x)
                    continue
                L2 = ctx2.num_limbs
                xm = lm.add(
                    mg.mont_mul_const(x[..., :L2], ctx2.r2, ctx2),
                    x[..., L2:] * jnp.broadcast_to(
                        ctx2.r2, x[..., :L2].shape
                    ),
                )
                if stage == 2:
                    outs.append(xm)
                    continue
                xr = rns.to_rns(xm, conv, rsys)
                if stage == 3:
                    outs.append(xr)
                    continue
                u = pallas_rns.ladder_cols(
                    xr.T, ddig, rsys, window=bt.DECRYPT_WINDOW,
                    exit_res=ers,
                ).T
                if stage == 4:
                    outs.append(u)
                    continue
                wide = rns.from_rns(u, rsys)
                if stage == 5:
                    outs.append(wide)
                    continue
                xc = bt._fit_limbs(mg.reduce_excess(wide, red2), L2)
                if stage == 6:
                    outs.append(xc)
                    continue
                outs.append(bt._lfunction_half(xc, ctxh, pinv, h))
            if stage <= 7:
                return tuple(outs)
            m = bt._crt_recombine(outs[0], outs[1], pk)
            if stage == 8:
                return m
            return lm.pack_bytes(m)

        return f

    print("B = %d (each row: cumulative prefix; marginal = delta)" % B,
          flush=True)
    prev = 0.0
    for i, name in enumerate(STAGES):
        f = prefix(i)
        dt = t(functools.partial(f, ct.mont)) * 1e3
        print("%-14s cum %8.2f ms   marginal %+8.2f ms"
              % (name, dt, dt - prev), flush=True)
        prev = dt
    full = t(lambda: bt._decrypt_rns_dev(
        ct.mont, dc.ctx, pk, half_p, half_q)) * 1e3
    print("%-14s     %8.2f ms (the shipped fused program)"
          % ("fused_dev", full), flush=True)


if __name__ == "__main__":
    main()
