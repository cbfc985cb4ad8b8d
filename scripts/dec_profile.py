"""Decrypt marginal-cost breakdown at production batch sizes (TPU)."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def t(fn, runs=5, warmup=2):
    for _ in range(warmup):
        fn()
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return sorted(ts)[len(ts) // 2]


def main():
    import jax

    from __graft_entry__ import _fixed_key
    from phe_tpu import batch as bt
    from phe_tpu.batch import EncryptedBatch
    from phe_tpu.encoding import EncodedNumber

    pub, priv = _fixed_key(2048)
    dc = pub.device_context()
    pdc = priv.device_context()
    pk = pdc.consts
    half_p, half_q = pdc.rns_state()
    rng = np.random.default_rng(3)

    for B in (4096, 8192):
        vals = [float(v) for v in rng.uniform(-1e6, 1e6, B)]
        ct = EncryptedBatch.encrypt(pub, vals)
        jax.block_until_ready(ct.mont)

        fused = lambda: jax.block_until_ready(bt._decrypt_rns_dev(
            ct.mont, dc.ctx, pk, half_p, half_q))
        dt_dev = t(fused)
        mbytes = bt._decrypt_rns_dev(ct.mont, dc.ctx, pk, half_p, half_q)
        jax.block_until_ready(mbytes)
        dt_get = t(lambda: jax.device_get(mbytes))
        host_rows = np.asarray(jax.device_get(mbytes))
        dt_ints = t(lambda: bt._bytes_to_ints(host_rows))
        ints = bt._bytes_to_ints(host_rows)
        dt_dec = t(lambda: [
            EncodedNumber(pub, m, int(e)).decode()
            for m, e in zip(ints, ct.exponents)
        ])
        dt_e2e = t(lambda: ct.decrypt(priv))
        print("B=%-5d dev %7.1f  get %6.1f  ints %6.1f  decode %6.1f  "
              "e2e %7.1f ms -> %8.1f ops/s" % (
                  B, dt_dev * 1e3, dt_get * 1e3, dt_ints * 1e3,
                  dt_dec * 1e3, dt_e2e * 1e3, B / dt_e2e), flush=True)


if __name__ == "__main__":
    main()
