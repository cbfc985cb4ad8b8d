"""Round-5 measurement campaign: streamed throughput across batch sizes.

One process (compiles amortise in-process over the tunnelled TPU), every
headline op at its candidate dispatch sizes, bench.py's streaming
methodology (4 batches in flight, wall clock charges all host work).
Prints one labeled line per (op, B); each config is fault-isolated so a
bad compile doesn't kill the campaign.

    python scripts/campaign_r05.py [op ...]     (default: all four)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

STREAMS = 4


def main():
    import jax

    from __graft_entry__ import _fixed_key
    from phe_tpu.batch import EncryptedBatch

    ops = set(sys.argv[1:]) or {"encrypt", "decrypt", "add", "mul"}
    pub, priv = _fixed_key(2048)
    rng = np.random.default_rng(12345)

    def sync(b):
        np.asarray(jax.device_get(b.mont[0]))

    def stream(launch, finish, batch, runs=3, warmup=2):
        for _ in range(warmup):
            finish(launch())
        ts = []
        for _ in range(runs):
            t0 = time.perf_counter()
            hs = [launch() for _ in range(STREAMS)]
            for h in hs:
                finish(h)
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        return STREAMS * batch / med, med / STREAMS

    def report(op, B, fn):
        try:
            t0 = time.perf_counter()
            rate, per_batch = fn()
            print("%-8s B=%-7d %12.1f ops/s   %7.1f ms/batch   (cfg %.0f s)"
                  % (op, B, rate, per_batch * 1e3, time.perf_counter() - t0),
                  flush=True)
        except Exception as e:  # noqa: BLE001 — campaign must continue
            print("%-8s B=%-7d FAILED: %r" % (op, B, e), flush=True)

    if "encrypt" in ops:
        for B in (8192, 16384):
            vals = [float(v) for v in rng.uniform(-1e6, 1e6, B)]
            report("encrypt", B, lambda: stream(
                lambda: EncryptedBatch.encrypt(pub, vals), sync, B))

    if "decrypt" in ops:
        for B in (16384, 32768):
            vals = [float(v) for v in rng.uniform(-1e6, 1e6, B)]
            ct = EncryptedBatch.encrypt(pub, vals)
            sync(ct)
            assert ct.decrypt(priv) == vals
            report("decrypt", B, lambda: stream(
                lambda: ct.decrypt_async(priv), lambda f: f(), B))

    if "add" in ops:
        for B in (131072, 262144, 524288, 1048576):
            vals = [float(v) for v in rng.uniform(-1e6, 1e6, B)]
            ct = EncryptedBatch.encrypt(pub, vals)
            ct2 = EncryptedBatch.encrypt(pub, vals)
            sync(ct)
            sync(ct2)
            report("add", B, lambda: stream(lambda: ct + ct2, sync, B))

    if "mul" in ops:
        for B in (65536, 131072):
            vals = [float(v) for v in rng.uniform(-1e6, 1e6, B)]
            ct = EncryptedBatch.encrypt(pub, vals)
            sync(ct)
            scalars = [float(v) for v in rng.uniform(-100.0, 100.0, B)]
            report("mul", B, lambda: stream(
                lambda: ct.mul_scalars(scalars), sync, B))


if __name__ == "__main__":
    main()
