"""Batch-size sweep for the four headline ops on the real TPU.

Diagnostic harness: picks the bench geometry where the kernels dominate
the ~26 ms tunnelled-dispatch overhead. Usage:

    python scripts/sweep_b.py enc 2048 4096
    python scripts/sweep_b.py add 8192 32768
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax

    from __graft_entry__ import _fixed_key
    from phe_tpu.batch import EncryptedBatch

    op = sys.argv[1]
    sizes = [int(x) for x in sys.argv[2:]]
    pub, priv = _fixed_key(2048)
    rng = np.random.default_rng(1)

    def sync(batch):
        np.asarray(jax.device_get(batch.mont[0]))

    for B in sizes:
        vals = [float(v) for v in rng.uniform(-1e6, 1e6, B)]
        if op == "enc":
            fn = lambda: sync(EncryptedBatch.encrypt(pub, vals))
        elif op == "dec":
            ct = EncryptedBatch.encrypt(pub, vals)
            sync(ct)
            fn = lambda: ct.decrypt(priv)
        elif op == "add":
            ct = EncryptedBatch.encrypt(pub, vals)
            ct2 = EncryptedBatch.encrypt(pub, vals)
            sync(ct), sync(ct2)
            fn = lambda: sync(ct + ct2)
        elif op == "mul":
            ct = EncryptedBatch.encrypt(pub, vals)
            sync(ct)
            scalars = [float(v) for v in rng.uniform(-100.0, 100.0, B)]
            fn = lambda: sync(ct.mul_scalars(scalars))
        else:
            raise SystemExit("op must be enc|dec|add|mul")
        fn()
        fn()  # two warmups: compile + steady-state caches
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            ts.append(time.perf_counter() - t0)
        med = sorted(ts)[len(ts) // 2]
        print("%s B=%-6d med %8.1f ms  %10.1f ops/s  (min %.1f max %.1f)"
              % (op, B, med * 1e3, B / med, min(ts) * 1e3, max(ts) * 1e3),
              flush=True)


if __name__ == "__main__":
    main()
