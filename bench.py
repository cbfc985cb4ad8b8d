"""Headline benchmark: batched 2048-bit Paillier encryption throughput.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"}.

The measured op is a fresh encryption — encode, draw uniform r < n from the
system CSPRNG, compute (n*m+1) * r^n mod n^2 — end to end including host
encoding/packing, matching what the reference counts in
examples/benchmarks.py:38-71 ("encrypt"). Baseline: 9.2 ops/s single-core
CPython at 2048 bits (BASELINE.md, measured in this environment; the
reference's gmpy2 path is ~8x that, still far below this target).
"""

import json
import sys
import time

BASELINE_ENCRYPT_2048 = 9.2  # ops/s, BASELINE.md measured table


def main():
    import numpy as np

    from __graft_entry__ import _fixed_key
    from phe_tpu.batch import EncryptedBatch

    pub, priv = _fixed_key(2048)

    rng = np.random.default_rng(12345)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    vals = [float(v) for v in rng.uniform(-1e6, 1e6, B)]

    import jax

    def sync(batch):
        # Hard synchronization: materialise one device row on host.
        # (block_until_ready alone does not reliably fence execution over
        # the tunnelled TPU transport.)
        np.asarray(jax.device_get(batch.mont[0]))

    # Warmup: trigger compilation + device-constant setup.
    sync(EncryptedBatch.encrypt(pub, vals[:B]))

    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        batch = EncryptedBatch.encrypt(pub, vals)
        sync(batch)
    dt = time.perf_counter() - t0

    ops_per_s = runs * B / dt
    print(
        json.dumps(
            {
                "metric": "paillier_encrypt_2048_batched",
                "value": round(ops_per_s, 2),
                "unit": "ops/s",
                "vs_baseline": round(ops_per_s / BASELINE_ENCRYPT_2048, 2),
            }
        )
    )


if __name__ == "__main__":
    # One retry on transient device faults (the tunnelled TPU worker can
    # restart between runs); the driver needs the JSON line either way.
    try:
        main()
    except Exception:
        time.sleep(30)
        main()
