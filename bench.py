"""Headline benchmark: batched 2048-bit Paillier throughput on one chip.

Prints one JSON line {"metric", "value", "unit", "vs_baseline"} per op —
encrypt first (the round-over-round headline), then decrypt, add and
scalar-multiply — matching the reference's benchmark set
(examples/benchmarks.py:38-71). Baselines are the single-core CPython
numbers measured in this environment at 2048 bits (BASELINE.md): encrypt
9.2 ops/s, decrypt 32.7 ops/s, add 22218 ops/s, mul 297 ops/s. The
north-star metric is encryptions+decryptions/sec/chip (BASELINE.json).

Each op is end to end including host encoding/packing. Every run also
re-proves bit-exactness on the execution backend: a pinned-r encrypt batch
is compared against host-integer raw encryption, and the timed decrypt
must return the values that were encrypted.
"""

import json
import sys
import time

# BASELINE.md measured table, 2048-bit key, single-core CPython.
BASELINES = {
    "encrypt": 9.2,
    "decrypt": 32.7,
    "add": 22218.0,
    "mul": 297.0,
}


def emit(op, ops_per_s):
    print(
        json.dumps(
            {
                "metric": "paillier_%s_2048_batched" % op,
                "value": round(ops_per_s, 2),
                "unit": "ops/s",
                "vs_baseline": round(ops_per_s / BASELINES[op], 2),
            }
        ),
        flush=True,
    )


def main():
    import numpy as np

    from __graft_entry__ import _fixed_key
    from phe_tpu.batch import EncryptedBatch
    from phe_tpu.encoding import EncodedNumber

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

    # Device parity gate: pinned-r encryption must match host-int math on
    # the execution backend before any number is reported.
    ms = [1, 2, 10100, pub.n - 1]
    rs = [3, 7, 12345, pub.n - 2]
    parity = EncryptedBatch.encrypt(
        pub, [EncodedNumber(pub, m, 0) for m in ms], r_values=rs
    )
    got = parity.ciphertext_ints(be_secure=False)
    want = [pub.raw_encrypt(m, r_value=r) for m, r in zip(ms, rs)]
    assert got == want, "device/host encrypt parity failure"

    def timeit(fn, runs=3):
        fn()  # warmup: compile + device-constant setup
        t0 = time.perf_counter()
        for _ in range(runs):
            fn()
        return runs * B / (time.perf_counter() - t0)

    # -- encrypt (fresh: encode, CSPRNG r, (n*m+1)*r^n mod n^2) ----------
    emit("encrypt", timeit(lambda: sync(EncryptedBatch.encrypt(pub, vals))))

    # -- decrypt (CRT, full device pipeline, host decode) ----------------
    ct = EncryptedBatch.encrypt(pub, vals)
    sync(ct)
    out = ct.decrypt(priv)  # warm + parity: decrypt returns what went in
    assert out == vals, "device decrypt parity failure"
    emit("decrypt", timeit(lambda: ct.decrypt(priv)))

    # -- add enc+enc (aligned exponents: one Montgomery multiply) --------
    ct2 = EncryptedBatch.encrypt(pub, vals)
    sync(ct2)
    emit("add", timeit(lambda: sync(ct + ct2)))

    # -- mul enc x float scalar (per-element short-exponent modexp) ------
    scalars = [float(v) for v in rng.uniform(-100.0, 100.0, B)]
    emit("mul", timeit(lambda: sync(ct.mul_scalars(scalars))))


if __name__ == "__main__":
    # One retry on transient device faults (the tunnelled TPU worker can
    # restart between runs); the driver needs the JSON lines either way.
    try:
        main()
    except Exception:
        time.sleep(30)
        main()
