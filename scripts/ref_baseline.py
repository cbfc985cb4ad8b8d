"""Measured single-core CPython baselines for big keys (4096/8192).

Round-4 verdict item: the 4096-bit CPython baseline was an estimate
("~1.2 ops/s by cubic scaling") and 8192 had none. This measures both
against the reference library as-is (pure-Python pow path, the same lane
BASELINE.md's 1024-3072 rows used).

The reference's own keygen at these sizes takes minutes-to-hours in pure
Python; op throughput does not depend on how p,q were found, so the
keypair comes from phe_tpu's keygen and is rebuilt as reference objects
(PaillierPrivateKey(pub, p, q) — the same constructor its own test suite
uses). Methodology mirrors the earlier measured rows: a fixed op-count
sample per op, int plaintexts for add (equal exponents — pure mulmod,
no hidden alignment modexp), float scalars for mul (the ~53-bit-exponent
powmod path).

Usage:  python scripts/ref_baseline.py [keysize ...]   (default 4096 8192)
"""

import json
import random
import sys
import time

sys.path.insert(0, "/root/reference")
import phe  # noqa: E402

sys.path.insert(0, ".")
import phe_tpu  # noqa: E402

# keysize -> per-op sample counts (encrypt, decrypt, add, mul), sized so
# each op takes seconds, not minutes, at pure-Python speed.
SAMPLES = {
    4096: (8, 8, 4000, 24),
    8192: (3, 3, 2000, 6),
}


def bench(keysize):
    n_enc, n_dec, n_add, n_mul = SAMPLES.get(keysize, (4, 4, 2000, 8))
    t0 = time.perf_counter()
    our_pub, our_priv = phe_tpu.generate_paillier_keypair(n_length=keysize)
    keygen_s = time.perf_counter() - t0
    pub = phe.PaillierPublicKey(our_pub.n)
    priv = phe.PaillierPrivateKey(pub, our_priv.p, our_priv.q)
    rng = random.Random(20260821)

    rows = [{"keysize": keysize, "op": "keygen_phe_tpu",
             "seconds": round(keygen_s, 2),
             "note": "our keygen; reference keygen not timed at this size"}]

    def emit(op, ops, dt):
        rows.append({
            "keysize": keysize, "op": op,
            "cpython_ops_per_s": round(ops / dt, 4), "sample_ops": ops,
        })
        print(json.dumps(rows[-1]), flush=True)

    vals = [float(rng.randrange(1, 1 << 40)) for _ in range(n_enc)]
    t0 = time.perf_counter()
    cts = [pub.encrypt(v) for v in vals]
    emit("encrypt", n_enc, time.perf_counter() - t0)

    t0 = time.perf_counter()
    for c in cts[:n_dec]:
        priv.decrypt(c)
    emit("decrypt", n_dec, time.perf_counter() - t0)

    # add: int plaintexts -> exponent 0 on both sides, pure mulmod n^2.
    ia = [pub.encrypt(rng.randrange(1, 1 << 30)) for _ in range(4)]
    ib = [pub.encrypt(rng.randrange(1, 1 << 30)) for _ in range(4)]
    t0 = time.perf_counter()
    for i in range(n_add):
        _ = ia[i % 4] + ib[(i // 4) % 4]
    emit("add_enc_enc", n_add, time.perf_counter() - t0)

    scal = [rng.uniform(-100.0, 100.0) for _ in range(n_mul)]
    t0 = time.perf_counter()
    for i in range(n_mul):
        _ = cts[i % len(cts)] * scal[i]
    emit("mul_enc_scalar", n_mul, time.perf_counter() - t0)
    return rows


if __name__ == "__main__":
    sizes = [int(a) for a in sys.argv[1:]] or [4096, 8192]
    for ks in sizes:
        bench(ks)
