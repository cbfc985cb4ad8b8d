"""Per-op benchmark suite for the TPU Paillier engine.

Mirrors the reference's methodology (examples/benchmarks.py:38-92: timed
batches of encrypt / decrypt / add(enc,enc) / add(enc,scalar) / add(enc,1) /
mul(enc,scalar) across key sizes) with batch-first device execution: each op
is one fused jitted program over a [B, L] ciphertext tensor, timed after a
warmup run that triggers (persistent-cached) compilation.

Run:  python -m phe_tpu.benchmarks [--key-sizes 1024,2048] [--batch 512]
Emits one JSON object per (op, keysize) line, plus a summary table to stderr.

Baselines (BASELINE.md, measured single-core CPython in this environment):
encrypt 55.5/9.2 ops/s, decrypt 179/32.7, add enc+enc 39.6k/22.2k,
mul enc*scalar 386/297 at 1024/2048 bits.
"""

import argparse
import json
import sys
import time

import numpy as np

CPYTHON_BASELINE = {
    # op -> {keysize: single-core ops/s}. 1024/2048: BASELINE.md measured
    # table; 3072 measured in round 4 against the reference as-is in this
    # environment (keygen 4.77 s/pair; same 40/4000/200-op methodology);
    # 4096/8192 measured round 5 via scripts/ref_baseline.py (reference
    # ops on a phe_tpu-generated keypair — op speed is independent of how
    # p, q were found).
    "encrypt": {1024: 55.5, 2048: 9.2, 3072: 3.51, 4096: 1.48, 8192: 0.209},
    "decrypt": {1024: 179.0, 2048: 32.7, 3072: 13.16, 4096: 5.67,
                8192: 0.74},
    "add_enc_enc": {1024: 39614.0, 2048: 22218.0, 3072: 7622.0,
                    4096: 6849.0, 8192: 1796.0},
    "mul_enc_scalar": {1024: 386.0, 2048: 297.0, 3072: 157.6, 4096: 67.4,
                       8192: 17.4},
}


def _time_op(fn, runs=3):
    """Median-of-runs wall time for fn() (fn must block on device work)."""
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def _sync(b):
    """Hard device fence: materialise one row (block_until_ready alone
    does not reliably fence execution over the tunnelled TPU transport)."""
    import jax

    np.asarray(jax.device_get(b.mont[0]))
    return b


def bench_key_size(keysize, batch, runs=3, emit=print, streams=1):
    """Per-op suite at one key size.

    streams=1 (default) is single-dispatch latency methodology: each
    timed call hard-syncs before the next — the per-dispatch number.
    streams>1 is bench.py's steady-state streamed throughput: that many
    batches in flight, the wall clock charging all host work; the JSON
    rows carry the streams count either way so artifacts self-describe.
    """
    import phe_tpu
    from phe_tpu.batch import EncryptedBatch

    rng = np.random.default_rng(20260817 + keysize)
    vals = [float(v) for v in rng.uniform(-1e6, 1e6, batch)]
    scalars = [float(v) for v in rng.uniform(-100, 100, batch)]

    t0 = time.perf_counter()
    pub, priv = phe_tpu.generate_paillier_keypair(n_length=keysize)
    keygen_s = time.perf_counter() - t0

    results = {"keygen": {"value": round(1.0 / keygen_s, 3), "unit": "keypairs/s"}}

    def run(op, launch, finish=_sync, unit="ops/s", per=batch):
        finish(launch())  # warmup: compile + constant setup
        if streams > 1:
            def fn():
                handles = [launch() for _ in range(streams)]
                for h in handles:
                    finish(h)
            dt = _time_op(fn, runs) / streams
        else:
            dt = _time_op(lambda: finish(launch()), runs)
        ops = per / dt
        base = CPYTHON_BASELINE.get(op, {}).get(keysize)
        results[op] = {
            "value": round(ops, 2),
            "unit": unit,
            "vs_baseline": round(ops / base, 2) if base else None,
            "streams": streams,
        }

    enc = EncryptedBatch.encrypt(pub, vals)
    enc2 = EncryptedBatch.encrypt(pub, scalars)

    run("encrypt", lambda: EncryptedBatch.encrypt(pub, vals))
    run("decrypt", lambda: enc.decrypt_async(priv), finish=lambda f: f())

    # Roofline accounting: achieved fraction of the binding unit's peak,
    # under the cost model of whichever engine actually ran.
    from phe_tpu import batch as _batch
    from phe_tpu import profiling

    dc = pub.device_context()
    pdc = priv.device_context()
    if _batch._use_rns() and dc.rns_state() is not None:
        enc_cost = profiling.rns_encrypt_cost(
            dc.n_bits, dc.rns_state()[0].k, _batch.ENCRYPT_WINDOW
        )
    else:
        enc_cost = profiling.encrypt_cost(dc.n_bits, dc.L)
    pst = pdc.rns_state() if _batch._use_rns() else None
    if pst is not None:
        dec_cost = profiling.rns_decrypt_cost(
            dc.n_bits, pst[0][0].k, _batch.DECRYPT_WINDOW
        )
    else:
        dec_cost = profiling.decrypt_cost(
            dc.n_bits, pdc.consts.ctx_p.num_limbs, _batch.DECRYPT_WINDOW
        )
    results["encrypt"]["speed_of_light"] = profiling.report(
        "encrypt", results["encrypt"]["value"], enc_cost
    )["speed_of_light_fraction"]
    results["decrypt"]["speed_of_light"] = profiling.report(
        "decrypt", results["decrypt"]["value"], dec_cost
    )["speed_of_light_fraction"]
    run("add_enc_enc", lambda: enc + enc2)
    run("add_enc_scalar", lambda: enc + scalars)
    run("add_enc_one", lambda: enc + [1.0] * batch)
    run("mul_enc_scalar", lambda: enc * scalars)
    results["add_enc_enc"]["speed_of_light"] = profiling.report(
        "add", results["add_enc_enc"]["value"], profiling.mont_mul_cost(dc.L)
    )["speed_of_light_fraction"]
    if _batch._use_rns() and dc.rns_state() is not None:
        mul_cost = profiling.rns_vec_modexp_cost(
            64, dc.rns_state().rsys.k, _batch.DEFAULT_WINDOW
        )
    else:
        mul_cost = profiling.modexp_cost(64, dc.L)
    results["mul_enc_scalar"]["speed_of_light"] = profiling.report(
        "mul", results["mul_enc_scalar"]["value"], mul_cost
    )["speed_of_light_fraction"]
    run("sum_batch", lambda: enc.sum(), unit="elements/s")

    for op, r in results.items():
        emit(json.dumps({"metric": op, "keysize": keysize, "batch": batch,
                         **r}))
    return results


def bench_scaling(keysize=1024, batch=2048, runs=3, emit=print):
    """Mesh-scaling efficiency for the encrypted aggregation reduce.

    Shards the batch over sub-meshes of 1, 2, 4, ... devices and reports
    elements/s plus efficiency relative to linear scaling from 1 device —
    the BASELINE.json north-star metric. Meaningful on a real multi-chip
    slice; on the CPU test mesh it validates the harness only.
    """
    import jax

    import phe_tpu
    from phe_tpu.batch import EncryptedBatch
    from phe_tpu.parallel import batch_mesh, encrypted_sum_sharded

    pub, priv = phe_tpu.generate_paillier_keypair(n_length=keysize)
    rng = np.random.default_rng(7)
    vals = [float(v) for v in rng.uniform(-1e3, 1e3, batch)]
    enc = EncryptedBatch.encrypt(pub, vals)

    n_dev = len(jax.devices())
    # Self-describing rows: a forced-host-platform mesh time-shares the
    # host cores, so its efficiencies measure harness correctness, not
    # hardware scaling — consumers of the JSON must be able to tell.
    virtual = jax.default_backend() != "tpu"
    platform = {"virtual": virtual}
    if virtual:
        import os as _os

        platform["physical_cores"] = _os.cpu_count()
    sizes = [d for d in (1, 2, 4, 8, 16, 32) if d <= n_dev]
    base_rate = None
    out = {}
    for d in sizes:
        mesh = batch_mesh(n_devices=d)
        fn = lambda: _sync(encrypted_sum_sharded(enc, mesh))
        fn()  # compile
        dt = _time_op(fn, runs)
        rate = batch / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * d)
        out[d] = {"elements_per_s": round(rate, 1),
                  "scaling_efficiency": round(eff, 3)}
        emit(json.dumps({"metric": "encrypted_sum_scaling", "devices": d,
                         "keysize": keysize, "batch": batch, **out[d],
                         **platform}))
    return out


def bench_mem(keysize=2048, test_size=100_000, step=10_000, emit=print):
    """Memory per held ciphertext: host RSS and device HBM accounting.

    The reference measures ru_maxrss growth while holding a list of
    EncryptedNumber objects (examples/benchmarks.py:74-86). Here the same
    host measurement runs against EncryptedBatch (ciphertexts resident on
    device, host holds metadata only), plus the exact device-side
    footprint: a ciphertext is one [L] uint32 Montgomery limb row, so
    HBM bytes per ciphertext = 4 * L — the number that actually bounds
    feasible batch sizes on a chip.
    """
    import resource

    import phe_tpu
    from phe_tpu.batch import EncryptedBatch

    r_init = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    pub, _ = phe_tpu.generate_paillier_keypair(n_length=keysize)
    dc = pub.device_context()
    hbm_per_ct = 4 * dc.L
    emit(json.dumps({
        "metric": "hbm_bytes_per_ciphertext", "keysize": keysize,
        "value": hbm_per_ct, "unit": "bytes",
        "note": "uint32[L=%d] Montgomery limb row mod n^2" % dc.L,
    }))
    rng = np.random.default_rng(1)
    held = []
    for i in range(0, test_size, step):
        vals = [float(v) for v in rng.uniform(-1e6, 1e6, step)]
        held.append(_sync(EncryptedBatch.encrypt(pub, vals)))
        n = (i + step)
        rss_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss - r_init
        emit(json.dumps({
            "metric": "host_rss_per_ciphertext", "keysize": keysize,
            "held": n, "rss_kb": rss_kb,
            "value": round(1024.0 * rss_kb / n, 1), "unit": "bytes",
        }))
    return {"hbm_bytes_per_ciphertext": hbm_per_ct}


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--key-sizes", default="1024,2048",
                    help="comma-separated bit lengths")
    ap.add_argument("--batch", type=int, default=512)
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--stream", type=int, default=1, metavar="N",
                    help="batches in flight per timed run (1 = "
                         "single-dispatch latency methodology; bench.py "
                         "uses 4 for steady-state throughput)")
    ap.add_argument("--scaling", action="store_true",
                    help="also run the mesh-scaling efficiency sweep")
    ap.add_argument("--mem", action="store_true",
                    help="also run the memory-per-ciphertext benchmark")
    args = ap.parse_args(argv)

    key_sizes = [int(s) for s in args.key_sizes.split(",")]
    all_results = {}
    for ks in key_sizes:
        all_results[ks] = bench_key_size(ks, args.batch, args.runs,
                                         streams=args.stream)
    if args.scaling:
        # Round-3 verdict fix: honour the CLI geometry instead of the
        # hardcoded defaults.
        bench_scaling(keysize=key_sizes[0], batch=args.batch,
                      runs=args.runs)
    if args.mem:
        bench_mem(keysize=key_sizes[-1])

    print("\n== summary (ops/s, vs single-core CPython baseline) ==",
          file=sys.stderr)
    for ks, res in all_results.items():
        for op, r in res.items():
            vs = r.get("vs_baseline")
            print("  %5d-bit %-16s %12.1f %s%s" % (
                ks, op, r["value"], r["unit"],
                "  (%.0fx baseline)" % vs if vs else ""), file=sys.stderr)
    return all_results


if __name__ == "__main__":
    main()
