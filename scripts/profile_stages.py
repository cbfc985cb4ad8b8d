"""Stage-level timing of the 2048-bit encrypt/decrypt/add/mul pipelines.

Diagnostic harness (round-3 perf work): times each device stage and each
host stage of the batched hot paths separately so optimization effort goes
where the milliseconds are. Not part of the library; run on the TPU:

    python scripts/profile_stages.py [B]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def t(fn, runs=3, warmup=1):
    for _ in range(warmup):
        out = fn()
    t0 = time.perf_counter()
    for _ in range(runs):
        out = fn()
    dt = (time.perf_counter() - t0) / runs
    return dt, out


def block(x):
    import jax

    return jax.block_until_ready(x)


def main():
    import jax

    from __graft_entry__ import _fixed_key
    from phe_tpu import batch as bt
    from phe_tpu.batch import EncryptedBatch
    from phe_tpu.encoding import EncodedNumber
    from phe_tpu.ops import limb_math as lm
    from phe_tpu.ops import montgomery as mg
    from phe_tpu.ops import rns

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    pub, priv = _fixed_key(2048)
    dc = pub.device_context()
    pdc = priv.device_context()
    rng = np.random.default_rng(0)
    vals = [float(v) for v in rng.uniform(-1e6, 1e6, B)]

    print("backend:", jax.default_backend(), " B =", B, flush=True)

    # ---- encrypt stages -------------------------------------------------
    dt, encs = t(lambda: EncodedNumber.encode_many(pub, vals))
    print("enc.encode_many          %8.2f ms" % (dt * 1e3), flush=True)
    residues = [e.encoding for e in encs]
    dt, m = t(lambda: dc.pack_messages(residues))
    print("enc.pack_messages        %8.2f ms" % (dt * 1e3), flush=True)
    dt, r = t(lambda: dc.random_r_bytes(B))
    print("enc.random_r_bytes       %8.2f ms" % (dt * 1e3), flush=True)
    m, r = block(m), block(r)
    st = dc.rns_state()
    rsys, conv = st.rsys, st.conv
    from phe_tpu.utils import limbs as hl

    dt, _ = t(lambda: block(bt._nude_encrypt_dev(
        m, dc.n_limbs, dc.nr2_limbs, dc.ctx, ln=dc.Ln)))
    print("enc.nude (dev)           %8.2f ms" % (dt * 1e3), flush=True)
    r_limbs = jax.numpy.asarray(hl.bytes_to_limbs(np.asarray(r), dc.L))
    x_res = block(jax.jit(rns.to_rns)(r_limbs, conv, rsys))
    dt, _ = t(lambda: block(jax.jit(rns.to_rns)(r_limbs, conv, rsys)))
    print("enc.to_rns (dev)         %8.2f ms" % (dt * 1e3), flush=True)
    from phe_tpu.ops import pallas_rns

    dig = dc.n_digits
    dt, u = t(lambda: block(pallas_rns.ladder_cols(x_res.T, dig, rsys, window=bt.ENCRYPT_WINDOW)))
    print("enc.ladder (dev)         %8.2f ms" % (dt * 1e3), flush=True)
    dt, _ = t(lambda: block(jax.jit(rns.from_rns)(u.T, rsys)))
    print("enc.from_rns (dev)       %8.2f ms" % (dt * 1e3), flush=True)
    dt, _ = t(lambda: block(bt._encrypt_rns_dev(
        m, r, dc.n_limbs, dc.nr2_limbs, dc.n_digits, dc.ctx, st,
        ln=dc.Ln)))
    print("enc.full fused (dev)     %8.2f ms" % (dt * 1e3), flush=True)
    dt, _ = t(lambda: block(EncryptedBatch.encrypt(pub, vals).mont))
    print("enc.end_to_end           %8.2f ms -> %8.1f ops/s"
          % (dt * 1e3, B / dt), flush=True)

    # ---- decrypt stages -------------------------------------------------
    ct = EncryptedBatch.encrypt(pub, vals)
    block(ct.mont)
    pk = pdc.consts
    half_p, half_q = pdc.rns_state()
    rsys_p, conv_p, ers_p, red_p2 = half_p
    print("geom: pub L=%d k=%d cpad=%d | half L2=%d kp=%d cpad_p=%d" % (
        dc.L, rsys.k, rsys.cpad, pk.ctx_p.num_limbs, rsys_p.k, rsys_p.cpad),
        flush=True)

    fm = jax.jit(lambda x: mg.from_mont(x, dc.ctx))
    dt, plain = t(lambda: block(fm(ct.mont)))
    print("dec.from_mont (dev)      %8.2f ms" % (dt * 1e3), flush=True)
    mr = jax.jit(lambda x: mg.mod_reduce(x, pk.ctx_p, pk.red_p))
    dt, xp = t(lambda: block(mr(plain)))
    print("dec.mod_reduce p (dev)   %8.2f ms" % (dt * 1e3), flush=True)
    tr = jax.jit(rns.to_rns)
    L2 = pk.ctx_p.num_limbs
    xm_p = block(jax.jit(lambda xx: bt.lm.add(
        bt.mg.mont_mul_const(xx[..., :L2], pk.ctx_p.r2, pk.ctx_p),
        xx[..., L2:] * jax.numpy.broadcast_to(pk.ctx_p.r2, xx[..., :L2].shape)))(xp))
    dt, xr = t(lambda: block(tr(xm_p, conv_p, rsys_p)))
    print("dec.to_rns p (dev)       %8.2f ms" % (dt * 1e3), flush=True)
    dt, up = t(lambda: block(pallas_rns.ladder_cols(xr.T, pk.dp_digits, rsys_p, window=bt.DECRYPT_WINDOW)))
    print("dec.ladder p (dev)       %8.2f ms" % (dt * 1e3), flush=True)
    dt, _ = t(lambda: block(jax.jit(rns.from_rns)(up.T, rsys_p)))
    print("dec.from_rns p (dev)     %8.2f ms" % (dt * 1e3), flush=True)

    dt, mbytes = t(lambda: block(bt._decrypt_rns_dev(
        ct.mont, dc.ctx, pk, half_p, half_q)))
    print("dec.full fused (dev)     %8.2f ms" % (dt * 1e3), flush=True)
    rows = jax.device_get(mbytes)
    dt, ints = t(lambda: bt._bytes_to_ints(np.asarray(jax.device_get(mbytes))))
    print("dec.get+bytes_to_ints    %8.2f ms" % (dt * 1e3), flush=True)
    dt, _ = t(lambda: [
        EncodedNumber(pub, mm, int(e)).decode()
        for mm, e in zip(ints, ct.exponents)
    ])
    print("dec.decode (host)        %8.2f ms" % (dt * 1e3), flush=True)
    dt, _ = t(lambda: ct.decrypt(priv))
    print("dec.end_to_end           %8.2f ms -> %8.1f ops/s"
          % (dt * 1e3, B / dt), flush=True)

    # ---- add stages ------------------------------------------------------
    ct2 = EncryptedBatch.encrypt(pub, vals)
    block(ct2.mont)
    dt, _ = t(lambda: block(bt._mul_mont_dev(ct.mont, ct2.mont, dc.ctx)))
    print("add.mont_mul (dev)       %8.2f ms" % (dt * 1e3), flush=True)
    dt, _ = t(lambda: block((ct + ct2).mont))
    print("add.end_to_end           %8.2f ms -> %8.1f ops/s"
          % (dt * 1e3, B / dt), flush=True)

    # ---- mul stages ------------------------------------------------------
    scalars = [float(v) for v in rng.uniform(-100.0, 100.0, B)]
    encs = EncodedNumber.encode_many(pub, scalars)
    ks = [e.encoding if e.encoding < pub.n - pub.max_int else pub.n - e.encoding
          for e in encs]
    bits = max(k.bit_length() for k in ks)
    print("mul.exponent bits        %8d (bucketed %d)"
          % (bits, bt._bucket_bits(bits)), flush=True)
    import jax.numpy as jnp
    digits = jnp.asarray(bt._digits_rows(ks, bits, pad_rows=ct.mont.shape[0]))
    dt, _ = t(lambda: block(mg.mont_pow(ct.mont, digits, dc.ctx)))
    print("mul.mont_pow limb (dev)  %8.2f ms" % (dt * 1e3), flush=True)
    xr2 = block(jax.jit(rns.to_rns)(ct.mont, conv, rsys))
    dt, _ = t(lambda: block(jax.jit(rns.to_rns)(ct.mont, conv, rsys)))
    print("mul.to_rns (dev)         %8.2f ms" % (dt * 1e3), flush=True)
    dt, uv = t(lambda: block(pallas_rns.ladder_vec_cols(
        xr2.T, digits.T, rsys, exit_res=st.exit_r, entry_res=st.entry_mont)))
    print("mul.vec ladder (dev)     %8.2f ms" % (dt * 1e3), flush=True)
    dt, wv = t(lambda: block(jax.jit(rns.from_rns)(uv.T, rsys)))
    print("mul.from_rns (dev)       %8.2f ms" % (dt * 1e3), flush=True)
    dt, _ = t(lambda: block(jax.jit(mg.reduce_excess)(wv, st.red)))
    print("mul.reduce_excess (dev)  %8.2f ms" % (dt * 1e3), flush=True)
    dt, _ = t(lambda: block(bt._pow_elems_dev(ct.mont, digits, dc.ctx, st)))
    print("mul.pow_elems fused (dev)%8.2f ms" % (dt * 1e3), flush=True)
    dt, _ = t(lambda: block(ct.mul_scalars(scalars).mont))
    print("mul.end_to_end           %8.2f ms -> %8.1f ops/s"
          % (dt * 1e3, B / dt), flush=True)


if __name__ == "__main__":
    main()
