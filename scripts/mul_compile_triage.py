"""Root-cause triage of the 32k-element vec-ladder compile pathology.

Round 4 observed a >45-minute compile when raising the scalar-multiply
batch from 8192 to 32768 and retreated without isolating the component.
This script times compilation of each piece of the mul pipeline
separately at growing batch sizes, so the blowup (if it reproduces) is
attributed to a specific program: the Pallas vec-ladder kernel itself
(whose Mosaic compile should be batch-size-independent — the grid is
(B/128,) over the same kernel body), the XLA to_rns/from_rns conversion
programs, or the fused _pow_elems_dev wrapper (transposes + excess
reduction + XLA/Pallas stitching).

Usage:  python scripts/mul_compile_triage.py [B ...]   (default 8192 16384 32768)

Each stage prints compile wall-time and first-run wall-time. Run under
`timeout` — the point is to bound and attribute, not to hang.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _fixed_key
    from phe_tpu import batch as bt
    from phe_tpu.ops import pallas_rns, rns

    sizes = [int(a) for a in sys.argv[1:]] or [8192, 16384, 32768]
    pub, priv = _fixed_key(2048)
    dc = pub.device_context()
    st = dc.rns_state()
    rsys, conv = st.rsys, st.conv
    rng = np.random.default_rng(0)

    def timed(label, fn):
        t0 = time.perf_counter()
        out = fn()
        out = jax.block_until_ready(out)
        t1 = time.perf_counter()
        out = jax.block_until_ready(fn())
        t2 = time.perf_counter()
        print("%-28s compile+run %8.1f s   run %8.3f s"
              % (label, t1 - t0, t2 - t1), flush=True)
        return out

    for B in sizes:
        print("== B = %d ==" % B, flush=True)
        ct = bt.EncryptedBatch.encrypt(
            pub, [float(v) for v in rng.uniform(-1e6, 1e6, B)]
        )
        np.asarray(jax.device_get(ct.mont[0]))
        ks = rng.integers(1, 1 << 56, B)
        digits = jnp.asarray(bt._digits_rows(
            np.asarray(ks, dtype=np.int64), 56, pad_rows=ct.mont.shape[0]
        ))
        # Stage 1: binary -> residues (XLA digit matmul).
        x_res = timed("to_rns [B,%d]" % dc.L,
                      lambda: jax.jit(rns.to_rns)(ct.mont, conv, rsys))
        # Stage 2: the Pallas vec ladder alone (residues in, residues out).
        u = timed("ladder_vec_cols",
                  lambda: pallas_rns.ladder_vec_cols(
                      x_res.T, digits.T, rsys,
                      exit_res=st.exit_r, entry_res=st.entry_mont))
        # Stage 3: residues -> binary + normalisation (XLA).
        timed("from_rns", lambda: jax.jit(rns.from_rns)(u.T, rsys))
        # Stage 4: the full fused program (what mul_scalars dispatches).
        timed("_pow_elems_dev (fused)",
              lambda: bt._pow_elems_dev(ct.mont, digits, dc.ctx, st))


if __name__ == "__main__":
    main()
