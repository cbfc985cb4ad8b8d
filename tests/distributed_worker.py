"""Worker process for the two-process jax.distributed test.

Each process owns 2 virtual CPU devices; together they form a 4-device
global (dp, mp) mesh. Both processes deterministically encrypt the same
batch (pinned r), shard it over the global mesh, and run the
Montgomery-multiply ring all-reduce (phe_tpu.parallel) across the process
boundary — the DCN-shaped path of SURVEY.md §2.4. Prints DIST_OK on a
bit-exact decrypted sum.

Usage: python distributed_worker.py <process_id> <num_processes> <port>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

import phe_tpu
from phe_tpu.batch import EncryptedBatch
from phe_tpu.parallel.aggregate import allreduce_mul_mont
from phe_tpu.parallel.mesh import batch_mesh, initialize_distributed

# Fixed 256-bit keypair (generated once with phe_tpu's own keygen): host
# prime search would otherwise dominate the test runtime.
_P = 307260150530527508970926394744437130671
_Q = 246443548683535459572940433370278944997


def main():
    process_id, num_processes, port = (
        int(sys.argv[1]),
        int(sys.argv[2]),
        sys.argv[3],
    )
    initialize_distributed(
        coordinator_address="localhost:%s" % port,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    assert len(jax.devices()) == 2 * num_processes, jax.devices()

    pub = phe_tpu.PaillierPublicKey(_P * _Q)
    priv = phe_tpu.PaillierPrivateKey(pub, _P, _Q)
    dc = pub.device_context()

    vals = [3, -1, 40, 2, 7, -5, 100, 4]
    rs = [v + 2 for v in range(len(vals))]  # pinned: identical ciphertexts
    batch = EncryptedBatch.encrypt(pub, vals, r_values=rs)

    mesh = batch_mesh()  # global (dp=4, mp=1) mesh across both processes
    out = allreduce_mul_mont(
        batch.mont, dc.ctx, mesh, vector_axes=0, return_sharded=True
    )
    # Every dp shard of `out` holds the full product; read this process's
    # addressable copy and decrypt locally.
    local = np.asarray(out.addressable_shards[0].data)  # [1, L] dp shard
    total = EncryptedBatch(pub, local, np.array([0]), False)
    got = total.decrypt(priv)[0]
    assert got == sum(vals), (got, sum(vals))
    print("DIST_OK process=%d sum=%s" % (process_id, got), flush=True)


if __name__ == "__main__":
    main()
