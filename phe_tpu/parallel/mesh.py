"""Device meshes, sharded ciphertext tensors, and the modmul all-reduce.

Layout convention: an encrypted tensor is ``uint32[B, ..., L]`` — leading
batch axis (shardable, named "dp"), optional inner "vector" axes such as the
gradient dimension of the FL example (shardable, named "mp"), trailing limb
axis L (never sharded: Montgomery arithmetic carries ripple across limbs).
All elementwise homomorphic ops shard trivially on every non-limb axis; the
one communicating op is the aggregation reduce over the batch axis, provided
here as a ring all-reduce with Montgomery-multiply combine
(reference semantics: encrypted add == ciphertext modmul mod n^2,
phe/paillier.py:705-719).
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from phe_tpu.ops import montgomery as mg

BATCH_AXIS = "dp"
VECTOR_AXIS = "mp"


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """Multi-host bring-up: one JAX process per host, devices pooled.

    Thin wrapper over jax.distributed.initialize with the standard
    environment-variable autodetection (GKE/Cloud TPU set everything).
    After this, jax.devices() spans the slice and batch_mesh() builds a
    global (dp, mp) mesh whose ring all-reduce rides ICI within a slice
    and DCN across hosts. No-op if already initialized.
    """
    import jax

    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:  # already initialized
        pass
    return jax.devices()


def batch_mesh(n_devices=None, mp=1, devices=None):
    """A (dp, mp) mesh over the available devices.

    dp shards the ciphertext batch axis; mp shards inner vector axes of
    encrypted vectors (e.g. the gradient dimension in federated
    aggregation). mp=1 gives pure batch data parallelism.
    """
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    devices = np.asarray(devices)
    dp = len(devices) // mp
    return Mesh(devices.reshape(dp, mp), (BATCH_AXIS, VECTOR_AXIS))


def sharded_batch(mont, mesh, vector_axes=0):
    """Place a [B, ..., L] limb tensor with batch/vector sharding.

    vector_axes inner axes after B are sharded over the "mp" mesh axis
    (the first one; further vector axes replicate). The limb axis always
    replicates within its shard.
    """
    spec = [BATCH_AXIS]
    if vector_axes > 0:
        spec.append(VECTOR_AXIS)
        spec.extend([None] * (vector_axes - 1))
    spec.append(None)  # limb axis
    return jax.device_put(mont, NamedSharding(mesh, P(*spec)))


def tree_reduce_mul(mont, ctx):
    """Montgomery-product fold over the leading axis: [B, ..., L] -> [..., L].

    Log-depth halving tree, static shapes (B halves each trace step); the
    combine op is the mod-n^2 Montgomery multiply, i.e. homomorphic
    addition of the underlying plaintexts.
    """
    while mont.shape[0] > 1:
        size = mont.shape[0]
        half = size // 2
        lo, hi = mont[:half], mont[half : 2 * half]
        merged = mg.mont_mul(lo, hi, ctx)
        if size % 2:
            merged = jnp.concatenate([merged, mont[2 * half :]], axis=0)
        mont = merged
    return mont[0]


def reduce_mul_ring(local, ctx, axis_name=BATCH_AXIS):
    """All-reduce across a mesh axis with Montgomery-multiply combine.

    Called inside shard_map. local: [..., L] per-device partial product.
    Returns the product over the axis on every device, in N-1 ppermute
    steps that ride the ICI ring; each hop's transfer overlaps the next
    step's modmul under XLA's async collective scheduling.
    """
    n = jax.lax.axis_size(axis_name)
    perm = [(j, (j + 1) % n) for j in range(n)]

    def body(_, carry):
        acc, buf = carry
        buf = jax.lax.ppermute(buf, axis_name, perm)
        return mg.mont_mul(acc, buf, ctx), buf

    if n == 1:
        return local
    acc, _ = jax.lax.fori_loop(0, n - 1, body, (local, local))
    return acc
