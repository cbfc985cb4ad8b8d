"""Distributed encrypted aggregation: the FL gradient-sum, mesh-native.

Semantics fixed by the reference (SURVEY.md §2.4): summing encrypted values
is a product of ciphertexts mod n^2 and is fully commutative/associative
(examples/federated_learning_with_encryption.py:122-133 does it as a Python
ring over one process). Here the batch axis is sharded over the mesh "dp"
axis, each device folds its shard with a log-depth Montgomery-multiply tree,
and shards combine with a ppermute ring all-reduce — the multiplicative
analogue of psum, which itself cannot be used because the combine op is not
addition.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from phe_tpu.parallel.mesh import (
    BATCH_AXIS,
    VECTOR_AXIS,
    batch_mesh,
    reduce_mul_ring,
    sharded_batch,
    tree_reduce_mul,
)


def _pspec(ndim, vector_axes):
    """PartitionSpec for a [B, ..., L] tensor with sharded inner axes."""
    spec = [BATCH_AXIS]
    for i in range(ndim - 2):
        spec.append(VECTOR_AXIS if (vector_axes > 0 and i == 0) else None)
    spec.append(None)
    return P(*spec)


def allreduce_mul_mont(mont, ctx, mesh, vector_axes=None,
                       return_sharded=False):
    """Product over the batch axis of a [B, ..., L] Montgomery tensor.

    Shards B over the mesh dp axis (and the first inner axis, if any, over
    mp), reduces locally, then rings the partials around the dp axis with
    Montgomery-multiply combine. Returns [..., L], fully reduced.

    return_sharded=True skips the final row-0 gather and returns the
    [dp, ..., L] all-reduced array (every dp row identical) — required in
    multi-process runs, where row 0 is only addressable on process 0
    (callers read their own ``addressable_shards``).
    """
    if vector_axes is None:
        vector_axes = mont.ndim - 2
    ndev = mesh.shape[BATCH_AXIS]
    pad = (-mont.shape[0]) % ndev
    if pad:
        one = jnp.broadcast_to(
            ctx.one, (pad,) + mont.shape[1:]
        ).astype(mont.dtype)
        mont = jnp.concatenate([mont, one], axis=0)
    spec = _pspec(mont.ndim, vector_axes)
    x = sharded_batch(mont, mesh, vector_axes)

    def local(m):
        r = reduce_mul_ring(tree_reduce_mul(m, ctx), ctx)
        return r[None]

    fn = jax.jit(
        jax.shard_map(
            local, mesh=mesh, in_specs=spec, out_specs=spec, check_vma=False
        )
    )
    out = fn(x)
    return out if return_sharded else out[0]


def encrypted_sum_sharded(batch, mesh=None):
    """Mesh-parallel homomorphic sum of an EncryptedBatch (size-1 result).

    Exponents align to the batch minimum on device first (the reference's
    alignment rule, phe/paillier.py:664-669), then the ciphertext product
    reduces across the mesh.
    """
    from phe_tpu.batch import EncryptedBatch

    if mesh is None:
        mesh = batch_mesh()
    dc = batch.public_key.device_context()
    target = int(batch.exponents.min())
    aligned = batch.decrease_exponent_to(target)
    mont = allreduce_mul_mont(aligned.mont, dc.ctx, mesh, vector_axes=0)
    return EncryptedBatch(
        batch.public_key, mont[None], np.array([target]), False
    )
