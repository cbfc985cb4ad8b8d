"""Mesh parallelism for ciphertext batches.

The reference is single-process (SURVEY.md §2.4: no threads, no distribution;
"multi-party" protocols pass Python objects in one process,
examples/federated_learning_with_encryption.py:213-225). Scaling is therefore
a new, first-class subsystem here, built the TPU way: ciphertext batches are
``uint32[B, V, L]`` limb tensors sharded over a ``jax.sharding.Mesh``, and the
encrypted-aggregation reduce — whose combine op is modular multiplication
mod n^2 (phe/paillier.py:705-719), NOT addition, so ``psum`` does not apply —
is a ``shard_map`` + ``ppermute`` ring all-reduce feeding the Montgomery
multiply kernel at every step.
"""

from phe_tpu.parallel.mesh import (
    batch_mesh,
    reduce_mul_ring,
    sharded_batch,
    tree_reduce_mul,
)
from phe_tpu.parallel.aggregate import encrypted_sum_sharded

__all__ = [
    "batch_mesh",
    "sharded_batch",
    "tree_reduce_mul",
    "reduce_mul_ring",
    "encrypted_sum_sharded",
]
