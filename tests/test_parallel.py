"""Mesh-sharded encrypted aggregation on the virtual 8-device CPU mesh.

Validates the shard_map + ppermute ring all-reduce with Montgomery-multiply
combine (phe_tpu.parallel) against host-exact results, including uneven
batch sizes (identity padding) and 2D (dp, mp) meshes over encrypted
vectors.
"""

import jax
import numpy as np
import pytest

import phe_tpu
from phe_tpu.batch import EncryptedBatch
from phe_tpu.parallel import batch_mesh, encrypted_sum_sharded
from phe_tpu.parallel.aggregate import allreduce_mul_mont


@pytest.fixture(scope="module")
def keypair():
    return phe_tpu.generate_paillier_keypair(n_length=256)


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


@pytest.mark.parametrize("batch_size", [8, 16, 5, 13, 1])
def test_encrypted_sum_sharded(keypair, batch_size):
    pub, priv = keypair
    rng = np.random.default_rng(42 + batch_size)
    vals = [float(v) for v in rng.uniform(-100, 100, batch_size).round(4)]
    batch = EncryptedBatch.encrypt(pub, vals)
    mesh = batch_mesh()
    total = encrypted_sum_sharded(batch, mesh)
    np.testing.assert_allclose(total.decrypt(priv), [sum(vals)], rtol=1e-10)


def test_sharded_matches_single_device(keypair):
    pub, priv = keypair
    vals = [1.5, -2.25, 3.0, 0.125, 7.0, -1.0, 2.5, 10.0]
    batch = EncryptedBatch.encrypt(pub, vals)
    local = batch.sum().decrypt(priv)
    dist = encrypted_sum_sharded(batch, batch_mesh()).decrypt(priv)
    assert local == dist


def test_vector_aggregation_2d_mesh(keypair):
    # Encrypted gradient vectors [B, V, L], B sharded dp=4, V sharded mp=2:
    # the FL aggregation layout (SURVEY.md §2.4).
    pub, priv = keypair
    dc = pub.device_context()
    B, V = 4, 6
    rng = np.random.default_rng(7)
    grads = rng.integers(1, 1000, size=(B, V))
    flat = [int(v) for v in grads.reshape(-1)]
    batch = EncryptedBatch.encrypt(pub, flat)
    mont = batch.mont_logical.reshape(B, V, -1)
    mesh = batch_mesh(mp=2)
    out = allreduce_mul_mont(mont, dc.ctx, mesh)  # [V, L]
    summed = EncryptedBatch(pub, out, np.zeros(V, dtype=np.int64), False)
    np.testing.assert_array_equal(
        summed.decrypt(priv), grads.sum(axis=0)
    )


def test_mixed_exponent_alignment(keypair):
    pub, priv = keypair
    vals = [1, 2.5, -0.125, 300, 4.75]  # ints and floats: differing exponents
    batch = EncryptedBatch.encrypt(pub, vals)
    total = encrypted_sum_sharded(batch, batch_mesh())
    np.testing.assert_allclose(total.decrypt(priv), [sum(vals)], rtol=1e-10)


def test_scaling_harness_runs(keypair):
    # The scaling-efficiency sweep (benchmarks.bench_scaling) must at
    # least execute end to end on the CPU mesh: correct rates per device
    # count, efficiency relative to 1 device recorded (the numbers are
    # meaningful on real multi-chip hardware; the harness is validated
    # here so the sweep cannot rot).
    from phe_tpu import benchmarks

    lines = []
    out = benchmarks.bench_scaling(
        keysize=128, batch=32, runs=1, emit=lines.append
    )
    assert 1 in out and 2 in out
    for d, row in out.items():
        assert row["elements_per_s"] > 0
        assert row["scaling_efficiency"] > 0
    assert len(lines) == len(out)
