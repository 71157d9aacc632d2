"""Pallas/MXU kernel parity tests (CPU interpret mode via conftest)."""

import jax.numpy as jnp
import numpy as np

from ground_fusion_tpu.global_layers.brief import hamming_matrix
from ground_fusion_tpu.ops.pallas.hamming import (
    hamming_matrix_mxu,
    hamming_matrix_pallas,
)


def _rand_desc(rng, k):
    return rng.integers(0, 2**32, (k, 8), dtype=np.uint32)


def test_hamming_pallas_matches_swar():
    rng = np.random.default_rng(3)
    da = jnp.asarray(_rand_desc(rng, 37))
    db = jnp.asarray(_rand_desc(rng, 211))
    ref = np.asarray(hamming_matrix(da, db))
    out = np.asarray(hamming_matrix_pallas(da, db))
    assert np.array_equal(ref, out)


def test_hamming_mxu_matches_swar():
    rng = np.random.default_rng(4)
    da = jnp.asarray(_rand_desc(rng, 130))
    db = jnp.asarray(_rand_desc(rng, 65))
    ref = np.asarray(hamming_matrix(da, db))
    out = np.asarray(hamming_matrix_mxu(da, db))
    assert np.array_equal(ref, out)


def test_hamming_identity_and_complement():
    rng = np.random.default_rng(5)
    d = jnp.asarray(_rand_desc(rng, 16))
    self_d = np.asarray(hamming_matrix_pallas(d, d))
    assert np.all(np.diag(self_d) == 0)
    comp = jnp.asarray(np.asarray(d) ^ np.uint32(0xFFFFFFFF))
    flip = np.asarray(hamming_matrix_pallas(d, comp))
    assert np.all(np.diag(flip) == 256)
