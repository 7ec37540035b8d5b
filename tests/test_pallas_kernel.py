"""Fused Pallas EM-stats kernel vs the XLA reference path (interpret mode
on CPU; the real TPU run is exercised by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lia_ral_tpu.gmm import GmmDiag, em_stats
from lia_ral_tpu.gmm.pallas_kernels import em_stats_fused


@pytest.mark.parametrize("n,k,d", [(96, 8, 5), (130, 16, 7)])
def test_fused_matches_reference(rng, n, k, d):
    w_ = rng.random(k) + 0.5
    w_ /= w_.sum()
    gmm = GmmDiag.create(w_, rng.standard_normal((k, d)),
                         rng.random((k, d)) + 0.5)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w = jnp.asarray(rng.random(n), jnp.float32)
    ref = em_stats(x, w, gmm)
    fused = em_stats_fused(x, w, gmm, block=32, interpret=True)
    np.testing.assert_allclose(np.asarray(fused.n), np.asarray(ref.n),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(fused.sum_x),
                               np.asarray(ref.sum_x), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(fused.sum_xx),
                               np.asarray(ref.sum_xx), rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(float(fused.llk), float(ref.llk), rtol=1e-5)
    np.testing.assert_allclose(float(fused.count), float(ref.count),
                               rtol=1e-6)


def test_fused_padding(rng):
    """Non-multiple N is padded with zero weights."""
    k, d = 4, 3
    gmm = GmmDiag.uniform_init(k, d)
    x = jnp.asarray(rng.standard_normal((45, d)), jnp.float32)
    w = jnp.ones(45, jnp.float32)
    fused = em_stats_fused(x, w, gmm, block=32, interpret=True)
    assert float(fused.count) == 45.0
