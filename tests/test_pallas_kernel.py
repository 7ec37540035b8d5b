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


def test_fused_bf16_close_to_f32(rng):
    """compute_dtype=bfloat16 (the -ffast-math analogue) must stay within
    bf16 tolerance of the f32 path: same posteriors up to ~1e-2."""
    n, k, d = 128, 16, 7
    w_ = rng.random(k) + 0.5
    w_ /= w_.sum()
    gmm = GmmDiag.create(w_, rng.standard_normal((k, d)),
                         rng.random((k, d)) + 0.5)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w = jnp.asarray(rng.random(n), jnp.float32)
    ref = em_stats_fused(x, w, gmm, block=32, interpret=True)
    fast = em_stats_fused(x, w, gmm, block=32, interpret=True,
                          compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(fast.n), np.asarray(ref.n),
                               rtol=0.05, atol=0.05)
    np.testing.assert_allclose(np.asarray(fast.sum_x),
                               np.asarray(ref.sum_x), rtol=0.05, atol=0.1)
    np.testing.assert_allclose(np.asarray(fast.sum_xx),
                               np.asarray(ref.sum_xx), rtol=0.05, atol=0.1)
    np.testing.assert_allclose(float(fast.llk), float(ref.llk), rtol=5e-3)
    np.testing.assert_allclose(float(fast.count), float(ref.count),
                               rtol=1e-3)


def test_fused_bf16_em_converges_same(rng):
    """Full EM with the bf16 kernel reaches the same likelihood as f32."""
    from lia_ral_tpu.gmm.em import m_step
    n, k, d = 512, 8, 5
    centers = rng.standard_normal((k, d)) * 3.0
    lab = rng.integers(0, k, n)
    x = jnp.asarray(centers[lab] + rng.standard_normal((n, d)), jnp.float32)
    w = jnp.ones((n,), jnp.float32)
    gmm32 = gmm16 = GmmDiag.create(
        np.full(k, 1.0 / k), rng.standard_normal((k, d)),
        rng.random((k, d)) + 0.5)
    for _ in range(8):
        gmm32 = m_step(em_stats_fused(x, w, gmm32, block=64, interpret=True))
        gmm16 = m_step(em_stats_fused(x, w, gmm16, block=64, interpret=True,
                                      compute_dtype=jnp.bfloat16))
    llk32 = float(em_stats_fused(x, w, gmm32, block=64, interpret=True).llk)
    llk16 = float(em_stats_fused(x, w, gmm16, block=64, interpret=True).llk)
    assert abs(llk32 - llk16) / abs(llk32) < 5e-3
