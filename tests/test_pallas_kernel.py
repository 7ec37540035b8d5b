"""Fused Pallas EM-stats kernel vs the XLA reference path (interpret mode
on CPU; the real TPU run is exercised by bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lia_ral_tpu.gmm import GmmDiag, em_stats
from lia_ral_tpu.gmm.pallas_kernels import em_stats_fused

# Platform-conditional tolerances: the CPU suite runs f32-exact matmuls
# and keeps the tight regression guard; on the chip both compared paths
# run bf16x3-grade logits in different operation orders, so cross-path
# checks carry the measured TPU budget (the ACCURACY contract vs the
# f64 oracle lives in bench.py / test_at_shape_slow / sweep_fused).
_ON_TPU = jax.default_backend() in ("tpu", "axon")


def _tol(cpu: float, tpu: float) -> float:
    return tpu if _ON_TPU else cpu


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
                               rtol=_tol(1e-4, 1e-2), atol=_tol(1e-4, 1e-2))
    np.testing.assert_allclose(np.asarray(fused.sum_x),
                               np.asarray(ref.sum_x),
                               rtol=_tol(1e-3, 1e-2), atol=_tol(1e-3, 1e-2))
    np.testing.assert_allclose(np.asarray(fused.sum_xx),
                               np.asarray(ref.sum_xx),
                               rtol=_tol(1e-3, 1e-2), atol=_tol(1e-3, 1e-2))
    np.testing.assert_allclose(float(fused.llk), float(ref.llk),
                               rtol=_tol(1e-5, 1e-4))
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


def test_fused_bf16_em_converges_close(rng):
    """bf16 fastMath EM must track f32-grade EM on a properly floored
    training loop.

    Without variance flooring this toy (K=8, D=5) converges to a
    degenerate var≈1e-8 spike whose ~1e8-scale logits bf16 cannot
    represent — exactly the singularity varianceControl exists to
    prevent (TrainTools.cpp:567-592); every real training path floors.
    With flooring, bf16 EM stays within 1 % llk of the f32 path."""
    from lia_ral_tpu.gmm.em import m_step, variance_control
    n, k, d = 512, 8, 5
    centers = rng.standard_normal((k, d)) * 3.0
    lab = rng.integers(0, k, n)
    x = jnp.asarray(centers[lab] + rng.standard_normal((n, d)), jnp.float32)
    w = jnp.ones((n,), jnp.float32)
    gcov = jnp.var(x, axis=0)
    gmm32 = gmm16 = GmmDiag.create(
        np.full(k, 1.0 / k), rng.standard_normal((k, d)),
        rng.random((k, d)) + 0.5)
    for _ in range(20):
        gmm32 = variance_control(
            m_step(em_stats_fused(x, w, gmm32, block=64, interpret=True)),
            0.01, 10.0, gcov)
        gmm16 = variance_control(
            m_step(em_stats_fused(x, w, gmm16, block=64, interpret=True,
                                  compute_dtype=jnp.bfloat16)),
            0.01, 10.0, gcov)
    llk32 = float(em_stats_fused(x, w, gmm32, block=64, interpret=True).llk)
    llk16 = float(em_stats_fused(x, w, gmm16, block=64, interpret=True).llk)
    assert abs(llk32 - llk16) / abs(llk32) < 1e-2, (llk32, llk16)


def test_fused_bf16x3_matches_f32(rng):
    """mxu_precision='bf16x3' (manual 3-pass split for the MXU) must stay
    within ~2^-22-level tolerance of the exact-f32 path."""
    n, k, d = 128, 16, 7
    w_ = rng.random(k) + 0.5
    w_ /= w_.sum()
    gmm = GmmDiag.create(w_, rng.standard_normal((k, d)),
                         rng.random((k, d)) + 0.5)
    x = jnp.asarray(rng.standard_normal((n, d)), jnp.float32)
    w = jnp.asarray(rng.random(n), jnp.float32)
    ref = em_stats_fused(x, w, gmm, block=32, interpret=True)
    x3 = em_stats_fused(x, w, gmm, block=32, interpret=True,
                        mxu_precision="bf16x3")
    np.testing.assert_allclose(np.asarray(x3.n), np.asarray(ref.n),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(x3.sum_x),
                               np.asarray(ref.sum_x), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(x3.sum_xx),
                               np.asarray(ref.sum_xx), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(x3.llk), float(ref.llk), rtol=1e-5)


def test_bw_stats_fused_matches_xla(rng):
    """Per-utterance fused BW kernel vs the vmapped XLA path, with ragged
    masks and non-multiple T."""
    from lia_ral_tpu.fa.stats import bw_stats_batch
    from lia_ral_tpu.gmm.pallas_kernels import bw_stats_fused

    s, t, d, k = 5, 70, 7, 16
    w_ = rng.random(k) + 0.5
    w_ /= w_.sum()
    gmm = GmmDiag.create(w_, rng.standard_normal((k, d)),
                         rng.random((k, d)) + 0.5)
    x = jnp.asarray(rng.standard_normal((s, t, d)), jnp.float32)
    mask = jnp.asarray(rng.random((s, t)) > 0.3, jnp.float32)
    n, f, llk = bw_stats_fused(x, mask, gmm, block=32, interpret=True)
    ref = bw_stats_batch(x, mask, gmm, use_fused=False)
    # cross-path budget (see test_fused_matches_reference)
    np.testing.assert_allclose(np.asarray(n), np.asarray(ref.n),
                               rtol=_tol(1e-4, 1e-2), atol=_tol(1e-4, 1e-2))
    np.testing.assert_allclose(np.asarray(f), np.asarray(ref.f),
                               rtol=_tol(1e-3, 1e-2), atol=_tol(1e-3, 1e-2))
    # llk row: weighted per-utterance log-likelihood
    from lia_ral_tpu.gmm.kernels import frame_llk
    for i in range(s):
        want = float(jnp.sum(frame_llk(x[i], gmm) * mask[i]))
        # cross-path bf16x3 budget on TPU; exact on CPU
        np.testing.assert_allclose(float(llk[i]), want,
                                   rtol=_tol(1e-5, 3e-4))


def test_bw_stats_fused_default_block_paths(rng):
    """r5b block auto-selection: the exact-block single-step path
    (t <= 2048, 8-aligned), the non-aligned fallback (1024 multi-step
    with direct-out accumulation), and the long-utterance multi-step
    path must all agree with the XLA reference."""
    from lia_ral_tpu.fa.stats import bw_stats_batch
    from lia_ral_tpu.gmm.pallas_kernels import bw_stats_fused

    d, k = 5, 16
    w_ = rng.random(k) + 0.5
    w_ /= w_.sum()
    gmm = GmmDiag.create(w_, rng.standard_normal((k, d)),
                         rng.random((k, d)) + 0.5)
    for t in (64, 61, 2060):       # exact-block / non-aligned / >limit
        x = jnp.asarray(rng.standard_normal((3, t, d)), jnp.float32)
        mask = jnp.asarray(rng.random((3, t)) > 0.3, jnp.float32)
        n, f, _ = bw_stats_fused(x, mask, gmm, interpret=True)
        ref = bw_stats_batch(x, mask, gmm, use_fused=False)
        # cross-path budget (same as test_bw_stats_fused_matches_batch):
        # interpret-mode dots on the TPU backend run at bf16-pass grade,
        # and first-order sums have cancellation-prone near-zero entries
        # — so the absolute budget is relative to the ARRAY scale
        f_scale = max(float(np.max(np.abs(np.asarray(ref.f)))), 1.0)
        np.testing.assert_allclose(np.asarray(n), np.asarray(ref.n),
                                   rtol=_tol(1e-4, 1e-2),
                                   atol=_tol(1e-4, 1e-2))
        np.testing.assert_allclose(np.asarray(f), np.asarray(ref.f),
                                   rtol=_tol(1e-3, 1e-2),
                                   atol=_tol(1e-3, 1e-2) * f_scale)
