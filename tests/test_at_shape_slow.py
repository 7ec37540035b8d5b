"""At-shape correctness tier (@pytest.mark.slow — excluded by default).

VERDICT r2 weak #3: unit tests ran at K≈20-64 while milestone shapes
lived only in timing scripts.  These assert CORRECTNESS at the
BASELINE.md config-3/4 shapes (K=2048/R=400 TV, K=512 rv=300/ru=100
JFA):

    pytest -m slow tests/test_at_shape_slow.py            # CPU (slow)
    LIA_RAL_TPU_TEST_PLATFORM=axon pytest -m slow ...     # on the chip

The fused-vs-XLA agreement check needs the TPU (Pallas kernels do not
lower on CPU) and skips elsewhere; bench.py re-checks it on-chip every
round as well.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow

K, D, R = 2048, 39, 400


def _synth_tv_world(rng, k=K, d=D):
    from lia_ral_tpu.gmm.model import GmmDiag
    w = rng.random(k) + 0.5
    w /= w.sum()
    return GmmDiag.create(w, rng.standard_normal((k, d)) * 1.5,
                          rng.random((k, d)) * 0.5 + 0.8)


def _session_frames(rng, gmm, shift, t):
    k, d = gmm.means.shape
    comp = rng.integers(0, k, t)
    return ((np.asarray(gmm.means) + shift)[comp]
            + rng.standard_normal((t, d)).astype(np.float32)
            / np.sqrt(np.asarray(gmm.cov_inv))[comp]).astype(np.float32)


def test_tv_em_llk_monotone_at_shape():
    """TV EM total LLK rises over iterations at K=2048/R=400 (reference
    verifyEMLK, AccumulateTVStat.cpp:1655; computeLLK flow
    TotalVariability.cpp:171)."""
    from lia_ral_tpu.fa.stats import BwStats, bw_stats_batch
    from lia_ral_tpu.fa.tv import (TvModel, get_speaker_model, init_t,
                                   estimate_w, tv_em_iteration)
    from lia_ral_tpu.gmm.kernels import frame_llk
    rng = np.random.default_rng(42)
    gmm = _synth_tv_world(rng)
    t_true = rng.standard_normal((R, K, D)).astype(np.float32) * 0.05
    s, t_utt = 16, 600
    xs = np.stack([_session_frames(
        rng, gmm, np.einsum("r,rkd->kd", rng.standard_normal(R), t_true),
        t_utt) for _ in range(s)])
    feats = jnp.asarray(xs)
    mask = jnp.ones(feats.shape[:2], jnp.float32)
    stats = bw_stats_batch(feats, mask, gmm, use_fused=False)
    stats = BwStats(n=stats.n, f=stats.f)
    model = init_t(jax.random.key(0), R, gmm, scale=0.05)

    def total_llk(model):
        w_all = estimate_w(stats, model, chunk=16)
        tot = 0.0
        for i in range(4):      # LLK monitor over the first sessions
            spk = get_speaker_model(model, w_all[i], gmm)
            tot += float(jnp.mean(frame_llk(feats[i], spk)))
        return tot

    llks = [total_llk(model)]
    for _ in range(3):
        model, _ = tv_em_iteration(stats, model, chunk=16, min_div=True)
        llks.append(total_llk(model))
    assert all(b >= a - 1e-4 * abs(a) for a, b in zip(llks, llks[1:])), llks
    assert llks[-1] > llks[0], llks


def test_jfa_llk_monotone_at_shape():
    """JFA V-substep LLK monitor rises at config-4 shape (K=512,
    rv=300, ru=100) with orthonormalizeV on — reference JFAAcc::getLLK
    (AccumulateJFAStat.cpp:4803) over EigenVoice.cpp:71-163 iterations."""
    from lia_ral_tpu.fa.jfa import (JfaModel, JfaStats, jfa_v_iteration,
                                    jfa_verify_em_llk, orthonormalize_v)
    from lia_ral_tpu.fa.stats import bw_stats_batch
    k, d, rv, ru = 512, 39, 300, 100
    rng = np.random.default_rng(7)
    gmm = _synth_tv_world(rng, k=k, d=d)
    v_true = rng.standard_normal((rv, k, d)).astype(np.float32) * 0.08
    n_spk, sess, t_utt = 24, 2, 400
    xs, sess_spk = [], []
    for s in range(n_spk):
        shift = np.einsum("r,rkd->kd", rng.standard_normal(rv), v_true)
        for _ in range(sess):
            xs.append(_session_frames(rng, gmm, shift, t_utt))
            sess_spk.append(s)
    feats = jnp.asarray(np.stack(xs))
    mask = jnp.ones(feats.shape[:2], jnp.float32)
    st = bw_stats_batch(feats, mask, gmm, use_fused=False)
    stats = JfaStats.from_sessions(st, np.asarray(sess_spk), n_spk)
    model = JfaModel.init(jax.random.key(1), rv, ru, gmm, scale=0.01)
    h = feats.shape[0]
    x = jnp.zeros((h, ru), jnp.float32)
    z = jnp.zeros((n_spk, k, d), jnp.float32)
    y = jnp.zeros((n_spk, rv), jnp.float32)

    def monitor(model, y):
        return jfa_verify_em_llk(feats, mask, stats, model,
                                 jnp.asarray(gmm.weights), y, x, z,
                                 max_sessions=4)

    # plain EM iterations carry the monotonicity guarantee; the optional
    # orthonormalizeV is a conditioning projection OUTSIDE the EM bound
    # (the reference applies it between iterations without re-verifying
    # LLK, EigenVoice.cpp:142-150) and is span-checked separately below
    llks = [monitor(model, y)]
    for _ in range(3):
        model, y = jfa_v_iteration(stats, model, x, z)
        llks.append(monitor(model, y))
    assert all(b >= a - 1e-4 * abs(a) for a, b in zip(llks, llks[1:])), llks
    assert llks[-1] > llks[0], llks

    om = orthonormalize_v(model)
    vf = np.asarray(om.v).reshape(rv, -1)
    np.testing.assert_allclose(vf @ vf.T, np.eye(rv), atol=1e-3)
    # same leading span: projecting the trained V on the orthonormal
    # basis reproduces it
    v0 = np.asarray(model.v).reshape(rv, -1)
    recon = (v0 @ vf.T) @ vf
    np.testing.assert_allclose(recon, v0, rtol=1e-3, atol=1e-4)


@pytest.mark.skipif(jax.default_backend() not in ("tpu", "axon"),
                    reason="Pallas kernels need the TPU backend")
def test_fused_vs_xla_stats_at_shape():
    """Fused Pallas EM/BW stats == XLA path at K=2048/D=39 (occupancy
    rel-err ≤ 1e-3) — the bench.py on-chip check as a pinned test."""
    from lia_ral_tpu.gmm.kernels import em_stats_chunked
    from lia_ral_tpu.gmm.pallas_kernels import bw_stats_fused, em_stats_fused
    rng = np.random.default_rng(3)
    gmm = _synth_tv_world(rng)
    n = 65536
    x = jnp.asarray(rng.standard_normal((n, D)), jnp.float32)
    w = jnp.ones((n,), jnp.float32)
    st_f = em_stats_fused(x, w, gmm)
    st_c = em_stats_chunked(x, w, gmm, chunk=8192)
    n_c = np.asarray(st_c.n)
    rel = np.max(np.abs(np.asarray(st_f.n) - n_c) / (n_c + 1e-9))
    # both paths are f32-grade approximations of the f64 oracle (each
    # ≤ ~5e-4 against it, scripts/sweep_fused.py); a CROSS-path check
    # carries the sum of both budgets
    assert rel < 2e-3, rel
    xu = x.reshape(16, 4096, D)
    wu = w.reshape(16, 4096)
    nf, ff, _ = bw_stats_fused(xu, wu, gmm)
    from lia_ral_tpu.fa.stats import accumulate_bw_stats
    n0, f0 = accumulate_bw_stats(xu[0], wu[0], gmm)
    # cross-path budget as above: two ~5e-4 f32-grade approximations
    assert np.max(np.abs(np.asarray(nf[0]) - np.asarray(n0))
                  / (np.asarray(n0) + 1e-9)) < 2e-3


# ---------------------------------------------------------------------------
# Sharded == serial AT MILESTONE SHAPES (round-4: the unit-tier
# equivalents run at toy shapes; these pin multi-chip correctness at the
# BASELINE.md config shapes on the 8-virtual-device CPU mesh).

def test_sharded_tv_e_step_equals_serial_at_shape(rng_seed=7):
    """Speaker-sharded TV E-step == serial at K=2048/D=39/R=400
    (threaded estimateAandC merge, AccumulateTVStat.cpp:1944)."""
    from lia_ral_tpu.fa.stats import BwStats
    from lia_ral_tpu.fa.tv import init_t, tv_e_step
    from lia_ral_tpu.parallel import make_mesh
    from lia_ral_tpu.parallel.sharding import sharded_tv_e_step

    rng = np.random.default_rng(rng_seed)
    gmm = _synth_tv_world(rng)
    model = init_t(jax.random.key(0), R, gmm)
    s = 16
    stats = BwStats(
        n=jnp.asarray(rng.random((s, K)) * 30 + 1, jnp.float32),
        f=jnp.asarray(rng.standard_normal((s, K, D)) * 5, jnp.float32))
    mesh = make_mesh()
    w_ser, acc_ser = tv_e_step(stats, model, chunk=8)
    w_sh, acc_sh = sharded_tv_e_step(mesh, stats, model, chunk=2)
    np.testing.assert_allclose(np.asarray(w_sh), np.asarray(w_ser),
                               rtol=5e-3, atol=5e-3)
    for a, b in zip(jax.tree.leaves(acc_ser), jax.tree.leaves(acc_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)


def test_sharded_jfa_v_equals_serial_at_shape():
    """Speaker-sharded JFA V iteration == serial at K=512/D=39/rv=300
    (config 4; threaded estimateVEVT/estimateYandV merge,
    AccumulateJFAStat.cpp:1255/2457)."""
    from lia_ral_tpu.fa.jfa import JfaModel, JfaStats, jfa_v_iteration
    from lia_ral_tpu.fa.stats import BwStats
    from lia_ral_tpu.parallel import make_mesh
    from lia_ral_tpu.parallel.sharding import sharded_jfa_v_iteration

    rng = np.random.default_rng(11)
    k, d, rv, ru = 512, 39, 300, 100
    gmm = _synth_tv_world(rng, k=k, d=d)
    model = JfaModel.init(jax.random.key(1), rv, ru, gmm, scale=0.1)
    s, sess_per = 16, 2
    h = s * sess_per
    spk = BwStats(
        n=jnp.asarray(rng.random((s, k)) * 40 + 2, jnp.float32),
        f=jnp.asarray(rng.standard_normal((s, k, d)) * 5, jnp.float32))
    sess = BwStats(
        n=jnp.asarray(np.repeat(np.asarray(spk.n), sess_per, 0) / sess_per,
                      jnp.float32),
        f=jnp.asarray(np.repeat(np.asarray(spk.f), sess_per, 0) / sess_per,
                      jnp.float32))
    stats = JfaStats(spk=spk, sess=sess,
                     sess_spk=jnp.asarray(
                         np.repeat(np.arange(s), sess_per), jnp.int32))
    x = jnp.asarray(rng.standard_normal((h, ru)), jnp.float32) * 0.1
    z = jnp.zeros_like(spk.f)
    mesh = make_mesh()
    mv_ser, y_ser = jfa_v_iteration(stats, model, x, z)
    mv_shd, y_shd = sharded_jfa_v_iteration(mesh, stats, model, x, z)
    # tolerance = the measured reduction-order noise FLOOR at this
    # shape: serial vs speaker/session-permuted serial deviates by up to
    # 6.2e-3 max / 1.3e-4 mean on V on the CPU f32 path (one-off
    # diagnostic, r4); on the chip the bf16x3 matmul path's fusion
    # differences reach 1.5e-2 max (measured 1.41e-2 running this tier
    # with LIA_RAL_TPU_TEST_PLATFORM=axon).  The MEAN bound is the tight
    # invariant; the max bound guards against gross errors only.
    dv = np.abs(np.asarray(mv_shd.v) - np.asarray(mv_ser.v))
    assert dv.max() < 2e-2 and dv.mean() < 5e-4
    dy = np.abs(np.asarray(y_shd) - np.asarray(y_ser))
    assert dy.max() < 2e-2 and dy.mean() < 1e-3


def test_sharded_plda_em_equals_serial_at_shape():
    """Session-sharded PLDA EM + model-sharded scoring == serial at
    R=400/rank-150 with 512 dev sessions (config 5; threaded
    getExpectedValues / pldaScoring merge, PldaTools.cpp:2647/4061)."""
    from lia_ral_tpu.backend.ivnorm import DevSet
    from lia_ral_tpu.backend.plda import (PldaModel, plda_em_iteration,
                                          plda_llr)
    from lia_ral_tpu.parallel import make_mesh
    from lia_ral_tpu.parallel.sharding import (sharded_plda_em_iteration,
                                               sharded_plda_llr)

    rng = np.random.default_rng(13)
    r, rf, n_spk, sess = 400, 150, 128, 4
    h = rng.standard_normal((n_spk, rf))
    f_true = rng.standard_normal((r, rf)) * 0.5
    vecs = (np.repeat(h, sess, 0) @ f_true.T
            + rng.standard_normal((n_spk * sess, r)) * 0.4)
    labels = [f"s{i // sess}" for i in range(n_spk * sess)]
    dev = DevSet.from_labels(vecs.astype(np.float32), labels)
    model = PldaModel.init(jax.random.key(2), r, rf, 0,
                           data_mean=vecs.mean(0),
                           data_cov=np.cov(vecs.T))
    mesh = make_mesh()
    ser = plda_em_iteration(model, dev)
    shd = sharded_plda_em_iteration(mesh, model, dev)
    for a, b in zip(jax.tree.leaves(shd), jax.tree.leaves(ser)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)
    enroll = jnp.asarray(rng.standard_normal((40, r)), jnp.float32)
    ns = jnp.asarray(rng.integers(1, 4, 40), jnp.float32)
    test = jnp.asarray(rng.standard_normal((64, r)), jnp.float32)
    s_ser = np.asarray(plda_llr(ser, enroll, ns, test))
    s_shd = np.asarray(sharded_plda_llr(mesh, ser, enroll, ns, test))
    np.testing.assert_allclose(s_shd, s_ser, rtol=5e-3, atol=5e-3)


def test_estimate_w_pcg_equals_cholesky_at_shape():
    """PCG vs Cholesky extraction at K=2048/D=39/R=400 (the shape whose
    conditioning the preconditioner was designed for): f32-roundoff
    agreement, measured 4.9e-7 max rel in the design study."""
    from lia_ral_tpu.fa.stats import BwStats
    from lia_ral_tpu.fa.tv import estimate_w, init_t

    rng = np.random.default_rng(17)
    gmm = _synth_tv_world(rng)
    model = init_t(jax.random.key(5), R, gmm)
    s = 24
    stats = BwStats(
        n=jnp.asarray(rng.random((s, K)) * 2.0, jnp.float32),
        f=jnp.asarray(rng.standard_normal((s, K, D)) * 3, jnp.float32))
    w_pcg = np.asarray(estimate_w(stats, model, chunk=8, solver="pcg"))
    w_chol = np.asarray(estimate_w(stats, model, chunk=8,
                                   solver="cholesky"))
    scale = np.abs(w_chol).max()
    assert np.abs(w_pcg - w_chol).max() / scale < 1e-4


@pytest.mark.skipif(len(jax.devices()) < 8,
                    reason="needs the 8-virtual-device CPU mesh "
                           "(single real chip can't host a 4x2 mesh)")
def test_sharded_tv_e_step_2d_beyond_hbm_shape():
    """2-D (speakers x components) TV E-step == serial at K=4096/R=600
    — the K·R² scale whose tett (5.9 GB) + A accumulators EXCEED one
    v5e HBM (PERF.md §8: remote compile fails single-chip at this
    K/R; the component-axis sharding halves per-device state).  tett
    and A are (K,R,R) — independent of D — so D=39 keeps the >HBM
    property while fitting this harness's CPU budget.  Runs on the
    virtual CPU mesh where host RAM holds both paths; pins the
    sharding is correct at exactly the shape it exists for."""
    from lia_ral_tpu.fa.stats import BwStats
    from lia_ral_tpu.fa.tv import init_t, tv_e_step
    from lia_ral_tpu.parallel import make_mesh
    from lia_ral_tpu.parallel.sharding import sharded_tv_e_step_2d

    k, d, r, s = 4096, 39, 600, 2
    rng = np.random.default_rng(23)
    gmm = _synth_tv_world(rng, k=k, d=d)
    model = init_t(jax.random.key(11), r, gmm)
    stats = BwStats(
        n=jnp.asarray(rng.random((s, k)) * 30 + 1, jnp.float32),
        f=jnp.asarray(rng.standard_normal((s, k, d)) * 5, jnp.float32))
    mesh = make_mesh(n_data=4, n_model=2)
    w_ser, acc_ser = tv_e_step(stats, model, chunk=2)
    w_sh, acc_sh = sharded_tv_e_step_2d(stats=stats, model=model,
                                        mesh=mesh, chunk=1)
    np.testing.assert_allclose(np.asarray(w_sh), np.asarray(w_ser),
                               rtol=5e-3, atol=5e-3)
    for a, b in zip(jax.tree.leaves(acc_ser), jax.tree.leaves(acc_sh)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)
