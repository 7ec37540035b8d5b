"""Benchmark: north-star pipeline throughput in audio-seconds/s/chip.

North-star metric (BASELINE.md): audio-seconds/s/chip for **UBM EM +
i-vector extraction**.  One pipeline pass over N frames (10 ms each) =

  A. one UBM-EM sufficient-statistics pass + M-step (K=2048, D=39) via
     the fused Pallas kernel (TrainWorld hot loop,
     AccumulateStat.cpp:103-152);
  B. one Baum-Welch (N,F) stats pass over the same frames as utterances
     (ComputeJFAStats / TVAcc hot loop, AccumulateTVStat.cpp:281-351);
  C. exact i-vector extraction, R=400, per utterance
     (IvExtractor estimateW, AccumulateTVStat.cpp:2103-2267).

vs_baseline divides by a MEASURED CPU figure (BASELINE_CPU.json): the
reference's scalar hot loops re-implemented in C++ (native/
em_baseline.cpp for EM, native/iv_baseline.cpp for BW stats + exact
i-vector estimateW), measured on this machine and extrapolated to 32
cores at PERFECT scaling, harmonically combined across the three
stages (963 audio-s/s) — a SAME-SCOPE A+B+C comparison.  The EM-only
ratio is reported separately as vs_baseline_em_only.

Measurement discipline (r5):
* every stage wall is the MEDIAN of 3 independent timed repeats (each
  itself an average over chained fresh-input executions), and the JSON
  carries the relative spread (max−min)/median per stage — one slow
  repeat through the axon tunnel no longer moves the headline;
* mfu_* fields give the roofline account: achieved FLOP/s on each
  stage's logical matmul work vs the v5e bf16 peak (1.97e14 FLOP/s),
  `mxu_*` the same with the bf16x3 3-pass splits counted as hardware
  work, and `hbm_frac_ivextract` the extraction stage's achieved HBM
  bandwidth vs the 8.19e11 B/s peak (the PCG matvecs are
  bandwidth-bound) — scaling-book v5e numbers;
* the `*_faststats` fields measure the validated fastStats tier
  (stats_pass="bf16nx": exact f32 occupancies, bf16-rounded S/F sums —
  EER-invariant at full scale, MILESTONE.md tier table); the headline
  stays on the parity-default x3 tier.

Measurement notes for the axon tunnel platform:
* ``block_until_ready`` does not synchronise — only a value fetch does;
* remote compiles are expensive (30-450 s) and must be excluded: warm up
  with a fetch, then time fresh executions;
* iterations are chained (model feeds back) so no request/result caching
  can short-circuit the work.
"""

from __future__ import annotations

import json
import os
import statistics
import time

import numpy as np

K = 2048
D = 39
R = 400
N_FRAMES = 1_000_000        # 10000 audio-seconds per pass
T_UTT = 2000                # frames per utterance for stages B/C
CHUNK = 16384
REPEATS = 3                 # median-of-3 per stage (r5 discipline)

# TPU v5e single-chip peaks (scaling-book numbers)
V5E_PEAK_FLOPS = 1.97e14    # bf16 FLOP/s
V5E_HBM_BPS = 8.19e11       # HBM bytes/s

_here = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(_here, "BASELINE_CPU.json")) as _f:
    _cpu = json.load(_f)
BASELINE_AUDIO_S_PER_S = float(_cpu["baseline_32core_audio_s_per_s"])
# full-pipeline CPU baseline (A+B+C measured separately, harmonically
# combined — a corpus second must pass all three stages); falls back to
# the EM-only figure for old baseline files
BASELINE_PIPELINE = float(_cpu.get(
    "baseline_32core_pipeline_audio_s_per_s", BASELINE_AUDIO_S_PER_S))


def timed_median(run_iters, iters: int):
    """Median-of-REPEATS wall per chained execution + relative spread."""
    walls = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        run_iters(iters)
        walls.append((time.perf_counter() - t0) / iters)
    med = statistics.median(walls)
    return med, (max(walls) - min(walls)) / med


def main() -> None:
    import jax
    import jax.numpy as jnp
    from lia_ral_tpu.fa.stats import BwStats
    from lia_ral_tpu.fa.tv import TvModel, estimate_w
    from lia_ral_tpu.gmm.em import m_step
    from lia_ral_tpu.gmm.kernels import em_stats_chunked
    from lia_ral_tpu.gmm.model import GmmDiag
    from lia_ral_tpu.gmm.pallas_kernels import em_stats_fused

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N_FRAMES, D)), jnp.float32)
    w = jnp.ones((N_FRAMES,), jnp.float32)
    gmm = GmmDiag.create(np.full(K, 1.0 / K),
                         rng.standard_normal((K, D)).astype(np.float32),
                         (rng.random((K, D)) + 0.5).astype(np.float32))
    audio_seconds = N_FRAMES / 100.0
    a_aug = 2 * D + 2           # augmented design width [x², x, 1, 0]

    # ---- stage A: fused EM iteration --------------------------------------
    def em_timer(stats_pass: str):
        @jax.jit
        def em_iteration(x, w, gmm):
            stats = em_stats_fused(x, w, gmm, stats_pass=stats_pass)
            return m_step(stats), stats.llk

        g1, llk = em_iteration(x, w, gmm)
        float(llk)                                # compile + one execution

        def run(iters):
            g, llk = g1, None
            for _ in range(iters):
                g, llk = em_iteration(x, w, g)
            float(llk)
        return run

    t_em, sp_em = timed_median(em_timer("x3"), 5)
    t_em_fs, _ = timed_median(em_timer("bf16nx"), 5)

    # on-chip validation of the fused kernel vs the XLA reference path
    # (both now run the density/stat matmuls at Precision.HIGHEST; the
    # measured deviation is reported so the tolerance is auditable)
    sub = 65536
    st_f = em_stats_fused(x[:sub], w[:sub], gmm)
    st_c = em_stats_chunked(x[:sub], w[:sub], gmm, chunk=CHUNK)
    n_c = np.asarray(st_c.n)
    dev_n = float(np.max(np.abs(np.asarray(st_f.n) - n_c) / (n_c + 1e-9)))
    dev_llk = (abs(float(st_f.llk) - float(st_c.llk))
               / max(abs(float(st_c.llk)), 1.0))
    fused_ok = bool(dev_n < 2e-3 and dev_llk < 1e-5)

    # ---- stage B: Baum-Welch (N,F) stats over utterances ------------------
    # the public path (fa.stats.bw_stats_batch) dispatches to the fused
    # per-utterance Pallas kernel on TPU
    from lia_ral_tpu.fa.stats import bw_stats_batch

    s_utts = N_FRAMES // T_UTT                    # 500
    xu = x[: s_utts * T_UTT].reshape(s_utts, T_UTT, D)
    mu_mask = jnp.ones((s_utts,), jnp.float32)
    wm = jnp.ones((s_utts, T_UTT), jnp.float32)

    def bw_timer(stats_pass: str):
        @jax.jit
        def bw_pass(xu, gmm, eps):
            # chain through the MODEL (like stage A): every timed
            # execution scores against fresh means, so no request/result
            # caching can short-circuit it — and unlike perturbing the
            # 328 MB input tensor, the perturbation pass costs (K,D)
            # work, keeping the measurement about the kernel
            g = gmm.replace(means=gmm.means * (1.0 + eps))
            st = bw_stats_batch(xu, wm, g, stats_pass=stats_pass)
            return st.n, st.f

        zero = jnp.zeros((), jnp.float32)
        n0, f0 = bw_pass(xu, gmm, zero)
        float(n0[0, 0])

        def run(iters):
            n_st = n0
            for _ in range(iters):
                n_st, _ = bw_pass(xu, gmm, n_st[0, 0] * 1e-9)
            float(n_st[0, 0])
        return run, (n0, f0)

    run_bw, (n_st, f_st) = bw_timer("x3")
    t_bw, sp_bw = timed_median(run_bw, 3)
    run_bw_fs, _ = bw_timer("bf16nx")
    t_bw_fs, _ = timed_median(run_bw_fs, 3)

    # ---- stage C: exact i-vector extraction (R=400) -----------------------
    t_mat = jnp.asarray(rng.standard_normal((R, K, D)) * 0.01, jnp.float32)
    model = TvModel.from_ubm(t_mat, gmm)
    stats = BwStats(n=n_st * mu_mask[:, None],
                    f=f_st * mu_mask[:, None, None])

    @jax.jit
    def extract(stats, eps):
        # fresh-input chaining (see bw_pass): scale N by a value derived
        # from the previous i-vectors so every timed pass is new work
        st = BwStats(n=stats.n * (1.0 + eps), f=stats.f)
        return estimate_w(st, model)

    wv0 = extract(stats, jnp.zeros((), jnp.float32))
    float(wv0[0, 0])

    def run_w(iters):
        wv = wv0
        for _ in range(iters):
            wv = extract(stats, wv[0, 0] * 1e-9)
        float(wv[0, 0])

    t_w, sp_w = timed_median(run_w, 3)

    # on-chip validation of the PCG extraction solver vs the batched-
    # Cholesky path (estimate_w default since r4; tolerance auditable)
    sub_stats = BwStats(n=stats.n[:64], f=stats.f[:64])
    w_pcg = np.asarray(estimate_w(sub_stats, model, solver="pcg"))
    w_chol = np.asarray(estimate_w(sub_stats, model, solver="cholesky"))
    pcg_dev = float(np.max(np.abs(w_pcg - w_chol))
                    / max(np.max(np.abs(w_chol)), 1e-9))
    pcg_ok = bool(pcg_dev < 1e-4)

    # ---- stage C': eigen-decomposition approximate extraction -------------
    # (IvExtractor.cpp:253 / AccumulateTVStat.cpp:2556) — the documented
    # high-throughput mode; EER cost measured end-to-end by
    # scripts/milestone_eer.py --ivApprox eigenDecomposition
    from lia_ral_tpu.fa.tv import (approximate_tctc, eigen_decompose_w,
                                   estimate_w_eigen_decomposition,
                                   weighted_cov)

    q_mat = eigen_decompose_w(weighted_cov(model, gmm.weights))
    d_mat = approximate_tctc(model, q_mat)

    @jax.jit
    def extract_approx(stats, eps):
        st = BwStats(n=stats.n * (1.0 + eps), f=stats.f)
        return estimate_w_eigen_decomposition(st, model, d_mat, q_mat)

    wa0 = extract_approx(stats, jnp.zeros((), jnp.float32))
    float(wa0[0, 0])

    def run_wa(iters):
        wa = wa0
        for _ in range(iters):
            wa = extract_approx(stats, wa[0, 0] * 1e-9)
        float(wa[0, 0])

    t_wa, _ = timed_median(run_wa, 3)

    # ---- roofline accounting (PERF.md §9) ---------------------------------
    # stages A/B: two logical (N,A)x(A,K)-shape matmuls per frame block
    # (density + fused stat contraction) = 4·N·K·A flops; the bf16x3
    # hi/lo split issues 3 MXU passes per logical matmul (mxu_* counts
    # that hardware work).  Stage C: L build 2·S·K·R² + aux 2·S·K·D·R +
    # tett 2·K·R²·D + PCG basis 4·R²·K·D + 20 iters × ~6·S·R² matvec/
    # precond work; HBM floor = the (S,R²) L block written once and
    # re-read per PCG iteration + the (S,K,D) stats read.
    fl_ab = 4.0 * N_FRAMES * K * a_aug
    fl_c = (2.0 * s_utts * K * R * R + 2.0 * s_utts * K * D * R
            + 2.0 * K * R * R * D + 4.0 * R * R * K * D
            + 20 * 6.0 * s_utts * R * R)
    by_c = (s_utts * R * R * 4.0 * (1 + 20) + s_utts * K * D * 4.0
            + s_utts * K * 4.0)

    total = t_em + t_bw + t_w
    rate = audio_seconds / total
    rate_fs = audio_seconds / (t_em_fs + t_bw_fs + t_w)
    print(json.dumps({
        "metric": f"UBM-EM + i-vector pipeline audio-s/s/chip "
                  f"(K={K}, D={D}, R={R})",
        "value": round(rate, 1),
        "unit": "audio_s/s/chip",
        # SAME-SCOPE headline: TPU A+B+C vs measured CPU A+B+C
        "vs_baseline": round(rate / BASELINE_PIPELINE, 2),
        # EM-vs-EM same-scope ratio (the headline vs_baseline above is
        # the A+B+C same-scope ratio against BASELINE_PIPELINE)
        "vs_baseline_em_only": round(audio_seconds / t_em
                                     / BASELINE_AUDIO_S_PER_S, 2),
        "em_audio_s_per_s": round(audio_seconds / t_em, 1),
        "bw_stats_audio_s_per_s": round(audio_seconds / t_bw, 1),
        "ivextract_audio_s_per_s": round(audio_seconds / t_w, 1),
        "ivextract_approx_audio_s_per_s": round(audio_seconds / t_wa, 1),
        # fastStats tier (bf16nx — EER-invariant, MILESTONE.md tier table)
        "value_faststats": round(rate_fs, 1),
        "em_audio_s_per_s_faststats": round(audio_seconds / t_em_fs, 1),
        "bw_stats_audio_s_per_s_faststats": round(audio_seconds / t_bw_fs,
                                                  1),
        # median-of-3 spreads, (max−min)/median per stage
        "stage_spread": {"em": round(sp_em, 3), "bw": round(sp_bw, 3),
                         "ivextract": round(sp_w, 3)},
        # roofline vs v5e peaks (1.97e14 bf16 FLOP/s, 8.19e11 HBM B/s)
        "mfu_em": round(fl_ab / t_em / V5E_PEAK_FLOPS, 4),
        "mxu_em": round(3 * fl_ab / t_em / V5E_PEAK_FLOPS, 4),
        "mfu_bw": round(fl_ab / t_bw / V5E_PEAK_FLOPS, 4),
        "mxu_bw": round(3 * fl_ab / t_bw / V5E_PEAK_FLOPS, 4),
        "mfu_ivextract": round(fl_c / t_w / V5E_PEAK_FLOPS, 4),
        "hbm_frac_ivextract": round(by_c / t_w / V5E_HBM_BPS, 4),
        "pallas_fused_allclose_onchip": fused_ok,
        "fused_vs_xla_max_occ_relerr": round(dev_n, 8),
        "pcg_vs_cholesky_allclose_onchip": pcg_ok,
        "pcg_vs_cholesky_max_relerr": round(pcg_dev, 8),
        "baseline_src": "BASELINE_CPU.json (measured, 32-core perfect-"
                        "scaling, A+B+C harmonically combined)",
    }))


if __name__ == "__main__":
    main()
