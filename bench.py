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

Also validates the fused Pallas kernel ON-CHIP against the reference XLA
path (allclose at K=2048) — reported in the same JSON line.

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
import time

import numpy as np

K = 2048
D = 39
R = 400
N_FRAMES = 1_000_000        # 10000 audio-seconds per pass
T_UTT = 2000                # frames per utterance for stages B/C
CHUNK = 16384

_here = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(_here, "BASELINE_CPU.json")) as _f:
    _cpu = json.load(_f)
BASELINE_AUDIO_S_PER_S = float(_cpu["baseline_32core_audio_s_per_s"])
# full-pipeline CPU baseline (A+B+C measured separately, harmonically
# combined — a corpus second must pass all three stages); falls back to
# the EM-only figure for old baseline files
BASELINE_PIPELINE = float(_cpu.get(
    "baseline_32core_pipeline_audio_s_per_s", BASELINE_AUDIO_S_PER_S))


def main() -> None:
    import jax
    import jax.numpy as jnp
    from lia_ral_tpu.fa.stats import BwStats
    from lia_ral_tpu.fa.tv import TvModel, estimate_w
    from lia_ral_tpu.gmm.em import m_step
    from lia_ral_tpu.gmm.kernels import em_stats_chunked, llk_and_posteriors
    from lia_ral_tpu.gmm.model import GmmDiag
    from lia_ral_tpu.gmm.pallas_kernels import em_stats_fused

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N_FRAMES, D)), jnp.float32)
    w = jnp.ones((N_FRAMES,), jnp.float32)
    gmm = GmmDiag.create(np.full(K, 1.0 / K),
                         rng.standard_normal((K, D)).astype(np.float32),
                         (rng.random((K, D)) + 0.5).astype(np.float32))
    audio_seconds = N_FRAMES / 100.0

    # ---- stage A: fused EM iteration --------------------------------------
    @jax.jit
    def em_iteration(x, w, gmm):
        stats = em_stats_fused(x, w, gmm)
        return m_step(stats), stats.llk

    g1, llk = em_iteration(x, w, gmm)
    float(llk)                                    # compile + one execution
    iters = 5
    t0 = time.perf_counter()
    g = g1
    for _ in range(iters):
        g, llk = em_iteration(x, w, g)
    float(llk)
    t_em = (time.perf_counter() - t0) / iters

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

    @jax.jit
    def bw_pass(xu, gmm, shift):
        # `shift` chains each iteration on the previous result, so every
        # timed execution sees FRESH input data (like stage A's chained
        # model) and no request/result caching can short-circuit it
        st = bw_stats_batch(xu + shift, wm, gmm)
        return st.n, st.f

    zero = jnp.zeros((), jnp.float32)
    n_st, f_st = bw_pass(xu, gmm, zero)
    float(n_st[0, 0])
    t0 = time.perf_counter()
    for _ in range(3):
        n_st, f_st = bw_pass(xu, gmm, n_st[0, 0] * 1e-9)
    float(n_st[0, 0])
    t_bw = (time.perf_counter() - t0) / 3
    s_pad = s_utts

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

    wv = extract(stats, jnp.zeros((), jnp.float32))
    float(wv[0, 0])
    t0 = time.perf_counter()
    for _ in range(3):
        wv = extract(stats, wv[0, 0] * 1e-9)
    float(wv[0, 0])
    t_w = (time.perf_counter() - t0) / 3

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

    wa = extract_approx(stats, jnp.zeros((), jnp.float32))
    float(wa[0, 0])
    t0 = time.perf_counter()
    for _ in range(3):
        wa = extract_approx(stats, wa[0, 0] * 1e-9)
    float(wa[0, 0])
    t_wa = (time.perf_counter() - t0) / 3

    total = t_em + t_bw + t_w
    rate = audio_seconds / total
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
        "pallas_fused_allclose_onchip": fused_ok,
        "fused_vs_xla_max_occ_relerr": round(dev_n, 8),
        "pcg_vs_cholesky_allclose_onchip": pcg_ok,
        "pcg_vs_cholesky_max_relerr": round(pcg_dev, 8),
        "baseline_src": "BASELINE_CPU.json (measured, 32-core perfect-"
                        "scaling, A+B+C harmonically combined)",
    }))


if __name__ == "__main__":
    main()
