"""Benchmark: UBM EM throughput in audio-seconds per second per chip.

North-star metric (BASELINE.md): audio-seconds/s/chip for UBM EM.
One EM iteration = full sufficient-statistics pass over N frames with a
K-component diagonal GMM + closed-form M-step (the reference's
TrainWorld hot loop, AccumulateStat.cpp:103-152).  Frames are 10 ms, so
audio-seconds = frames / 100.

Measurement notes for the axon tunnel platform:
* ``block_until_ready`` does not synchronise — only a value fetch does;
* remote compiles are expensive (30-450 s) and must be excluded: warm up
  with a fetch, then time fresh executions;
* iterations are chained (model feeds back) so no request/result caching
  can short-circuit the work.

Baseline: the reference publishes no numbers (BASELINE.md).  The working
reference point adopted there is a 32-core CPU running the C++ EM at an
estimated 2000 audio-s/s for K=2048/D=39 (~200k frames/s; LIA_RAL scalar
llk loop with per-component exp).  vs_baseline is measured/2000.
"""

from __future__ import annotations

import json
import time

import numpy as np

K = 2048
D = 39
N_FRAMES = 1_000_000        # 10000 audio-seconds per iteration
CHUNK = 16384
BASELINE_AUDIO_S_PER_S = 2000.0


def main() -> None:
    import jax
    import jax.numpy as jnp
    from lia_ral_tpu.gmm.em import default_stats_fn, m_step
    from lia_ral_tpu.gmm.model import GmmDiag

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((N_FRAMES, D)), jnp.float32)
    w = jnp.ones((N_FRAMES,), jnp.float32)
    gmm = GmmDiag.create(np.full(K, 1.0 / K),
                         rng.standard_normal((K, D)).astype(np.float32),
                         (rng.random((K, D)) + 0.5).astype(np.float32))

    stats_fn = default_stats_fn(chunk=CHUNK)

    @jax.jit
    def em_iteration(x, w, gmm):
        stats = stats_fn(x, w, gmm)
        return m_step(stats), stats.llk

    # warmup: forces (remote) compile + one real execution
    g1, llk = em_iteration(x, w, gmm)
    float(llk)
    # timed: chained fresh-input iterations (model feeds back, so no
    # request/result caching can short-circuit), ONE value fetch at the
    # end — the fetch synchronises the whole queued chain, so the
    # measurement is sustained device throughput, not per-dispatch
    # tunnel latency
    iters = 5
    t0 = time.perf_counter()
    g = g1
    for _ in range(iters):
        g, llk = em_iteration(x, w, g)
    float(llk)
    dt = (time.perf_counter() - t0) / iters
    audio_seconds = N_FRAMES / 100.0
    rate = audio_seconds / dt
    print(json.dumps({
        "metric": f"UBM-EM audio-seconds/s/chip (K={K}, D={D})",
        "value": round(rate, 1),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(rate / BASELINE_AUDIO_S_PER_S, 2),
    }))


if __name__ == "__main__":
    main()
