"""On-chip sweep: fused-kernel precision modes × block sizes at K=2048.

Measures per-iteration EM time (1M frames) and stats accuracy vs the
float64 host oracle.  Informs the em_stats_fused defaults; results
recorded in PERF.md."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from lia_ral_tpu.gmm.kernels import em_stats_chunked
from lia_ral_tpu.gmm.model import GmmDiag
from lia_ral_tpu.gmm.pallas_kernels import em_stats_fused

K, D, N = 2048, 39, 1_000_000
rng = np.random.default_rng(0)
x = rng.standard_normal((N, D)).astype(np.float32)
w = np.ones((N,), np.float32)
means = rng.standard_normal((K, D)).astype(np.float32)
cov_inv = (rng.random((K, D)) + 0.5).astype(np.float32)
weights = np.full(K, 1.0 / K, np.float32)
gmm = GmmDiag.create(weights, means, cov_inv)
xj, wj = jnp.asarray(x), jnp.asarray(w)

# float64 oracle on a 65536-frame slice
NS = 65536
x64 = x[:NS].astype(np.float64)
mi = means.astype(np.float64) * cov_inv.astype(np.float64)
cst = (-0.5 * (D * np.log(2 * np.pi)
               - np.log(cov_inv.astype(np.float64)).sum(-1))
       - 0.5 * (means.astype(np.float64) * mi).sum(-1)
       + np.log(weights.astype(np.float64)))
ld = (-0.5 * (x64 ** 2) @ cov_inv.T.astype(np.float64) + x64 @ mi.T
      + cst[None, :])
m = ld.max(-1, keepdims=True)
p = np.exp(ld - m)
s = p.sum(-1, keepdims=True)
g = p / s
n64 = g.sum(0)


def acc(st):
    return float(np.max(np.abs(np.asarray(st.n, np.float64) - n64)
                        / (n64 + 1e-9)))


def bench(tag, fn):
    st = fn(xj[:NS], wj[:NS])
    err = acc(st)
    st = fn(xj, wj)
    float(st.llk)                       # warm up + fetch
    t0 = time.perf_counter()
    for _ in range(3):
        st = fn(xj, wj)
    float(st.llk)
    dt = (time.perf_counter() - t0) / 3
    print(f"{tag:34s} {N / dt / 1e6:7.1f} Mframe/s   n-relerr {err:.2e}")


bench("fused f32-highest block512",
      lambda a, b: em_stats_fused(a, b, gmm, block=512))
try:
    bench("fused f32-highest block256",
          lambda a, b: em_stats_fused(a, b, gmm, block=256))
except Exception as e:
    print("block256 failed:", str(e)[:120])
bench("fused bf16 block1024",
      lambda a, b: em_stats_fused(a, b, gmm, block=1024,
                                  compute_dtype=jnp.bfloat16))
bench("fused bf16 block512",
      lambda a, b: em_stats_fused(a, b, gmm, block=512,
                                  compute_dtype=jnp.bfloat16))
bench("chunked xla (now highest)",
      lambda a, b: em_stats_chunked(a, b, gmm, chunk=16384))

bench("fused f32-HIGH block512",
      lambda a, b: em_stats_fused(a, b, gmm, block=512,
                                  mxu_precision="high"))
bench("fused f32-HIGH block1024",
      lambda a, b: em_stats_fused(a, b, gmm, block=1024,
                                  mxu_precision="high"))

# --- r3 modes: cst fold is always on; exp/stats arithmetic variants ---------
bench("r3 default exp2/x3 block1024",
      lambda a, b: em_stats_fused(a, b, gmm, block=1024))
bench("r3 fastStats bf16nx block1024",
      lambda a, b: em_stats_fused(a, b, gmm, block=1024,
                                  stats_pass="bf16nx"))
bench("r3 bf16 1-pass stats block1024",
      lambda a, b: em_stats_fused(a, b, gmm, block=1024,
                                  stats_pass="bf16"))
bench("r3 exp (natural) x3 block1024",
      lambda a, b: em_stats_fused(a, b, gmm, block=1024, exp_mode="exp"))
bench("r3 fast2 software exp block1024",
      lambda a, b: em_stats_fused(a, b, gmm, block=1024,
                                  exp_mode="fast2"))
bench("r3 bf16sr stats block1024",
      lambda a, b: em_stats_fused(a, b, gmm, block=1024,
                                  stats_pass="bf16sr"))
