"""Quantify on-chip EM-stats deviation: fused Pallas vs XLA chunked vs a
float64 host oracle, at K=2048.  Run on the TPU chip."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
# NOTE: do NOT set PYTHONPATH for TPU runs — the platform python shim
# uses it to locate the axon jax plugin; overriding it kills the backend.

import numpy as np
import jax
import jax.numpy as jnp

from lia_ral_tpu.gmm.kernels import em_stats_chunked
from lia_ral_tpu.gmm.model import GmmDiag
from lia_ral_tpu.gmm.pallas_kernels import em_stats_fused

K, D, N = 2048, 39, 65536
rng = np.random.default_rng(0)
x = rng.standard_normal((N, D)).astype(np.float32)
w = np.ones((N,), np.float32)
means = rng.standard_normal((K, D)).astype(np.float32)
cov_inv = (rng.random((K, D)) + 0.5).astype(np.float32)
weights = np.full(K, 1.0 / K, np.float32)
gmm = GmmDiag.create(weights, means, cov_inv)

# float64 oracle on host
x64 = x.astype(np.float64)
mi = means.astype(np.float64) * cov_inv.astype(np.float64)
cst = (-0.5 * (D * np.log(2 * np.pi) - np.log(cov_inv.astype(np.float64)).sum(-1))
       - 0.5 * (means.astype(np.float64) * mi).sum(-1) + np.log(weights.astype(np.float64)))
ld = (-0.5 * (x64**2) @ cov_inv.T.astype(np.float64) + x64 @ mi.T + cst[None, :])
m = ld.max(-1, keepdims=True)
p = np.exp(ld - m)
s = p.sum(-1, keepdims=True)
llk64 = (np.log(s) + m).sum()
g = p / s
n64 = g.sum(0)
f64 = g.T @ x64
s64 = g.T @ (x64**2)

xj, wj = jnp.asarray(x), jnp.asarray(w)


def rel(a, b):
    a = np.asarray(a, np.float64)
    return float(np.max(np.abs(a - b) / (np.abs(b) + 1e-6)))


def report(tag, st):
    print(f"{tag}: n={rel(st.n, n64):.3e} sum_x={rel(st.sum_x, f64):.3e} "
          f"sum_xx={rel(st.sum_xx, s64):.3e} "
          f"llk={abs(float(st.llk) - llk64) / abs(llk64):.3e}")


report("chunked default", em_stats_chunked(xj, wj, gmm, chunk=16384))
report("fused   default", em_stats_fused(xj, wj, gmm))
with jax.default_matmul_precision("highest"):
    report("chunked highest", em_stats_chunked(xj, wj, gmm, chunk=16384))
    report("fused   highest", em_stats_fused(xj, wj, gmm))
