"""On-chip sweep: per-utterance BW-stats kernel variants at K=2048.

Measures bw_stats_fused (S=500 utts x T=2000 frames, K=2048, D=39)
across block sizes / stat-contraction tiers, decomposes the bench's
fresh-input chaining cost, and compares against the EM kernel's rate on
the same frame count (the VERDICT-r4 "per-utterance accumulator loses
~20%" question).  Results recorded in PERF.md §5."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp

from lia_ral_tpu.gmm.model import GmmDiag
from lia_ral_tpu.gmm.pallas_kernels import bw_stats_fused, em_stats_fused

K, D, S, T = 2048, 39, 500, 2000
N = S * T
rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((S, T, D)), jnp.float32)
w = jnp.ones((S, T), jnp.float32)
gmm = GmmDiag.create(np.full(K, 1.0 / K),
                     rng.standard_normal((K, D)).astype(np.float32),
                     (rng.random((K, D)) + 0.5).astype(np.float32))

# f64 oracle occupancies on a 16-utterance slice
NS = 16
x64 = np.asarray(x[:NS], np.float64)
means = np.asarray(gmm.means, np.float64)
cov_inv = np.asarray(gmm.cov_inv, np.float64)
weights = np.asarray(gmm.weights, np.float64)
mi = means * cov_inv
cst = (-0.5 * (D * np.log(2 * np.pi) - np.log(cov_inv).sum(-1))
       - 0.5 * (means * mi).sum(-1) + np.log(weights))
ld = (-0.5 * (x64 ** 2) @ cov_inv.T + x64 @ mi.T + cst[None, None, :])
m = ld.max(-1, keepdims=True)
p = np.exp(ld - m)
g = p / p.sum(-1, keepdims=True)
n64 = g.sum(1)                                    # (NS, K)


def bench(tag, fn, chain=False):
    n, _, _ = fn(x[:NS], w[:NS])
    err = float(np.max(np.abs(np.asarray(n, np.float64) - n64)
                       / (n64 + 1e-9)))
    if chain:
        @jax.jit
        def passfn(xx, shift):
            n, f, llk = fn(xx + shift, w)
            return n
    else:
        @jax.jit
        def passfn(xx, shift):
            n, f, llk = fn(xx, w)
            return n
    n = passfn(x, jnp.zeros((), jnp.float32))
    float(n[0, 0])
    t0 = time.perf_counter()
    for _ in range(3):
        n = passfn(x, n[0, 0] * 1e-9)
    float(n[0, 0])
    dt = (time.perf_counter() - t0) / 3
    print(f"{tag:40s} {N / dt / 1e6:7.1f} Mframe/s   n-relerr {err:.2e}",
          flush=True)
    return N / dt / 1e6


# EM kernel reference on the same frames (flat) — the 32.4/37.4 anchor
xf = x.reshape(-1, D)
wf = w.reshape(-1)
for tag, kw in [("EM-kernel flat x3 (anchor)", {}),
                ("EM-kernel flat bf16nx", {"stats_pass": "bf16nx"})]:
    fn = jax.jit(lambda a, s, kw=kw: em_stats_fused(
        a + s, wf, gmm, block=1024, **kw).n)
    n = fn(xf, jnp.zeros((), jnp.float32))
    float(n[0])
    t0 = time.perf_counter()
    for _ in range(3):
        n = fn(xf, n[0] * 1e-9)
    float(n[0])
    dt = (time.perf_counter() - t0) / 3
    print(f"{tag:40s} {N / dt / 1e6:7.1f} Mframe/s", flush=True)

variants = [
    ("bw default block1024 x3", dict(block=1024), False),
    ("bw default block1024 x3 +chain", dict(block=1024), True),
    ("bw block2000 (no pad, 1 step/utt)", dict(block=2000), False),
    ("bw block2048 (1 step/utt)", dict(block=2048), False),
    ("bw block512", dict(block=512), False),
    ("bw bf16nx block1024 (fastStats)", dict(block=1024,
                                             stats_pass="bf16nx"), False),
    ("bw bf16nx block2000", dict(block=2000, stats_pass="bf16nx"), False),
    ("bw bf16 block2000", dict(block=2000, stats_pass="bf16"), False),
    ("bw bf16nx block2000 +chain", dict(block=2000,
                                        stats_pass="bf16nx"), True),
    # r5b: direct-out accumulation (no scratch) makes multi-step blocks
    # competitive with the single-step 2048 path — sweep both tiers
    ("bw bf16nx block2048 (1 step/utt)", dict(block=2048,
                                              stats_pass="bf16nx"), False),
    ("bw bf16nx block512", dict(block=512, stats_pass="bf16nx"), False),
]
for tag, kw, chain in variants:
    try:
        bench(tag, lambda a, b, kw=kw: bw_stats_fused(a, b, gmm, **kw),
              chain=chain)
    except Exception as e:
        print(f"{tag:40s} FAILED: {str(e)[:140]}", flush=True)
