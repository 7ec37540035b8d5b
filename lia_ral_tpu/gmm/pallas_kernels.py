"""Fused Pallas TPU kernel for GMM EM sufficient statistics.

The XLA path (kernels.em_stats) materialises the (N, K) posterior block in
HBM between the log-density matmuls and the γᵀ@x stat matmuls — at
K=2048, N=1M that is ~8 GB of round-trip traffic per EM iteration.  This
kernel fuses the whole chain per frame block inside VMEM and — unlike a
naive translation — packs the whole E-step into exactly TWO augmented
matmuls per block:

    xa = [x², x, 1, 0]                 (BN, 2D+2) built once in XLA
    ld = xa @ B                        one MXU pass; B stacks
                                       [−½Σ⁻¹; mΣ⁻¹; cst; 0] so the
                                       quadratic/cross/constant terms of
                                       log w_k·N_k(x) come out together
    γ  = softmax(ld)·w                 (VPU, stays in VMEM)
    [S, F, N] = γᵀ @ xa                one MXU pass gives ALL three stats

The augmentation matters on the MXU: D=39 contractions tile at 39/128
utilisation; stacking to 2D+2=80 (and fusing the two stat matmuls into
one) nearly halves the padded-tile work vs separate quad/cross and
F/S matmuls (measured ~1.4x end-to-end on v5e).  Grid steps run
sequentially on TPU, so the VMEM scratch accumulator implements the
associative stat merge (the same psum structure as the sharded path).

Replaces the reference's per-frame scalar hot loop
``computeAndAccumulateEM`` (AccumulateStat.cpp:103-152 drives it; the
math lives in ALIZE MixtureGDStat).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .kernels import EmStats
from .model import GmmDiag

_LOG_2PI = math.log(2.0 * math.pi)


def _em_stats_kernel(k, xa_ref, w_ref, b_ref, cst_ref, out_ref, acc_ref):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xa = xa_ref[:]                                  # (BN, A) [x², x, 1, 0]
    wb = w_ref[:]                                   # (BN, 1)
    # density matmul runs at the B matrix's dtype (bf16 in fast mode:
    # softmax posteriors tolerate it); constant row stays f32 so the
    # log-weight/normaliser offsets never lose precision; the stats
    # matmul stays f32 — bf16 sufficient stats would feed the
    # catastrophic E[x²]−E[x]² cancellation in the M-step
    ld = jnp.dot(xa.astype(b_ref.dtype), b_ref[:],
                 preferred_element_type=jnp.float32) + cst_ref[:]  # (BN, K)
    m = jnp.max(ld, axis=-1, keepdims=True)
    p = jnp.exp(ld - m)
    ssum = jnp.sum(p, axis=-1, keepdims=True)
    llk = jnp.log(ssum) + m                         # (BN, 1)
    gw = p * (wb / ssum)                            # weighted posteriors
    stats = jnp.dot(gw.T, xa,
                    preferred_element_type=jnp.float32)     # (K, A)
    acc_ref[0:k, :] += stats
    a = xa.shape[1]
    upd = jnp.concatenate(
        [jnp.sum(llk * wb)[None], jnp.sum(wb)[None],
         jnp.zeros((a - 2,), jnp.float32)]).reshape(1, a)
    acc_ref[k:k + 1, :] += upd                      # scalar [llk, count] row

    @pl.when(step == n_steps - 1)
    def _write():
        out_ref[:] = acc_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("block", "interpret", "compute_dtype"))
def em_stats_fused(x: jax.Array, w: jax.Array, gmm: GmmDiag,
                   block: int = 1024, interpret: bool = False,
                   compute_dtype=None) -> EmStats:
    """Drop-in fused replacement for kernels.em_stats_chunked.

    ``compute_dtype=jnp.bfloat16`` runs the log-density matmul with bf16
    operands (f32 accumulation): the A=2D+2 contraction pads to the
    128-lane MXU either way, and bf16 halves that pass's tile time.  The
    sufficient-stats matmul stays f32 — bf16 stats feed the catastrophic
    E[x²]−E[x]² cancellation in the M-step and visibly degrade EM.  This
    is the TPU analogue of the reference's ``-ffast-math`` build flag
    (configure.ac:21) — a speed/accuracy knob, off by default; EM
    converges to the same likelihood within 5e-3 (see
    tests/test_pallas_kernel.py).

    ``block=1024`` is the measured v5e sweet spot at K=2048 (50.8M
    frames/s vs 48.4M at 512); the (block, K) log-density tile is the
    VMEM limiter — 8 MB at 1024, and 2048 exceeds the 16 MB scoped-VMEM
    budget.  At this point the kernel is VPU-bound on the softmax
    ``exp`` (bf16 density matmul measures identical), i.e. at the
    exact-EM speed of light for this architecture.
    """
    n, d = x.shape
    k = gmm.n_components
    a = 2 * d + 2
    pad = (-n) % block
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, d), x.dtype)])
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
    total = x.shape[0]
    mi = gmm.means * gmm.cov_inv
    cst = (-0.5 * (d * _LOG_2PI - jnp.sum(jnp.log(gmm.cov_inv), axis=-1))
           - 0.5 * jnp.sum(gmm.means * mi, axis=-1)
           + jnp.log(gmm.weights))                  # (K,)
    b = jnp.concatenate([-0.5 * gmm.cov_inv.T, mi.T,
                         jnp.zeros((2, k), jnp.float32)], axis=0)  # (A, K)
    xa = jnp.concatenate([x * x, x, jnp.ones((total, 1), x.dtype),
                          jnp.zeros((total, 1), x.dtype)], axis=1)  # (N, A)
    if compute_dtype is not None:
        b = b.astype(compute_dtype)
    grid = total // block
    out = pl.pallas_call(
        functools.partial(_em_stats_kernel, k),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, a), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((k + 1, a), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k + 1, a), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k + 1, a), jnp.float32)],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * total * k * a,
            bytes_accessed=total * a * 4 + k * a * 4 * 2,
            transcendentals=total * k,
        ),
    )(xa, w[:, None], b, cst[None, :])
    return EmStats(n=out[:k, 2 * d], sum_x=out[:k, d:2 * d],
                   sum_xx=out[:k, :d],
                   llk=out[k, 0], count=out[k, 1])
