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


def _em_stats_kernel(k, prec, xa_ref, w_ref, b_ref, cst_ref, out_ref,
                     acc_ref):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xa = xa_ref[:]                                  # (BN, A) [x², x, 1, 0]
    wb = w_ref[:]                                   # (BN, 1)

    def _split(v):
        hi = v.astype(jnp.bfloat16)
        return hi, (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def _dot3(u, v):
        # manual bf16x3: Mosaic has no Precision.HIGH, so emit the
        # hi·hi + hi·lo + lo·hi passes ourselves (error ~2^-22 relative,
        # ≈f32; skips only the negligible lo·lo term)
        uh, ul = _split(u)
        vh, vl = _split(v)
        # pin DEFAULT precision: the operands are already bf16 and the
        # package-wide highest default would ask Mosaic for an fp32
        # contraction on bf16 vectors (unsupported)
        f = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
        return f(uh, vh) + (f(uh, vl) + f(ul, vh))

    # density matmul: bf16 single-pass in fast mode (softmax posteriors
    # tolerate it); multi-pass f32 otherwise.  The constant row stays f32
    # so the log-weight/normaliser offsets never lose precision.
    if prec == "bf16x3":
        ld = _dot3(xa, b_ref[:]) + cst_ref[:]             # (BN, K)
    else:
        ld = jnp.dot(xa.astype(b_ref.dtype), b_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=prec) + cst_ref[:]         # (BN, K)
    m = jnp.max(ld, axis=-1, keepdims=True)
    p = jnp.exp(ld - m)
    ssum = jnp.sum(p, axis=-1, keepdims=True)
    llk = jnp.log(ssum) + m                         # (BN, 1)
    gw = p * (wb / ssum)                            # weighted posteriors
    if prec == "bf16x3":
        stats = _dot3(gw.T, xa)                             # (K, A)
    else:
        stats = jnp.dot(gw.T, xa,
                        preferred_element_type=jnp.float32,
                        precision=prec)                     # (K, A)
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
                   static_argnames=("block", "interpret", "compute_dtype",
                                    "mxu_precision"))
def em_stats_fused(x: jax.Array, w: jax.Array, gmm: GmmDiag,
                   block: int | None = None, interpret: bool = False,
                   compute_dtype=None,
                   mxu_precision: str = "bf16x3") -> EmStats:
    """Drop-in fused replacement for kernels.em_stats_chunked.

    ``mxu_precision`` picks the matmul arithmetic (v5e measurements at
    K=2048, D=39, 1M frames — scripts/sweep_fused.py):

    =============  ==========  =======================================
    mode           Mframe/s    max occupancy rel-err vs f64
    =============  ==========  =======================================
    bf16x3 (dflt)  27.1        3.2e-4 (the f32 accumulation floor)
    highest (6x)   20.5        3.2e-4
    bf16 1-pass    28.3        5.6e-2  (via compute_dtype=bf16)
    =============  ==========  =======================================

    bf16x3 = manual hi/lo-split 3-pass (Mosaic lacks Precision.HIGH):
    f32-grade logits at ~96 % of single-pass speed — the kernel is
    VPU-bound on the softmax ``exp``, so the extra MXU passes are nearly
    free.  ``compute_dtype=jnp.bfloat16`` is the TPU analogue of the
    reference's ``-ffast-math`` build flag (configure.ac:21) — a
    speed/accuracy knob, off by default; EM converges to the same
    likelihood within 5e-3 (tests/test_pallas_kernel.py), but percent-
    level occupancy noise forfeits reference parity.

    ``block``: the (block, K) density tile is the VMEM limiter; 512 fits
    every mode under the raised scoped-vmem budget and measures within
    2 % of 1024, so it is the f32-mode default (1024 for bf16).
    """
    n, d = x.shape
    k = gmm.n_components
    a = 2 * d + 2
    if block is None:
        # f32/HIGHEST runs the density matmul in 3 MXU passes with extra
        # scratch: (1024, K=2048) tiles overflow the 16 MB scoped-VMEM
        # budget, so halve the block; bf16 keeps the 1024 sweet spot.
        block = 1024 if compute_dtype == jnp.bfloat16 else 512
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
    # f32 mode runs the matmuls at multi-pass precision: one bf16 pass
    # rounds logits by ~5e-2 and softmax occupancies by percents
    # (scripts/debug_fused.py).  bf16 mode (the fastMath knob) uses the
    # single-pass default.
    if compute_dtype == jnp.bfloat16:
        prec = jax.lax.Precision.DEFAULT
    elif mxu_precision in ("bf16x3", "high"):
        prec = "bf16x3"            # Mosaic has no Precision.HIGH; use the
        # manual 3-pass split (same arithmetic)
    else:
        prec = getattr(jax.lax.Precision, mxu_precision.upper())
    grid = total // block
    out = pl.pallas_call(
        functools.partial(_em_stats_kernel, k, prec),
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
        # the default 16 MB scoped-vmem cap rejects the multi-pass f32
        # modes at block≥512; v5e has 128 MB of physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * total * k * a,
            bytes_accessed=total * a * 4 + k * a * 4 * 2,
            transcendentals=total * k,
        ),
    )(xa, w[:, None], b, cst[None, :])
    return EmStats(n=out[:k, 2 * d], sum_x=out[:k, d:2 * d],
                   sum_xx=out[:k, :d],
                   llk=out[k, 0], count=out[k, 1])


def _bw_stats_kernel(k, prec, xa_ref, w_ref, b_ref, cst_ref, out_ref,
                     acc_ref):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

    @pl.when(t == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xa = xa_ref[0]                                  # (BT, A) [x², x, 1, 0]
    wb = w_ref[0]                                   # (BT, 1)

    def _split(v):
        hi = v.astype(jnp.bfloat16)
        return hi, (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    def _dot3(u, v):
        uh, ul = _split(u)
        vh, vl = _split(v)
        f = functools.partial(jnp.dot, preferred_element_type=jnp.float32,
                              precision=jax.lax.Precision.DEFAULT)
        return f(uh, vh) + (f(uh, vl) + f(ul, vh))

    if prec == "bf16x3":
        ld = _dot3(xa, b_ref[:]) + cst_ref[:]
    else:
        ld = jnp.dot(xa.astype(b_ref.dtype), b_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=prec) + cst_ref[:]
    m = jnp.max(ld, axis=-1, keepdims=True)
    p = jnp.exp(ld - m)
    ssum = jnp.sum(p, axis=-1, keepdims=True)
    llk = jnp.log(ssum) + m
    gw = p * (wb / ssum)
    if prec == "bf16x3":
        stats = _dot3(gw.T, xa)
    else:
        stats = jnp.dot(gw.T, xa, preferred_element_type=jnp.float32,
                        precision=prec)
    acc_ref[0:k, :] += stats
    a = xa.shape[1]
    upd = jnp.concatenate(
        [jnp.sum(llk * wb)[None], jnp.sum(wb)[None],
         jnp.zeros((a - 2,), jnp.float32)]).reshape(1, a)
    acc_ref[k:k + 1, :] += upd

    @pl.when(t == n_t - 1)
    def _write():
        out_ref[0] = acc_ref[:]


@functools.partial(jax.jit,
                   static_argnames=("block", "interpret", "compute_dtype",
                                    "mxu_precision"))
def bw_stats_fused(x: jax.Array, w: jax.Array, gmm: GmmDiag,
                   block: int | None = None, interpret: bool = False,
                   compute_dtype=None, mxu_precision: str = "bf16x3"):
    """Per-utterance Baum-Welch (N, F) stats, fused in VMEM.

    x: (S, T, D) padded utterance batch; w: (S, T) frame weights.
    Returns (n (S, K), f (S, K, D), llk (S,)) — the TVAcc/JFAAcc hot
    loop (AccumulateTVStat.cpp:281-351) as a grid of the same
    two-augmented-matmul blocks as ``em_stats_fused``, with a per-
    utterance VMEM accumulator instead of a global one.  Replaces the
    XLA path's triple HBM round-trip of the (T, K) posterior block
    (measured 2.0x: 12.2 -> 24.6 Mframe/s at K=2048, see PERF.md).
    """
    s, t, d = x.shape
    k = gmm.n_components
    a = 2 * d + 2
    if block is None:
        block = 1024 if compute_dtype == jnp.bfloat16 else 512
    pad = (-t) % block
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((s, pad, d), x.dtype)], axis=1)
        w = jnp.concatenate([w, jnp.zeros((s, pad), w.dtype)], axis=1)
    t_pad = x.shape[1]
    mi = gmm.means * gmm.cov_inv
    cst = (-0.5 * (d * _LOG_2PI - jnp.sum(jnp.log(gmm.cov_inv), axis=-1))
           - 0.5 * jnp.sum(gmm.means * mi, axis=-1)
           + jnp.log(gmm.weights))
    b = jnp.concatenate([-0.5 * gmm.cov_inv.T, mi.T,
                         jnp.zeros((2, k), jnp.float32)], axis=0)
    xa = jnp.concatenate([x * x, x, jnp.ones((s, t_pad, 1), x.dtype),
                          jnp.zeros((s, t_pad, 1), x.dtype)], axis=2)
    if compute_dtype is not None:
        b = b.astype(compute_dtype)
    if compute_dtype == jnp.bfloat16:
        prec = jax.lax.Precision.DEFAULT
    elif mxu_precision in ("bf16x3", "high"):
        prec = "bf16x3"
    else:
        prec = getattr(jax.lax.Precision, mxu_precision.upper())
    out = pl.pallas_call(
        functools.partial(_bw_stats_kernel, k, prec),
        grid=(s, t_pad // block),
        in_specs=[
            pl.BlockSpec((1, block, a), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k + 1, a), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, k + 1, a), jnp.float32),
        scratch_shapes=[pltpu.VMEM((k + 1, a), jnp.float32)],
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * s * t_pad * k * a,
            bytes_accessed=s * t_pad * a * 4 + k * a * 4 * (s + 1),
            transcendentals=s * t_pad * k,
        ),
    )(xa, w[:, :, None], b, cst[None, :])
    return (out[:, :k, 2 * d], out[:, :k, d:2 * d], out[:, k, 0])
