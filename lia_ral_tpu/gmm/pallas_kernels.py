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
_LOG2_E = 1.4426950408889634
_LN_2 = 0.6931471805599453


def _fast_exp2(v):
    """Bit-trick 2^v for softmax-shifted logits (v ≤ 0): integer part
    into the float exponent field, degree-4 polynomial for the
    fraction.  Max relative error ~1.2e-6 — far inside the 1e-3
    occupancy budget.  Exists to probe the kernel's VPU exp ceiling
    (PERF.md §1); whether it beats the hardware exp is measured, not
    assumed (scripts/sweep_fused.py)."""
    v = jnp.maximum(v, -120.0)
    i = jnp.floor(v)
    f = v - i
    # degree-4 relative-error LSQ fit for 2^f on [0,1), max rel 5.3e-6
    p = ((((0.0135115532 * f + 0.0519895369) * f + 0.2415088773) * f
          + 0.6929742561) * f + 1.0000052588)
    bits = (i.astype(jnp.int32) + 127) << 23
    return p * jax.lax.bitcast_convert_type(bits, jnp.float32)


def _dotp(u, v):
    return jnp.dot(u, v, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.DEFAULT)


def _bf16_split(v):
    hi = v.astype(jnp.bfloat16)
    return hi, (v - hi.astype(jnp.float32)).astype(jnp.bfloat16)


def _stats_contract(p, xs, stats_pass):
    """stats = pᵀ @ xs at the chosen MXU arithmetic.

    x3      : both operands hi/lo split, 3 passes (f32-grade, default)
    bf16    : both single-pass bf16 (fastest, ~2.6e-3 occupancy bias)
    bf16nx  : single-pass bf16 for the big (K, A) block, but the
              OCCUPANCY column recomputed at full precision — a
              (K, BN)@(BN, 1) 3-pass matmul is negligible, so the tier
              keeps f32-grade occupancies while S/F carry the bf16
              rounding (the EM M-step divides S/F by n, so their shared
              rounding partially cancels in the means)
    bf16x2p : p split, xs single bf16 — 2 passes, error from xs rounding
    bf16x2x : p single bf16, xs split — 2 passes, error from p rounding
    (errors measured on-chip in scripts/sweep_fused.py)"""
    if stats_pass in ("bf16", "bf16nx"):
        stats = _dotp(p.T.astype(jnp.bfloat16), xs.astype(jnp.bfloat16))
        if stats_pass == "bf16nx":
            a = xs.shape[1]
            # exact f32 occupancies on the VPU: one fused multiply+
            # column-reduce pass over the p tile (n_k = Σ_b p_bk·s_b)
            n_exact = jnp.sum(p * xs[:, a - 2:a - 1], axis=0)[:, None]
            cols = jax.lax.broadcasted_iota(jnp.int32, stats.shape, 1)
            stats = jnp.where(cols == a - 2, n_exact, stats)
        return stats
    if stats_pass == "bf16x2p":
        ph, plo = _bf16_split(p)
        xsb = xs.astype(jnp.bfloat16)
        return _dotp(ph.T, xsb) + _dotp(plo.T, xsb)
    if stats_pass == "bf16x2x":
        xh, xl = _bf16_split(xs)
        pb = p.T.astype(jnp.bfloat16)
        return _dotp(pb, xh) + _dotp(pb, xl)
    raise ValueError(stats_pass)


def _softmax_block(ld, wb, exp_mode):
    """max-shifted softmax over the component axis.  In the base-2 modes
    the logits arrive pre-scaled by log2(e) (folded into B and cst by the
    caller), so exp(ld−m) ≡ 2^(ld2−m2) and only the llk readout needs the
    ln(2) factor back.

    Returns UNNORMALISED exponentials p plus the per-row scale
    s = wb/ssum — the caller folds s into the (BN, A) stat operand
    instead of the (BN, K) posterior tile (A = 80 ≪ K = 2048), saving a
    full VPU pass over the big tile (γ·s ≡ pᵀ @ diag(s), associativity
    of the stat contraction)."""
    m = jnp.max(ld, axis=-1, keepdims=True)
    if exp_mode == "exp":
        p = jnp.exp(ld - m)
        m_nat = m
    elif exp_mode == "exp2":
        p = jnp.exp2(ld - m)
        m_nat = m * _LN_2
    else:                       # "fast2": software bit-trick exp2
        p = _fast_exp2(ld - m)
        m_nat = m * _LN_2
    ssum = jnp.sum(p, axis=-1, keepdims=True)
    llk = jnp.log(ssum) + m_nat                     # natural-log llk
    return p, wb / ssum, llk


def _em_stats_kernel(k, prec, exp_mode, stats_pass, xa_ref, w_ref, b_ref,
                     cst_ref, out_ref, acc_ref):
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
        # cst rides the constant-1 column of the augmented design (the
        # hi/lo split keeps its f32 precision), so no separate add pass
        # touches the (BN, K) tile
        ld = _dot3(xa, b_ref[:])                          # (BN, K)
    else:
        ld = jnp.dot(xa.astype(b_ref.dtype), b_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=prec) + cst_ref[:]         # (BN, K)
    p, s, llk = _softmax_block(ld, wb, exp_mode)
    xs = xa * s                                     # (BN, A): row scale
    if stats_pass in ("bf16", "bf16nx", "bf16sr", "bf16x2p", "bf16x2x"):
        # single-pass bf16 stat contraction: the LOGITS carry the
        # parity-critical precision (f32-grade above); rounding the
        # already-exact posteriors to bf16 drops two MXU passes and the
        # hi/lo-split traffic of the p tile.  Deterministic rounding
        # BIASES occupancies by ~2e-3 (measured); "bf16sr" rounds
        # stochastically so the per-element error is zero-mean and
        # averages out across the frame sum (hardware SR via the
        # per-core PRNG, seeded per grid step for reproducibility).
        if stats_pass == "bf16sr":
            pltpu.prng_seed(step)
            pt = pltpu.stochastic_round(
                p, pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32),
                target_dtype=jnp.bfloat16).T
            xsb = pltpu.stochastic_round(
                xs, pltpu.bitcast(pltpu.prng_random_bits(xs.shape),
                                  jnp.uint32),
                target_dtype=jnp.bfloat16)
            stats = _dotp(pt, xsb)                          # (K, A)
        else:
            stats = _stats_contract(p, xs, stats_pass)          # (K, A)
    elif prec == "bf16x3":
        stats = _dot3(p.T, xs)                              # (K, A)
    else:
        stats = jnp.dot(p.T, xs,
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
                                    "mxu_precision", "exp_mode",
                                    "stats_pass"))
def em_stats_fused(x: jax.Array, w: jax.Array, gmm: GmmDiag,
                   block: int | None = None, interpret: bool = False,
                   compute_dtype=None,
                   mxu_precision: str = "bf16x3",
                   exp_mode: str = "exp2",
                   stats_pass: str = "x3") -> EmStats:
    """Drop-in fused replacement for kernels.em_stats_chunked.

    ``mxu_precision``/``exp_mode``/``stats_pass`` pick the arithmetic
    (v5e measurements at K=2048, D=39, 1M frames —
    scripts/sweep_fused.py; r3 numbers with the cst fold):

    ==========================  ==========  ===========================
    mode                        Mframe/s    max occupancy rel-err vs f64
    ==========================  ==========  ===========================
    bf16x3+exp2+x3 (default)    32.4        4.7e-4 (f32-grade)
    stats_pass="bf16nx"         37.4        4.7e-4 occ; S/F ~2e-3
                                            (the fastStats knob)
    stats_pass="bf16"           40.7        2.6e-3
    bf16 1-pass density         ~41         5.6e-2 (compute_dtype=bf16)
    ==========================  ==========  ===========================

    The kernel is VMEM-traffic bound, not exp-bound: hardware exp ≡
    exp2 in throughput, a software bit-trick exp2 measured SLOWER
    (24.8), and stochastically-rounded bf16 stats measured noisier
    (4.7e-3) than deterministic (2.6e-3).  The r3 gains come from
    folding cst into the density matmul's constant-1 column (one fewer
    (BN,K) VMEM pass, +13%%) and optionally dropping the stat
    contraction to fewer bf16 passes.

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
        # 1024 is the sweet spot for every mode since the cst fold
        # removed the extra VMEM add-pass (scripts/sweep_fused.py r3)
        block = 1024
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
    if exp_mode != "exp":
        # base-2 softmax: fold log2(e) into the density matmul so the
        # kernel computes logits directly in the exp2 domain
        b = b * _LOG2_E
        cst = cst * _LOG2_E
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
    if prec == "bf16x3":
        # fold cst into the constant-1 column's row of B: the hi/lo split
        # keeps its f32 precision and the kernel skips the separate
        # (BN, K) add pass
        b = b.at[2 * d].set(cst)
        cst = jnp.zeros_like(cst)
    grid = total // block
    out = pl.pallas_call(
        functools.partial(_em_stats_kernel, k, prec, exp_mode, stats_pass),
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


def _bw_stats_kernel(k, prec, exp_mode, stats_pass, single_step, xa_ref,
                     w_ref, b_ref, cst_ref, out_ref):
    t = pl.program_id(1)
    n_t = pl.num_programs(1)

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
        ld = _dot3(xa, b_ref[:])        # cst folded into b's 1-column
    else:
        ld = jnp.dot(xa.astype(b_ref.dtype), b_ref[:],
                     preferred_element_type=jnp.float32,
                     precision=prec) + cst_ref[:]
    p, s, llk = _softmax_block(ld, wb, exp_mode)
    xs = xa * s                                     # (BT, A): row scale
    if stats_pass in ("bf16", "bf16nx", "bf16sr", "bf16x2p", "bf16x2x"):
        if stats_pass == "bf16sr":       # see em_stats kernel: debiased SR
            pltpu.prng_seed(t + pl.program_id(0) * n_t)
            pt = pltpu.stochastic_round(
                p, pltpu.bitcast(pltpu.prng_random_bits(p.shape),
                                 jnp.uint32),
                target_dtype=jnp.bfloat16).T
            xsb = pltpu.stochastic_round(
                xs, pltpu.bitcast(pltpu.prng_random_bits(xs.shape),
                                  jnp.uint32),
                target_dtype=jnp.bfloat16)
            stats = _dotp(pt, xsb)
        else:
            stats = _stats_contract(p, xs, stats_pass)
    elif prec == "bf16x3":
        stats = _dot3(p.T, xs)
    else:
        stats = jnp.dot(p.T, xs, preferred_element_type=jnp.float32,
                        precision=prec)
    a = xa.shape[1]
    upd = jnp.concatenate(
        [jnp.sum(llk * wb)[None], jnp.sum(wb)[None],
         jnp.zeros((a - 2,), jnp.float32)]).reshape(1, a)
    blk = jnp.concatenate([stats, upd], axis=0)     # (K+1, A)
    if single_step:
        # one grid step covers the whole utterance (the common case at
        # bucketed T ≤ 2048): write the result straight to the output
        # block — no scratch zero-init/accumulate/copy per utterance
        out_ref[0] = blk
    else:
        # multi-step: the out block index is constant over t, so the
        # block stays VMEM-resident across the inner grid axis — adding
        # into it directly replaces the r4 scratch accumulator and its
        # final copy pass (one fewer (K+1, A) VMEM pass per utterance)
        @pl.when(t == 0)
        def _first():
            out_ref[0] = blk

        @pl.when(t > 0)
        def _rest():
            out_ref[0] += blk


@functools.partial(jax.jit,
                   static_argnames=("block", "interpret", "compute_dtype",
                                    "mxu_precision", "exp_mode",
                                    "stats_pass"))
def bw_stats_fused(x: jax.Array, w: jax.Array, gmm: GmmDiag,
                   block: int | None = None, interpret: bool = False,
                   compute_dtype=None, mxu_precision: str = "bf16x3",
                   exp_mode: str = "exp2",
                   stats_pass: str = "x3"):
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
        # cover the whole utterance in ONE grid step when it fits the
        # VMEM budget: no per-utterance accumulate pass and no padded-
        # tail compute.  With the direct-out accumulation (r5b) the
        # UNPADDED block (= t) measures fastest at T=2000 — 28.0 (x3) /
        # 33.1 (bf16nx) Mframe/s vs 23.4/31.8 for the padded 2048 and
        # 27.5/32.3 for 1024 multi-step (sweep_bw.py on-chip).  Sublane
        # alignment (t % 8) gates the exact-block path; otherwise the
        # 1024 multi-step is within ~2 % of the best anyway
        block = t if (t <= 2048 and t % 8 == 0) else 1024
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
    if exp_mode != "exp":
        b = b * _LOG2_E
        cst = cst * _LOG2_E
    if compute_dtype is not None:
        b = b.astype(compute_dtype)
    if compute_dtype == jnp.bfloat16:
        prec = jax.lax.Precision.DEFAULT
    elif mxu_precision in ("bf16x3", "high"):
        prec = "bf16x3"
    else:
        prec = getattr(jax.lax.Precision, mxu_precision.upper())
    if prec == "bf16x3":
        b = b.at[2 * d].set(cst)    # see em_stats_fused: folded cst
        cst = jnp.zeros_like(cst)
    single_step = (t_pad // block) == 1
    out = pl.pallas_call(
        functools.partial(_bw_stats_kernel, k, prec, exp_mode, stats_pass,
                          single_step),
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
