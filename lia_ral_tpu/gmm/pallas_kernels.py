"""Fused Pallas TPU kernel for GMM EM sufficient statistics.

The XLA path (kernels.em_stats) materialises the (N, K) posterior block in
HBM between the log-density matmuls and the γᵀ@x stat matmuls — at
K=2048, N=1M that is ~8 GB of round-trip traffic per EM iteration.  This
kernel fuses the whole chain per frame block inside VMEM:

    load x_b → quad/cross matmuls (MXU) → softmax (VPU) →
    γᵀ@x, γᵀ@x² (MXU) → accumulate into VMEM scratch

so γ never touches HBM.  Grid steps run sequentially on TPU, so the
scratch accumulators implement the associative stat merge (the same psum
structure as the sharded path).
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


def _em_stats_kernel(x_ref, w_ref, ivar_t_ref, mi_t_ref, cst_ref,
                     n_out, f_out, s_out, scal_out,
                     n_acc, f_acc, s_acc, scal_acc):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    @pl.when(step == 0)
    def _init():
        n_acc[:] = jnp.zeros_like(n_acc)
        f_acc[:] = jnp.zeros_like(f_acc)
        s_acc[:] = jnp.zeros_like(s_acc)
        scal_acc[:] = jnp.zeros_like(scal_acc)

    xb = x_ref[:]                                   # (BN, D)
    wb = w_ref[:]                                   # (BN, 1)
    xx = xb * xb
    quad = jnp.dot(xx, ivar_t_ref[:],
                   preferred_element_type=jnp.float32)        # (BN, K)
    cross = jnp.dot(xb, mi_t_ref[:],
                    preferred_element_type=jnp.float32)
    ld = -0.5 * quad + cross + cst_ref[:]           # (BN, K) log w_k N_k
    m = jnp.max(ld, axis=-1, keepdims=True)
    p = jnp.exp(ld - m)
    ssum = jnp.sum(p, axis=-1, keepdims=True)
    llk = jnp.log(ssum) + m                         # (BN, 1)
    gw = p * (wb / ssum)                            # weighted posteriors
    n_acc[:] += jnp.sum(gw, axis=0, keepdims=True)  # (1, K)
    f_acc[:] += jnp.dot(gw.T, xb, preferred_element_type=jnp.float32)
    s_acc[:] += jnp.dot(gw.T, xx, preferred_element_type=jnp.float32)
    upd = jnp.stack([jnp.sum(llk * wb), jnp.sum(wb)]).reshape(1, 2)
    scal_acc[:] += upd

    @pl.when(step == n_steps - 1)
    def _write():
        n_out[:] = n_acc[:]
        f_out[:] = f_acc[:]
        s_out[:] = s_acc[:]
        scal_out[:] = scal_acc[:]


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def em_stats_fused(x: jax.Array, w: jax.Array, gmm: GmmDiag,
                   block: int = 512, interpret: bool = False) -> EmStats:
    """Drop-in fused replacement for kernels.em_stats_chunked."""
    n, d = x.shape
    k = gmm.n_components
    pad = (-n) % block
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, d), x.dtype)])
        w = jnp.concatenate([w, jnp.zeros((pad,), w.dtype)])
    total = x.shape[0]
    mi = gmm.means * gmm.cov_inv
    cst = (-0.5 * (d * _LOG_2PI - jnp.sum(jnp.log(gmm.cov_inv), axis=-1))
           - 0.5 * jnp.sum(gmm.means * mi, axis=-1)
           + jnp.log(gmm.weights))                  # (K,)
    grid = total // block
    out_shapes = (
        jax.ShapeDtypeStruct((1, k), jnp.float32),      # n
        jax.ShapeDtypeStruct((k, d), jnp.float32),      # F
        jax.ShapeDtypeStruct((k, d), jnp.float32),      # S
        jax.ShapeDtypeStruct((1, 2), jnp.float32),      # [llk, count]
    )
    n_o, f_o, s_o, scal_o = pl.pallas_call(
        _em_stats_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((block, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((1, k), jnp.float32),
            pltpu.VMEM((k, d), jnp.float32),
            pltpu.VMEM((k, d), jnp.float32),
            pltpu.VMEM((1, 2), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * total * k * d,
            bytes_accessed=total * d * 4 * 3 + k * d * 4 * 4,
            transcendentals=total * k,
        ),
    )(x, w[:, None], gmm.cov_inv.T, mi.T, cst[None, :])
    return EmStats(n=n_o[0], sum_x=f_o, sum_xx=s_o,
                   llk=scal_o[0, 0], count=scal_o[0, 1])
