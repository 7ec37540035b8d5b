"""Score normalization: z-norm, t-norm, zt-norm, tz-norm.

TPU-native equivalent of reference ``LIA_SpkDet/ComputeNorm``
(ComputeNorm.cpp:491-765; Norm/DistribNorm classes cpp:96-365): per-entity
impostor score distributions normalise trial scores.  Core operates on
(M models × T segments) score matrices; the file-level tool
(tools/compute_norm.py) adapts NIST score files to these.

Modes: mean/std (default) or median-based (reference normType "median"),
with optional highest-score percentile selection (reference
nbScoreNormSelect / percentile trimming).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _stats(scores: jax.Array, axis: int, use_median: bool = False,
           top_fraction: float | None = None) -> tuple[jax.Array, jax.Array]:
    """Mean/std (or median/MAD-ish) of impostor scores along ``axis``,
    optionally over only the highest ``top_fraction`` of scores
    (reference selection of best impostor scores)."""
    if top_fraction is not None and 0.0 < top_fraction < 1.0:
        k = max(int(scores.shape[axis] * top_fraction), 2)
        top = jax.lax.top_k(jnp.moveaxis(scores, axis, -1), k)[0]
        scores = jnp.moveaxis(top, -1, axis)
    if use_median:
        mu = jnp.median(scores, axis=axis)
        sd = jnp.sqrt(jnp.median((scores - jnp.expand_dims(mu, axis)) ** 2,
                                 axis=axis))
    else:
        mu = jnp.mean(scores, axis=axis)
        sd = jnp.std(scores, axis=axis)
    return mu, jnp.maximum(sd, 1e-12)


def znorm(scores: jax.Array, impostor_seg_scores: jax.Array,
          use_median: bool = False,
          top_fraction: float | None = None) -> jax.Array:
    """Z-norm: normalise per MODEL using its scores against impostor
    segments.  scores (M,T); impostor_seg_scores (M, Z)."""
    mu, sd = _stats(impostor_seg_scores, axis=1, use_median=use_median,
                    top_fraction=top_fraction)
    return (scores - mu[:, None]) / sd[:, None]


def tnorm(scores: jax.Array, impostor_model_scores: jax.Array,
          use_median: bool = False,
          top_fraction: float | None = None) -> jax.Array:
    """T-norm: normalise per SEGMENT using impostor-model scores against
    it.  scores (M,T); impostor_model_scores (I, T)."""
    mu, sd = _stats(impostor_model_scores, axis=0, use_median=use_median,
                    top_fraction=top_fraction)
    return (scores - mu[None, :]) / sd[None, :]


def ztnorm(scores: jax.Array, impostor_seg_scores: jax.Array,
           impostor_model_scores: jax.Array,
           impostor_cross_scores: jax.Array,
           use_median: bool = False) -> jax.Array:
    """ZT-norm: z-norm first, then t-norm with z-normed impostor models
    (reference ztnorm mode, ComputeNorm.cpp:491+).

    impostor_cross_scores (I, Z): impostor models × impostor segments —
    needed to z-norm the impostor-model score rows consistently."""
    z = znorm(scores, impostor_seg_scores, use_median)
    z_imp = znorm(impostor_model_scores, impostor_cross_scores, use_median)
    return tnorm(z, z_imp, use_median)


def tznorm(scores: jax.Array, impostor_seg_scores: jax.Array,
           impostor_model_scores: jax.Array,
           impostor_cross_scores: jax.Array,
           use_median: bool = False) -> jax.Array:
    """TZ-norm: t-norm first, then z-norm with t-normed impostor segments."""
    t = tnorm(scores, impostor_model_scores, use_median)
    t_imp = tnorm(impostor_seg_scores, impostor_cross_scores, use_median)
    return znorm(t, t_imp, use_median)
