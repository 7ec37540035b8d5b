"""Score normalization: z-norm, t-norm, zt-norm, tz-norm.

TPU-native equivalent of reference ``LIA_SpkDet/ComputeNorm``
(ComputeNorm.cpp:491-765; Norm/DistribNorm classes cpp:96-365): per-entity
impostor score distributions normalise trial scores.  Core operates on
(M models × T segments) score matrices; the file-level tool
(tools/compute_norm.py) adapts NIST score files to these.

Modes follow ``DistribNorm::computeMeanStd`` (ComputeNorm.cpp:121-159):
mean/std (``meanMode 0``) or median + mean-absolute-deviation
(``meanMode 1``), with optional percentile trimming — drop the highest
``percentH`` and lowest ``percentL`` fraction of each impostor
distribution before computing the statistics (cpp:127-135).  Trim counts
are static Python ints, so the sort+slice stays jit-compatible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _stats(scores: jax.Array, axis: int, use_median: bool = False,
           percent_h: float = 0.0, percent_l: float = 0.0
           ) -> tuple[jax.Array, jax.Array]:
    """Per-entity location/scale of impostor scores along ``axis``
    (reference DistribNorm::computeMeanStd, ComputeNorm.cpp:121-159)."""
    n = scores.shape[axis]
    if percent_h or percent_l:
        discard_h = int(n * percent_h)
        discard_l = int(n * percent_l)
        srt = jnp.sort(jnp.moveaxis(scores, axis, -1), axis=-1,
                       descending=True)
        scores = jnp.moveaxis(srt[..., discard_h:n - discard_l], -1, axis)
        n = n - discard_h - discard_l
    if use_median:
        # reference meanMode 1: location = median element, scale = mean
        # absolute deviation (cpp:147-151)
        mu = jnp.median(scores, axis=axis)
        sd = jnp.mean(jnp.abs(scores - jnp.expand_dims(mu, axis)), axis=axis)
    else:
        mu = jnp.mean(scores, axis=axis)
        sd = jnp.std(scores, axis=axis)    # biased, as cpp:145-146
    return mu, jnp.maximum(sd, 1e-12)


def znorm(scores: jax.Array, impostor_seg_scores: jax.Array,
          use_median: bool = False, percent_h: float = 0.0,
          percent_l: float = 0.0) -> jax.Array:
    """Z-norm: normalise per MODEL using its scores against impostor
    segments.  scores (M,T); impostor_seg_scores (M, Z)."""
    mu, sd = _stats(impostor_seg_scores, axis=1, use_median=use_median,
                    percent_h=percent_h, percent_l=percent_l)
    return (scores - mu[:, None]) / sd[:, None]


def tnorm(scores: jax.Array, impostor_model_scores: jax.Array,
          use_median: bool = False, percent_h: float = 0.0,
          percent_l: float = 0.0) -> jax.Array:
    """T-norm: normalise per SEGMENT using impostor-model scores against
    it.  scores (M,T); impostor_model_scores (I, T)."""
    mu, sd = _stats(impostor_model_scores, axis=0, use_median=use_median,
                    percent_h=percent_h, percent_l=percent_l)
    return (scores - mu[None, :]) / sd[None, :]


def ztnorm(scores: jax.Array, impostor_seg_scores: jax.Array,
           impostor_model_scores: jax.Array,
           impostor_cross_scores: jax.Array,
           use_median: bool = False, percent_h: float = 0.0,
           percent_l: float = 0.0) -> jax.Array:
    """ZT-norm: z-norm first, then t-norm with z-normed impostor models
    (reference ztnorm mode, ComputeNorm.cpp:491+).

    impostor_cross_scores (I, Z): impostor models × impostor segments —
    needed to z-norm the impostor-model score rows consistently."""
    z = znorm(scores, impostor_seg_scores, use_median, percent_h, percent_l)
    z_imp = znorm(impostor_model_scores, impostor_cross_scores, use_median,
                  percent_h, percent_l)
    return tnorm(z, z_imp, use_median, percent_h, percent_l)


def tznorm(scores: jax.Array, impostor_seg_scores: jax.Array,
           impostor_model_scores: jax.Array,
           impostor_cross_scores: jax.Array,
           use_median: bool = False, percent_h: float = 0.0,
           percent_l: float = 0.0) -> jax.Array:
    """TZ-norm: t-norm first, then z-norm with t-normed impostor segments."""
    t = tnorm(scores, impostor_model_scores, use_median, percent_h, percent_l)
    t_imp = tnorm(impostor_seg_scores, impostor_cross_scores, use_median,
                  percent_h, percent_l)
    return znorm(t, t_imp, use_median, percent_h, percent_l)
