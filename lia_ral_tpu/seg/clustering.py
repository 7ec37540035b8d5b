"""Speaker-clustering criteria: CLR, GLLR, BIC, ΔBIC.

TPU-native equivalent of reference ``LIA_SpkTools/ClusteringCriterion``
(ClusteringCriterion.cpp): clrCrit (cpp:71-98), gllrCrit (cpp:104-125),
bicCrit (cpp:130-142: −GLLR − λ·P with P = ½(2D+1)K·log(n1+n2)),
deltabicCrit (cpp:144-150: = GLLR).  Criteria operate on frame arrays
with masks and GmmDiag models; LLKs come from the shared GMM kernels.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..gmm.kernels import frame_llk
from ..gmm.model import GmmDiag


def _mean_llk(x, w, gmm) -> float:
    llk = frame_llk(x, gmm)
    return float(jnp.sum(llk * w) / jnp.maximum(jnp.sum(w), 1e-30))


def _acc_llk(x, w, gmm) -> float:
    return float(jnp.sum(frame_llk(x, gmm) * w))


def clr_crit(x, w1, w2, m1: GmmDiag, m2: GmmDiag, world: GmmDiag) -> float:
    """Cross-likelihood ratio (cpp:71-98): (LLK_m1(c2) − LLK_W(c2)) +
    (LLK_m2(c1) − LLK_W(c1)), mean-per-frame LLKs."""
    return ((_mean_llk(x, w2, m1) - _mean_llk(x, w2, world))
            + (_mean_llk(x, w1, m2) - _mean_llk(x, w1, world)))


def gllr_crit(x, w1, w2, m1: GmmDiag, m2: GmmDiag, m12: GmmDiag) -> float:
    """Generalised LLR (cpp:104-125): LLK_m12(c1∪c2) − LLK_m1(c1) −
    LLK_m2(c2), accumulated (not mean) LLKs."""
    w12 = jnp.maximum(w1, w2)
    return (_acc_llk(x, w12, m12)
            - (_acc_llk(x, w1, m1) + _acc_llk(x, w2, m2)))


def bic_crit(x, w1, w2, m1: GmmDiag, m2: GmmDiag, m12: GmmDiag,
             lam: float = 1.0) -> float:
    """BIC (cpp:130-142): −GLLR − λ·½·(2D+1)·K·log(n1+n2)."""
    gllr = gllr_crit(x, w1, w2, m1, m2, m12)
    d = m1.dim
    k = m1.n_components
    n = float(jnp.sum(w1) + jnp.sum(w2))
    p = 0.5 * ((2 * d + 1) * k) * np.log(max(n, 1.0))
    return -gllr - lam * p


def delta_bic_crit(x, w1, w2, m1: GmmDiag, m2: GmmDiag,
                   m12: GmmDiag) -> float:
    """ΔBIC (cpp:144-150) — identical to GLLR in the reference."""
    return gllr_crit(x, w1, w2, m1, m2, m12)


def glr_window_distance(x1: np.ndarray, x2: np.ndarray) -> float:
    """Single-Gaussian GLR between two windows (TurnDetection.cpp:54-78):
    n·log|Σ12| − n1·log|Σ1| − n2·log|Σ2| with diagonal covariances."""
    n1, n2 = x1.shape[0], x2.shape[0]
    x12 = np.concatenate([x1, x2])
    def logdet(x):
        return np.sum(np.log(np.maximum(x.var(axis=0), 1e-8)))
    return ((n1 + n2) * logdet(x12) - n1 * logdet(x1) - n2 * logdet(x2))
