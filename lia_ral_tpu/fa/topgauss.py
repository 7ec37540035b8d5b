"""Top-N Gaussian selection cache.

TPU-native equivalent of reference ``LIA_SpkTools/TopGauss``
(TopGauss.h:74-110): per-frame top component indices plus the residual
weight/likelihood of the non-top components, cached to disk and reused to
speed up repeated LLK evaluations (LFA/JFA scoring).  On TPU the
computation is one ``lax.top_k`` over the batched log-density matrix; the
cache keeps score parity across tools rather than saving compute.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..gmm.kernels import weighted_logdens
from ..gmm.model import GmmDiag


@dataclasses.dataclass
class TopGauss:
    """Per-frame top-N indices + residual mass (reference fields: index
    list, residual weight ``_w``, residual likelihood ``_lk``)."""

    indices: np.ndarray        # (N, top) int32
    top_lse: np.ndarray        # (N,) logsumexp of the top terms
    residual_log: np.ndarray   # (N,) log of the non-top weighted mass
    residual_weight: np.ndarray  # (N,) sum of non-top component weights

    @property
    def n_frames(self) -> int:
        return self.indices.shape[0]

    def frame_llk(self) -> np.ndarray:
        """Full-frame llk reconstructed from top + residual."""
        return np.logaddexp(self.top_lse, self.residual_log)

    # -- binary cache (reference read/write, TopGauss.cpp:76-110) ------------
    def save(self, path: str) -> None:
        np.savez(path, indices=self.indices, top_lse=self.top_lse,
                 residual_log=self.residual_log,
                 residual_weight=self.residual_weight)

    @classmethod
    def load(cls, path: str) -> "TopGauss":
        z = np.load(path)
        return cls(z["indices"], z["top_lse"], z["residual_log"],
                   z["residual_weight"])


def compute_topgauss(x: jax.Array, gmm: GmmDiag, top: int = 10) -> TopGauss:
    """Reference TopGauss::compute (cpp:113+): evaluate the world on every
    frame, keep the top components and the exact residual mass."""
    ld = weighted_logdens(x, gmm)                    # (N,K)
    full = jax.nn.logsumexp(ld, axis=-1)
    vals, idx = jax.lax.top_k(ld, top)
    top_lse = jax.nn.logsumexp(vals, axis=-1)
    diff = jnp.clip(top_lse - full, max=-1e-7)
    residual = full + jnp.log1p(-jnp.exp(diff))
    w_top = jnp.sum(gmm.weights[idx], axis=-1)
    return TopGauss(
        indices=np.asarray(idx, np.int32),
        top_lse=np.asarray(top_lse),
        residual_log=np.asarray(residual),
        residual_weight=np.asarray(1.0 - w_top),
    )


def topgauss_llk(x: jax.Array, gmm: GmmDiag, tg: TopGauss) -> jax.Array:
    """LLK of any model using a cached top set + the cached residual
    (reference TopGauss::get usage in LFA/JFA scoring)."""
    ld = weighted_logdens(x, gmm)
    sel = jnp.take_along_axis(ld, jnp.asarray(tg.indices), axis=-1)
    stacked = jnp.concatenate(
        [sel, jnp.asarray(tg.residual_log)[:, None]], axis=-1)
    return jax.nn.logsumexp(stacked, axis=-1)
