"""Unsupervised/online speaker adaptation support (NIST unsupervised
protocol).

TPU-native equivalent of reference ``LIA_SpkTools/UnsupervisedTools``
(UnsupervisedTools.h): WMAP/WMAPGMM score→posterior weighting
(h:124-128, cpp:874+), fast LLR (h:108-115), windowed LLR (WindowLLR
class h:224-239), and the incremental weighted-EM MAP update used by
``LIA_SpkDet/SpkAdapt`` (TrainTargetAdapt, SpkAdapt.cpp:90):
computeMAPmodelFromEMones (h:136) — MAP from EM statistics accumulated
across trial utterances, each weighted by its WMAP posterior.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
import numpy as np

from ..gmm.kernels import EmStats, em_stats_chunked, frame_llk
from ..gmm.map_adapt import MapCfg, map_adapt
from ..gmm.em import m_step
from ..gmm.model import GmmDiag


def wmap(scores: np.ndarray, tar_mean: float, tar_std: float,
         imp_mean: float, imp_std: float, prior_tar: float = 0.5,
         llk_floor: float = -200.0) -> np.ndarray:
    """Gaussian WMAP (reference WMAP, cpp:874): posterior P(target|score)
    with single-Gaussian score models."""
    def logpdf(s, mu, sd):
        return (-0.5 * math.log(2 * math.pi) - np.log(sd)
                - 0.5 * ((s - mu) / sd) ** 2)
    lt = np.maximum(logpdf(scores, tar_mean, tar_std), llk_floor)
    ln = np.maximum(logpdf(scores, imp_mean, imp_std), llk_floor)
    pt = prior_tar * np.exp(lt)
    pn = (1.0 - prior_tar) * np.exp(ln)
    return pt / np.maximum(pt + pn, 1e-300)


def wmap_gmm(scores: np.ndarray, tar: GmmDiag, imp: GmmDiag,
             prior_tar: float = 0.5, llk_floor: float = -200.0
             ) -> np.ndarray:
    """GMM-based WMAP (reference WMAPGMM/FixedPriors): 1-D score GMMs for
    the target and impostor distributions."""
    s = jnp.asarray(scores, jnp.float32)[:, None]
    lt = np.maximum(np.asarray(frame_llk(s, tar)), llk_floor)
    ln = np.maximum(np.asarray(frame_llk(s, imp)), llk_floor)
    pt = prior_tar * np.exp(lt)
    pn = (1.0 - prior_tar) * np.exp(ln)
    return pt / np.maximum(pt + pn, 1e-300)


def windowed_llr(llr: np.ndarray, window: int, step: int
                 ) -> tuple[np.ndarray, np.ndarray]:
    """Sliding-window mean LLR (reference WindowLLR, h:224-239):
    returns (window start indices, mean LLR per window) via prefix sums."""
    n = llr.shape[0]
    if n < window:
        return np.zeros(0, np.int64), np.zeros(0)
    c = np.concatenate([[0.0], np.cumsum(llr)])
    starts = np.arange(0, n - window + 1, step)
    means = (c[starts + window] - c[starts]) / window
    return starts, means


@dataclasses.dataclass
class UnsupervisedAdapter:
    """Sequential WMAP-weighted incremental MAP (reference
    TrainTargetAdapt flow, SpkAdapt.cpp:90): keeps running EM statistics
    of all accepted/weighted test data plus the enrollment data and
    re-derives the MAP model after each trial."""

    world: GmmDiag
    map_cfg: MapCfg
    model: GmmDiag = None
    stats: EmStats = None

    def __post_init__(self):
        if self.model is None:
            self.model = self.world
        if self.stats is None:
            k, d = self.world.means.shape
            self.stats = EmStats.zeros(k, d)

    def enroll(self, x: jax.Array, w: jax.Array) -> None:
        """Add enrollment data with weight 1 and update the model."""
        self._accumulate(x, w, 1.0)

    def process_trial(self, x: jax.Array, w: jax.Array,
                      trial_weight: float) -> None:
        """Add one test utterance weighted by its WMAP posterior
        (reference weighted-frame EM)."""
        if trial_weight <= 1e-4:
            return
        self._accumulate(x, w, trial_weight)

    def _accumulate(self, x, w, scale: float) -> None:
        st = em_stats_chunked(x, w * scale, self.model)
        self.stats = self.stats.merge(st)
        # computeMAPmodelFromEMones: MAP combine of accumulated EM stats
        em_model = m_step(self.stats)
        self.model = map_adapt(self.world, em_model, self.stats.count,
                               self.map_cfg)

    def score(self, x: jax.Array, w: jax.Array, top_k: int = 10) -> float:
        from ..gmm.scoring import compute_test_llr, stack_gmms
        return float(np.asarray(compute_test_llr(
            x, w, self.world, stack_gmms([self.model]),
            top_k=min(top_k, self.world.n_components)))[0])
