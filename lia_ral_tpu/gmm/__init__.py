"""Diagonal-covariance GMM engine: model pytrees, fused kernels, EM, MAP,
scoring.

This is the compute heart of the framework: one kernel family (log-density /
posterior / sufficient-stats over batched frames) serves UBM training
(TrainWorld), MAP target training (TrainTarget), energy VAD
(EnergyDetector), trial scoring (ComputeTest) and the factor-analysis
stats (ComputeJFAStats/TV) — mirroring how the reference routes everything
through ALIZE MixtureGDStat (SURVEY.md §2.1 AccumulateStat).
"""

from .model import GmmDiag
from .kernels import (
    component_logdens,
    frame_llk,
    llk_and_posteriors,
    em_stats,
    em_stats_chunked,
    EmStats,
)
from .em import (
    TrainCfg,
    m_step,
    variance_control,
    schedule_value,
    mixture_init,
    train_model,
    global_mean_cov,
)
from .map_adapt import MapCfg, map_adapt, adapt_model
from .scoring import compute_test_llr, top_k_llk

__all__ = [
    "GmmDiag", "component_logdens", "frame_llk", "llk_and_posteriors",
    "em_stats", "em_stats_chunked", "EmStats",
    "TrainCfg", "m_step", "variance_control", "schedule_value",
    "mixture_init", "train_model", "global_mean_cov",
    "MapCfg", "map_adapt", "adapt_model",
    "compute_test_llr", "top_k_llk",
]
