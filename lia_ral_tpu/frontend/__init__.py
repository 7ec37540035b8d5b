"""Feature front end: MFCC extraction, SDC, normalization, energy VAD.

Covers reference L0 (SPro MFCC, external in the reference — README.md
"Feature extraction") plus the LIA_SpkDet front-end tools NormFeat,
NormFeatWindowMode, ShiftedDeltaFeat and EnergyDetector (SURVEY.md §2.2).
"""

from .normfeat import (
    cmvn_global,
    cmvn_segmental,
    cmvn_window,
    feature_warping,
)
from .energy_vad import EnergyDetectorCfg, energy_detector
from .mfcc import mfcc, MfccCfg, add_deltas
from .sdc import shifted_delta_cepstra

__all__ = [
    "cmvn_global", "cmvn_segmental", "cmvn_window", "feature_warping",
    "EnergyDetectorCfg", "energy_detector",
    "mfcc", "MfccCfg", "add_deltas",
    "shifted_delta_cepstra",
]
