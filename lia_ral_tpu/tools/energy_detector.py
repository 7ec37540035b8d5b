"""EnergyDetector: energy VAD CLI → .lbl speech segments.

Equivalent of reference ``LIA_SpkDet/EnergyDetector`` (energyDetector
EnergyDetector.cpp:200-280).  The energy coefficient is selected with
``featureServerMask`` exactly as the reference does (fixture cfg:
``featureServerMask 16``, ``vectSize 1``).
"""

from __future__ import annotations

import os
import sys

from ..config import Config
from ..frontend.energy_vad import EnergyDetectorCfg, energy_detector
from ..io.labels import frame_mask_to_segments, write_label_file
from .common import label_path, load_features_and_mask, resolve_list, setup_verbose


def main(cfg: Config) -> dict[str, list]:
    verbose = setup_verbose(cfg)
    names = resolve_list(cfg, "inputFeatureFilename"
                         if cfg.exists("inputFeatureFilename")
                         else "inputFeatureFileName")
    ecfg = EnergyDetectorCfg.from_config(cfg)
    frame_length = cfg.get_float("frameLength", 0.01)
    label_output = cfg.get_str("labelOutputFrames", "speech")
    out: dict[str, list] = {}
    for name in names:
        fs, mask = load_features_and_mask([name], cfg)
        energy = fs.data[:, 0]     # after featureServerMask: energy only
        speech = energy_detector(energy, mask, ecfg, verbose=verbose)
        segs = frame_mask_to_segments(speech, frame_length, label_output)
        write_label_file(label_path(name, cfg, save=True), segs)
        out[name] = segs
        if verbose:
            print(f"[{name}] {int(speech.sum())}/{len(speech)} frames "
                  f"speech → {label_path(name, cfg, save=True)}")
    return out


if __name__ == "__main__":
    main(Config.from_cli(sys.argv[1:]))
