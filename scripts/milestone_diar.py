"""End-to-end diarization milestone (LIA_SpkSeg chain) with DER.

Round-4: configs 1-5 have EER records but the diarization suite
(SURVEY.md §2.3) had only unit tests.  This drives the REAL CLI chain
on a synthetic multi-speaker conversation:

  TrainWorld (UBM on the conversation itself, the createWorld
  convention, Tools.cpp:1243) → Segmentation (E-HMM speaker carving,
  Segmentation.cpp:356-484) → ReSegmentation (MAP-adapted Viterbi
  refinement, ReSegmentation.cpp:245-328)

and scores frame-level DER (optimal speaker mapping, NIST md-eval
convention; backend/eval.py:der) against the generating turn
sequence, before and after resegmentation.

Corpus: the milestone feature-domain convention — a shared mixture
bed; each speaker = Dirichlet weight signature + per-component mean
offsets; the conversation is back-to-back 2-8 s turns (all speech —
the E-HMM state bank has no non-speech state, so the DER here
measures SPEAKER CONFUSION + boundary error; speech/non-speech miss
and false alarm are exercised by the energy-VAD path in
milestone_audio.py instead).

Usage: python scripts/milestone_diar.py [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

N_SPK = 3
MINUTES = 5.0
D_FEAT = 24
K_BED = 64
K_UBM = 128


def gen_conversation(rng):
    """(features (N,D), ref per-frame speaker ids)."""
    centers = rng.standard_normal((K_BED, D_FEAT)) * 2.0
    spk_w = rng.dirichlet(np.full(K_BED, 2.5), size=N_SPK)
    spk_off = rng.standard_normal((N_SPK, K_BED, D_FEAT)) * 0.35
    frames, ref = [], []
    total = int(MINUTES * 60 * 100)
    cur = 0
    while cur < total:
        s = int(rng.integers(N_SPK))
        n = int(rng.uniform(2.0, 8.0) * 100)
        comp = rng.choice(K_BED, size=n, p=spk_w[s])
        x = (centers[comp] + spk_off[s, comp]
             + rng.standard_normal((n, D_FEAT)) * 0.6)
        frames.append(x)
        ref.extend([s] * n)
        cur += n
    return np.concatenate(frames).astype(np.float32), np.asarray(ref)


def segs_to_frames(segs, n, frame_length=0.01):
    """Label segments → per-frame integer ids (-1 = unlabelled)."""
    out = np.full(n, -1, np.int64)
    names = {}
    for s in segs:
        b = int(round(s.begin / frame_length))
        e = min(int(round(s.end / frame_length)), n)
        if s.label not in names:
            names[s.label] = len(names)
        out[b:e] = names[s.label]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (e.g. cpu)")
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    from lia_ral_tpu.backend.eval import der
    from lia_ral_tpu.config import Config
    from lia_ral_tpu.io.features import write_feature_file
    from lia_ral_tpu.tools import train_world
    from lia_ral_tpu.tools.spkseg_tools import reseg_main, segmentation_main

    rng = np.random.default_rng(20260823)
    d = tempfile.mkdtemp(prefix="milestone_diar_")
    stages = {}

    def stage(name):
        class _T:
            def __enter__(self):
                self.t0 = time.perf_counter()

            def __exit__(self, *a):
                stages[name] = round(time.perf_counter() - self.t0, 2)
        return _T()

    with stage("gen_corpus"):
        x, ref = gen_conversation(rng)
        write_feature_file(os.path.join(d, "conv.prm"), x, fmt="SPRO4")

    base = {
        "featureFilesPath": d + "/", "mixtureFilesPath": d + "/",
        "labelFilesPath": d + "/", "lstPath": d + "/",
        "loadFeatureFileFormat": "SPRO4",
        "loadFeatureFileExtension": ".prm",
        "saveMixtureFileFormat": "RAW", "saveMixtureFileExtension": ".gmm",
        "loadMixtureFileExtension": ".gmm",
        "addDefaultLabel": "true", "defaultLabel": "speech",
        "labelSelectedFrames": "speech",
        "mixtureDistribCount": K_UBM,
        "nbTrainIt": 4, "baggedFrameProbability": 1.0,
        "baggedFrameProbabilityInit": 1.0,
        "initVarianceFlooring": 1.0, "initVarianceCeiling": 10.0,
        "finalVarianceFlooring": 0.5, "finalVarianceCeiling": 5.0,
    }

    with stage("train_world"):
        cfg = Config(base)
        cfg["inputFeatureFilename"] = "conv"
        cfg["outputWorldFilename"] = "wld"
        train_world.main(cfg)

    with stage("segmentation"):
        cfg = Config(base)
        cfg["inputFeatureFilename"] = "conv"
        cfg["inputWorldFilename"] = "wld"
        cfg["maxSpeakers"] = 5
        # weak prior: a 300-frame seed must be able to win Viterbi
        # frames from the incumbent states (see e_hmm_segmentation)
        cfg["MAPRegFactorMean"] = 3.0
        cfg["saveLabelFileExtension"] = ".seg.lbl"
        segs = segmentation_main(cfg)["conv"]

    hyp_seg = segs_to_frames(segs, ref.shape[0])
    res = {
        "n_frames": int(ref.shape[0]),
        "n_ref_speakers": int(N_SPK),
        "n_hyp_speakers_seg": int(len({s.label for s in segs})),
        "der_segmentation": round(der(ref, hyp_seg), 5),
        "der_segmentation_collar25": round(
            der(ref, hyp_seg, collar_frames=25), 5),
    }

    with stage("resegmentation"):
        cfg = Config(base)
        cfg["inputFeatureFilename"] = "conv"
        cfg["inputWorldFilename"] = "wld"
        cfg["MAPRegFactorMean"] = 3.0
        cfg["loadLabelFileExtension"] = ".seg.lbl"
        cfg["saveLabelFileExtension"] = ".reseg.lbl"
        rsegs = reseg_main(cfg)["conv"]

    hyp_rs = segs_to_frames(rsegs, ref.shape[0])
    res["n_hyp_speakers_reseg"] = int(len({s.label for s in rsegs}))
    res["der_resegmentation"] = round(der(ref, hyp_rs), 5)
    res["der_resegmentation_collar25"] = round(
        der(ref, hyp_rs, collar_frames=25), 5)

    summary = {
        "milestone": "diarization end-to-end (E-HMM segmentation + "
                     "resegmentation, DER vs generating turns)",
        "platform": str(jax.devices()[0]),
        "shapes": {"minutes": MINUTES, "n_speakers": N_SPK,
                   "K_ubm": K_UBM, "D": D_FEAT},
        "results": res,
        "stage_wall_s": stages,
        "total_wall_s": round(sum(stages.values()), 1),
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
