"""PLDA: standalone G-PLDA trainer CLI.

Equivalent of reference ``LIA_SpkDet/PLDA`` (PLDA.cpp:74-99): load dev
i-vectors, center/length-norm, EM loop, save the model.
"""

from __future__ import annotations

import sys

import jax

from ..backend.ivnorm import DevSet, length_norm
from ..backend.plda import plda_train
from ..config import Config
from ..io.lists import read_ndx
from .common import setup_verbose
from .iv_norm import load_vectors


def main(cfg: Config):
    verbose = setup_verbose(cfg)
    dev_lines = read_ndx(cfg.get_str("backgroundNdxFilename"))
    names, labels = [], []
    for spk, files in dev_lines:
        for f in (files if files else [spk]):
            names.append(f)
            labels.append(spk)
    vecs = load_vectors(names, cfg)
    dev = DevSet.from_labels(vecs, labels)
    if cfg.get_bool("lengthNorm", True):
        dev = DevSet.from_labels(length_norm(dev.vectors), labels)
    model = plda_train(
        jax.random.key(cfg.get_int("randomSeed", 0)), dev,
        rank_f=cfg.get_int("pldaEigenVoiceNumber", 150),
        rank_g=cfg.get_int("pldaEigenChannelNumber", 0),
        n_iterations=cfg.get_int("pldaNbIt", 10),
        verbose=verbose)
    model.save(cfg.get_str("pldaModelFilename", "plda_model.npz"))
    if verbose:
        print(f"saved PLDA model (rankF={model.rank_f}, "
              f"rankG={model.rank_g})")
    return model


if __name__ == "__main__":
    main(Config.from_cli(sys.argv[1:]))
