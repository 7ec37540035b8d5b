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
from .common import resolve_mesh, setup_verbose
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
    init = None
    if cfg.get_bool("pldaLoadInitMatrices", False):
        # warm-start EM from saved matrices (PldaTools.cpp:2074-2108)
        from ..backend.plda import PldaModel
        init = PldaModel.load_reference(
            _mat_path(cfg, "pldaMeanVecInit", "pldaMeanVec", load=True),
            _mat_path(cfg, "pldaEigenVoiceMatrixInit",
                      "pldaEigenVoiceMatrix", load=True),
            _mat_path(cfg, "pldaEigenChannelMatrixInit",
                      "pldaEigenChannelMatrix", load=True)
            if cfg.get_int("pldaEigenChannelNumber", 0) else None,
            _mat_path(cfg, "pldaSigmaMatrixInit", "pldaSigmaMatrix",
                      load=True))
    model = plda_train(
        jax.random.key(cfg.get_int("randomSeed", 0)), dev,
        rank_f=cfg.get_int("pldaEigenVoiceNumber", 150),
        rank_g=cfg.get_int("pldaEigenChannelNumber", 0),
        n_iterations=cfg.get_int("pldaNbIt", 10),
        verbose=verbose, init=init, mesh=resolve_mesh(cfg))
    model.save(cfg.get_str("pldaModelFilename", "plda_model.npz"))
    # reference-format matrix set (PldaModel::saveModel naming keys)
    model.save_reference(
        _mat_path(cfg, "pldaMeanVec", "pldaMeanVec"),
        _mat_path(cfg, "pldaEigenVoiceMatrix", "pldaEigenVoiceMatrix"),
        _mat_path(cfg, "pldaEigenChannelMatrix", "pldaEigenChannelMatrix"),
        _mat_path(cfg, "pldaSigmaMatrix", "pldaSigmaMatrix"),
        _mat_path(cfg, "pldaMinDivMean", "pldaMinDivMean"))
    if verbose:
        print(f"saved PLDA model (rankF={model.rank_f}, "
              f"rankG={model.rank_g})")
    return model


def _mat_path(cfg: Config, key: str, default: str, load: bool = False) -> str:
    import os
    ext_key = "loadMatrixFilesExtension" if load else "saveMatrixFilesExtension"
    return os.path.join(cfg.get_str("matrixFilesPath", "./"),
                        cfg.get_str(key, default)
                        + cfg.get_str(ext_key, ".matx"))


if __name__ == "__main__":
    main(Config.from_cli(sys.argv[1:]))
