"""IvNorm: i-vector normalization CLI (EFR/sphNorm + LDA).

Equivalent of reference ``LIA_SpkDet/IvNorm`` (IvNorm.cpp:72-130):
estimate EFR/sphNorm iterations (and optionally LDA) on a dev set of
i-vectors, save per-iteration means/matrices, apply to listed vectors and
save the normalised per-file vectors.
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np

from ..backend.ivnorm import DevSet, apply_efr, compute_lda, efr_iterations
from ..config import Config
from ..io.lists import read_ndx
from ..io.matrix import read_matrix_file, write_matrix_file
from .common import setup_verbose
from .total_variability import matrix_out_path


def load_vectors(names: list[str], cfg: Config) -> np.ndarray:
    root = cfg.get_str("loadVectorFilesPath",
                       cfg.get_str("saveVectorFilesPath", "./"))
    ext = cfg.get_str("vectorFilesExtension", ".y")
    rows = [read_matrix_file(os.path.join(root, n + ext)).ravel()
            for n in names]
    return np.stack(rows).astype(np.float32)


def save_vectors(names: list[str], vecs: np.ndarray, cfg: Config) -> None:
    root = cfg.get_str("saveVectorFilesPath", "./")
    ext = cfg.get_str("vectorFilesExtension", ".y")
    for n, v in zip(names, vecs):
        write_matrix_file(os.path.join(root, n + ext),
                          np.asarray(v, np.float64)[None, :])


def main(cfg: Config) -> dict[str, np.ndarray]:
    verbose = setup_verbose(cfg)
    # dev list: lines "speaker file1 file2..." (reference backgroundNdxFilename)
    dev_lines = read_ndx(cfg.get_str("backgroundNdxFilename"))
    dev_names, labels = [], []
    for spk, files in dev_lines:
        for f in (files if files else [spk]):
            dev_names.append(f)
            labels.append(spk)
    dev_vecs = load_vectors(dev_names, cfg)
    dev = DevSet.from_labels(dev_vecs, labels)
    n_it = cfg.get_int("ivNormIterationNb", 1)
    mode = cfg.get_str("ivNormEfrMode", "EFR")
    normed_dev, params = efr_iterations(dev, n_it, mode)
    # save per-iteration transforms (reference naming convention)
    mat_base = cfg.get_str("ivNormEfrMatrixBaseName", "ivNormEfrMatrix_it")
    mean_base = cfg.get_str("ivNormEfrMeanBaseName", "ivNormEfrMean_it")
    for it, (mean, m) in enumerate(params):
        write_matrix_file(matrix_out_path(f"{mode}_{mat_base}{it}", cfg),
                          np.asarray(m, np.float64))
        write_matrix_file(matrix_out_path(f"{mode}_{mean_base}{it}", cfg),
                          np.asarray(mean, np.float64)[None, :])
    if cfg.exists("LDA") and cfg.get_bool("LDA", False):
        rank = cfg.get_int("ldaRank")
        dev_after = DevSet.from_labels(normed_dev, labels)
        proj = compute_lda(dev_after, rank)
        write_matrix_file(matrix_out_path(
            cfg.get_str("ldaMatrix", "ldaMatrix"), cfg),
            np.asarray(proj, np.float64))
    out: dict[str, np.ndarray] = {}
    if cfg.exists("inputVectorFilename"):
        test_lines = read_ndx(cfg.get_str("inputVectorFilename"))
        test_names = [n for n, fs in test_lines for n in ([n] if not fs else fs)]
        test_names = list(dict.fromkeys(test_names))
        vecs = load_vectors(test_names, cfg)
        normed = np.asarray(apply_efr(jnp.asarray(vecs), params))
        save_vectors(test_names, normed, cfg)
        out = dict(zip(test_names, normed))
        if verbose:
            print(f"normalised {len(test_names)} vectors ({mode}, {n_it} it)")
    return out


if __name__ == "__main__":
    main(Config.from_cli(sys.argv[1:]))
