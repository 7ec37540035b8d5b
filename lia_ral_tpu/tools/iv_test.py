"""IvTest: i-vector trial scoring CLI.

Equivalent of reference ``LIA_SpkDet/IvTest`` (IvTest.cpp:73-706): load
trial structure (models may enrol several sessions), optional EFR/LDA/WCCN
estimated on a dev set OR loaded from saved matrices (ivNormLoadParam,
loadWccnMatrix/loadMahalanobisMatrix/load2covMatrix, IvTest.cpp:94-126,
369-379), scoring = cosine | mahalanobis | 2cov | plda (native or mean),
ASCII NIST or binary matrix score output (outputScoreFormat,
IvTest.cpp:412-465).
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

from ..backend.ivnorm import (DevSet, apply_efr, compute_cov_matrices,
                              compute_lda, compute_mahalanobis, compute_wccn,
                              efr_iterations)
from ..backend.plda import PldaModel, plda_llr, plda_train
from ..backend.scoring import cosine_scores, mahalanobis_scores, two_cov_scores
from ..config import Config
from ..io.lists import read_ndx
from ..io.matrix import read_matrix_file, write_matrix_file
from ..io.nist import ScoreLine, write_nist_scores
from .common import setup_verbose
from .iv_norm import load_vectors
from .total_variability import matrix_out_path


def _matrix_in_path(name: str, cfg: Config) -> str:
    root = cfg.get_str("matrixFilesPath", "./")
    ext = cfg.get_str("loadMatrixFilesExtension",
                      cfg.get_str("saveMatrixFilesExtension", ".matx"))
    return os.path.join(root, name + ext)


def main(cfg: Config) -> list[ScoreLine]:
    verbose = setup_verbose(cfg)
    # enrollment: "model file1 [file2 ...]" lines (targetIdList)
    enroll_lines = read_ndx(cfg.get_str("targetIdList"))
    # trials: "testSeg model1 model2 ..." NDX lines
    ndx = read_ndx(cfg.get_str("ndxFilename"))
    max_clients = cfg.get_int("maxTargetLine", 0)
    if max_clients:
        ndx = [(t, ms[:max_clients]) for t, ms in ndx]
    gender = cfg.get_str("gender", "M")
    # reference key is "scoring"; scoreMode kept as an alias
    mode = cfg.get_str("scoring", cfg.get_str("scoreMode", "cosine"))
    use_wccn = cfg.get_bool("wccn", False)
    load_wccn = use_wccn and cfg.get_bool("loadWccnMatrix", False)
    load_maha = (mode == "mahalanobis"
                 and cfg.get_bool("loadMahalanobisMatrix", False))
    load_2cov = mode == "2cov" and cfg.get_bool("load2covMatrix", False)
    iv_norm = cfg.get_bool("ivNorm", False)
    load_efr = iv_norm and cfg.get_bool("ivNormLoadParam", False)
    efr_mode = cfg.get_str("ivNormEfrMode", "EFR")
    mat_base = cfg.get_str("ivNormEfrMatrixBaseName", "ivNormEfrMatrix_it")
    mean_base = cfg.get_str("ivNormEfrMeanBaseName", "ivNormEfrMean_it")

    # a dev set is only needed when something must be ESTIMATED
    # (IvTest.cpp:120-126)
    need_dev = ((iv_norm and not load_efr)
                or (mode == "mahalanobis" and not load_maha)
                or (use_wccn and not load_wccn)
                or (mode == "2cov" and not load_2cov))
    dev = None
    params = []
    if need_dev and cfg.exists("backgroundNdxFilename"):
        dev_lines = read_ndx(cfg.get_str("backgroundNdxFilename"))
        names, labels = [], []
        for spk, files in dev_lines:
            for f in (files if files else [spk]):
                names.append(f)
                labels.append(spk)
        dev_vecs = load_vectors(names, cfg)
        dev = DevSet.from_labels(dev_vecs, labels)
        if iv_norm and not load_efr:
            normed, params = efr_iterations(
                dev, cfg.get_int("ivNormIterationNb", 1), efr_mode)
            dev = DevSet.from_labels(np.asarray(normed), labels)
            # the reference saves the per-iteration transforms during
            # estimation (PldaDev::sphericalNuisanceNormalization)
            for it, (mu, m) in enumerate(params):
                write_matrix_file(
                    matrix_out_path(f"{efr_mode}_{mat_base}{it}", cfg),
                    np.asarray(m, np.float64))
                write_matrix_file(
                    matrix_out_path(f"{efr_mode}_{mean_base}{it}", cfg),
                    np.asarray(mu, np.float64)[None, :])
    if load_efr:
        # per-iteration mean/matrix saved by IvNorm (IvNorm.cpp / our
        # tools/iv_norm.py naming)
        for it in range(cfg.get_int("ivNormIterationNb", 1)):
            m = read_matrix_file(
                _matrix_in_path(f"{efr_mode}_{mat_base}{it}", cfg))
            mu = read_matrix_file(
                _matrix_in_path(f"{efr_mode}_{mean_base}{it}", cfg)).ravel()
            params.append((jnp.asarray(mu, jnp.float32),
                           jnp.asarray(m, jnp.float32)))

    def norm(v: np.ndarray) -> jnp.ndarray:
        x = jnp.asarray(v, jnp.float32)
        return apply_efr(x, params) if params else x

    model_names = [m for m, _ in enroll_lines]
    enroll_vecs, n_sessions = [], []
    for m, files in enroll_lines:
        vs = norm(load_vectors(files if files else [m], cfg))
        enroll_vecs.append(jnp.mean(vs, axis=0))
        n_sessions.append(len(files) if files else 1)
    enroll = jnp.stack(enroll_vecs)
    seg_names = list(dict.fromkeys(t for t, _ in ndx))
    segs = norm(load_vectors(seg_names, cfg))

    if cfg.exists("ldaRank") and dev is not None:
        proj = compute_lda(dev, cfg.get_int("ldaRank"))
        if cfg.exists("ldaMatrix"):
            write_matrix_file(
                matrix_out_path(cfg.get_str("ldaMatrix"), cfg),
                np.asarray(proj, np.float64))
        enroll = enroll @ proj.T
        segs = segs @ proj.T
        dev = DevSet.from_labels(np.asarray(dev.vectors @ proj.T),
                                 [f"s{i}" for i in np.asarray(dev.spk_ids)])
    elif cfg.exists("ldaMatrix") and cfg.get_bool("LDA", False):
        proj = jnp.asarray(
            read_matrix_file(_matrix_in_path(cfg.get_str("ldaMatrix"), cfg)),
            jnp.float32)
        enroll = enroll @ proj.T
        segs = segs @ proj.T

    two_cov_base = cfg.get_str("TwoCovFilename", "2Cov")
    if mode == "cosine":
        wccn = None
        if load_wccn:
            wccn = jnp.asarray(read_matrix_file(_matrix_in_path(
                cfg.get_str("wccnMatrix", "wccnMatrix"), cfg)), jnp.float32)
        elif use_wccn and dev is not None:
            wccn = compute_wccn(dev)
            if cfg.exists("wccnMatrix"):
                write_matrix_file(
                    matrix_out_path(cfg.get_str("wccnMatrix"), cfg),
                    np.asarray(wccn, np.float64))
        scores = cosine_scores(enroll, segs, wccn=wccn)
    elif mode == "mahalanobis":
        if load_maha:
            maha = jnp.asarray(read_matrix_file(_matrix_in_path(
                cfg.get_str("mahalanobisMatrix", "mahalanobisMatrix"), cfg)),
                jnp.float32)
        else:
            assert dev is not None, "mahalanobis needs backgroundNdxFilename"
            maha = compute_mahalanobis(dev)
            if cfg.exists("mahalanobisMatrix"):
                write_matrix_file(matrix_out_path(
                    cfg.get_str("mahalanobisMatrix"), cfg),
                    np.asarray(maha, np.float64))
        scores = mahalanobis_scores(enroll, segs, maha)
    elif mode == "2cov":
        if load_2cov:
            # saved as <TwoCovFilename>_W / _B (IvTest.cpp:369-379)
            w = jnp.asarray(read_matrix_file(
                _matrix_in_path(two_cov_base + "_W", cfg)), jnp.float32)
            b = jnp.asarray(read_matrix_file(
                _matrix_in_path(two_cov_base + "_B", cfg)), jnp.float32)
            mean = jnp.zeros((enroll.shape[1],), jnp.float32)
        else:
            assert dev is not None, "2cov needs backgroundNdxFilename"
            _, w, b = compute_cov_matrices(dev)
            mean = jnp.mean(dev.vectors, axis=0)
            write_matrix_file(matrix_out_path(two_cov_base + "_W", cfg),
                              np.asarray(w, np.float64))
            write_matrix_file(matrix_out_path(two_cov_base + "_B", cfg),
                              np.asarray(b, np.float64))
        scores = two_cov_scores(enroll - mean, segs - mean, w, b)
    elif mode in ("plda", "pldaMean"):
        if cfg.exists("pldaModelFilename"):
            plda = PldaModel.load(cfg.get_str("pldaModelFilename"))
        else:
            assert dev is not None, "plda needs a model or a dev set"
            from .common import resolve_mesh
            plda = plda_train(jax.random.key(cfg.get_int("randomSeed", 0)),
                              dev, cfg.get_int("pldaEigenVoiceNumber", 150),
                              cfg.get_int("pldaEigenChannelNumber", 0),
                              cfg.get_int("pldaNbIt", 10), verbose,
                              mesh=resolve_mesh(cfg))
        ns = (jnp.asarray(n_sessions, jnp.float32) if mode == "plda"
              else jnp.ones((len(model_names),), jnp.float32))
        from .common import resolve_mesh
        mesh = resolve_mesh(cfg)
        if mesh is not None:
            # numThread → model-axis sharded batched scoring (the
            # reference's threaded scoring loop, PldaTools.cpp:4061)
            from ..parallel.sharding import sharded_plda_llr
            scores = sharded_plda_llr(mesh, plda, enroll, ns, segs)
        else:
            scores = plda_llr(plda, enroll, ns, segs)
    else:
        raise ValueError(f"unknown scoring mode {mode}")

    scores = np.asarray(scores)
    seg_idx = {s: i for i, s in enumerate(seg_names)}
    mod_idx = {m: i for i, m in enumerate(model_names)}
    threshold = cfg.get_float("decisionThreshold", 0.0)
    results = []
    for test_name, models in ndx:
        for m in models:
            sc = float(scores[mod_idx[m], seg_idx[test_name]])
            results.append(ScoreLine(gender, m,
                                     "1" if sc > threshold else "0",
                                     test_name, sc))
    out_name = cfg.get_str("outputFilename")
    if cfg.get_str("outputScoreFormat", "ascii") == "binary":
        # binary mode (IvTest.cpp:441-465): model/segment name lists +
        # the full (M,S) score matrix in .matx format
        with open(out_name + "_model.txt", "w") as f:
            f.write("".join(m + "\n" for m in model_names))
        with open(out_name + "_testSeg.txt", "w") as f:
            f.write("".join(s + "\n" for s in seg_names))
        write_matrix_file(
            out_name + cfg.get_str("saveMatrixFilesExtension", ".matx"),
            scores.astype(np.float64))
    else:
        write_nist_scores(out_name, results)
    if verbose:
        print(f"scored {len(results)} trials ({mode})")
    return results


if __name__ == "__main__":
    main(Config.from_cli(sys.argv[1:]))
