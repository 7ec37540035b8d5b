"""IvTest: i-vector trial scoring CLI.

Equivalent of reference ``LIA_SpkDet/IvTest`` (IvTest.cpp:73-706): load
trial structure (models may enrol several sessions), optional EFR/LDA/WCCN
estimated on a dev set, scoring = cosine | mahalanobis | 2cov | plda
(native or mean), NIST-format score output.
"""

from __future__ import annotations

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
from ..io.nist import ScoreLine, write_nist_scores
from .common import setup_verbose
from .iv_norm import load_vectors


def main(cfg: Config) -> list[ScoreLine]:
    verbose = setup_verbose(cfg)
    # enrollment: "model file1 [file2 ...]" lines (targetIdList)
    enroll_lines = read_ndx(cfg.get_str("targetIdList"))
    # trials: "testSeg model1 model2 ..." NDX lines
    ndx = read_ndx(cfg.get_str("ndxFilename"))
    gender = cfg.get_str("gender", "M")
    mode = cfg.get_str("scoreMode", "cosine")   # cosine|mahalanobis|2cov|plda|pldaMean

    dev = None
    params = []
    if cfg.exists("backgroundNdxFilename"):
        dev_lines = read_ndx(cfg.get_str("backgroundNdxFilename"))
        names, labels = [], []
        for spk, files in dev_lines:
            for f in (files if files else [spk]):
                names.append(f)
                labels.append(spk)
        dev_vecs = load_vectors(names, cfg)
        dev = DevSet.from_labels(dev_vecs, labels)
        if cfg.get_bool("ivNorm", False):
            normed, params = efr_iterations(
                dev, cfg.get_int("ivNormIterationNb", 1),
                cfg.get_str("ivNormEfrMode", "EFR"))
            dev = DevSet.from_labels(np.asarray(normed),
                                     labels)

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
        enroll = enroll @ proj.T
        segs = segs @ proj.T
        dev = DevSet.from_labels(np.asarray(dev.vectors @ proj.T),
                                 [f"s{i}" for i in np.asarray(dev.spk_ids)])

    if mode == "cosine":
        wccn = compute_wccn(dev) if (dev is not None and
                                     cfg.get_bool("wccn", False)) else None
        scores = cosine_scores(enroll, segs, wccn=wccn)
    elif mode == "mahalanobis":
        assert dev is not None, "mahalanobis needs backgroundNdxFilename"
        scores = mahalanobis_scores(enroll, segs, compute_mahalanobis(dev))
    elif mode == "2cov":
        assert dev is not None, "2cov needs backgroundNdxFilename"
        _, w, b = compute_cov_matrices(dev)
        mean = jnp.mean(dev.vectors, axis=0)
        scores = two_cov_scores(enroll - mean, segs - mean, w, b)
    elif mode in ("plda", "pldaMean"):
        if cfg.exists("pldaModelFilename"):
            plda = PldaModel.load(cfg.get_str("pldaModelFilename"))
        else:
            assert dev is not None, "plda needs a model or a dev set"
            plda = plda_train(jax.random.key(cfg.get_int("randomSeed", 0)),
                              dev, cfg.get_int("pldaEigenVoiceNumber", 150),
                              cfg.get_int("pldaEigenChannelNumber", 0),
                              cfg.get_int("pldaNbIt", 10), verbose)
        ns = (jnp.asarray(n_sessions, jnp.float32) if mode == "plda"
              else jnp.ones((len(model_names),), jnp.float32))
        scores = plda_llr(plda, enroll, ns, segs)
    else:
        raise ValueError(f"unknown scoreMode {mode}")

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
    write_nist_scores(cfg.get_str("outputFilename"), results)
    if verbose:
        print(f"scored {len(results)} trials ({mode})")
    return results


if __name__ == "__main__":
    main(Config.from_cli(sys.argv[1:]))
