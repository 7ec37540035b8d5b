"""LIA_Utils CLI tools (SURVEY.md §2.4) behind one dispatcher.

Modes (utilMode config key) and their reference binaries:
scoring | fusion (FusionScore) | scoreWarp | hist | modelToSv | napSv |
readFeatFile | readModel | extractParams | polyExp | gmmTokenizer |
bNgram | labelNgram | sequenceDecode (SequenceExtractor+Decoder) |
labelFusion | timeCluster | svmTrain | svmPredict (Svm).
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np

from ..backend.supervector import model_to_sv, nap_project_vectors
from ..backend.svm import SvmModel, svm_train
from ..config import Config
from ..gmm.model import GmmDiag
from ..io.features import read_feature_file, write_feature_file
from ..io.labels import read_label_file, write_label_file
from ..io.lists import read_ndx, read_simple_list
from ..io.matrix import read_matrix_file, write_matrix_file
from ..io.nist import read_nist_scores, write_nist_scores
from ..utils import (NGramModel, confusion_matrix, fuse_label_files,
                     fuse_scores, gmm_tokenize, histogram,
                     max_score_identification, ngram_counts, poly_expand,
                     score_warp, scoring_decisions, sequence_decode,
                     time_cluster_filter)
from ..utils.polyexp import glds_expand_mean
from .common import (load_features_and_mask, mixture_path, resolve_list,
                     setup_verbose)


def scoring_main(cfg: Config):
    """Scoring post-processing.  ``mode NIST`` reproduces the reference's
    LIA→NIST04 conversion (Scoring.cpp:243-274): per line, decision =
    score > ``threshold`` → 't'/'f' (or max-score per segment with
    decision "true" under ``hardDecision``), written as
    "trainTypeTest adaptationMode segTypeTest gender model seg dec score"
    (the in-tree golden ``score.final.nist``)."""
    lines = read_nist_scores(cfg.get_str("inputFile"))
    if cfg.get_str("mode", "") == "NIST":
        from ..io.nist import format_nist04_line
        seg_t = cfg.get_str("segTypeTest")
        train_t = cfg.get_str("trainTypeTest")
        adapt = cfg.get_str("adaptationMode")
        hard = cfg.exists("hardDecision")
        out_lines = []
        if hard:
            by_seg: dict[str, list] = {}
            for ln in lines:
                by_seg.setdefault(ln.seg, []).append(ln)
            picked = [max(v, key=lambda s: s.score) for v in by_seg.values()]
            for ln in picked:
                out_lines.append(format_nist04_line(
                    train_t, adapt, seg_t, ln.gender.lower(), ln.model,
                    ln.seg, "true", ln.score))
        else:
            thr = cfg.get_float("threshold", 0.0)
            for ln in lines:
                dec = "t" if ln.score > thr else "f"
                out_lines.append(format_nist04_line(
                    train_t, adapt, seg_t, ln.gender.lower(), ln.model,
                    ln.seg, dec, ln.score))
        with open(cfg.get_str("outputFile"), "w", encoding="utf-8") as f:
            for t in out_lines:
                f.write(t + "\n")
        return out_lines
    if cfg.get_str("scoringMode", "decision") == "identification":
        out = max_score_identification(lines)
    else:
        out = scoring_decisions(lines, cfg.get_float("decisionThreshold", 0.0))
    write_nist_scores(cfg.get_str("outputFile"), out)
    return out


def fusion_main(cfg: Config):
    """FusionScore (reference CLI keys ``inputFileList``/``weights``/
    ``fusionMethod ArithMean``; test/fusion.lst fuses score.nist with
    itself at weights 0.5 0.5 → output must equal the input)."""
    files = read_simple_list(cfg.get_str(
        "inputFileList" if cfg.exists("inputFileList") else "fusionList"))
    wkey = "weights" if cfg.exists("weights") else "weightsFile"
    with open(cfg.get_str(wkey), "r", encoding="utf-8") as f:
        weights = [float(w) for w in f.read().split()]
    sets = [read_nist_scores(f) for f in files]
    out = fuse_scores(sets, weights)
    write_nist_scores(cfg.get_str("outputFile"), out)
    return out


def score_warp_main(cfg: Config):
    lines = read_nist_scores(cfg.get_str("inputFile"))
    scores = np.asarray([l.score for l in lines])
    warped = score_warp(scores,
                        target_mean=cfg.get_float("targetMean", 0.0),
                        target_std=cfg.get_float("targetStd", 1.0),
                        nb_bins=cfg.get_int("nbBins", 100))
    out = [l.__class__(l.gender, l.model, l.decision, l.seg, float(s),
                       begin=l.begin, end=l.end)
           for l, s in zip(lines, warped)]
    write_nist_scores(cfg.get_str("outputFile"), out)
    return out


def hist_main(cfg: Config):
    lines = read_nist_scores(cfg.get_str("inputFile"))
    hist, edges = histogram(np.asarray([l.score for l in lines]),
                            cfg.get_int("nbBins", 100))
    with open(cfg.get_str("outputFile"), "w") as f:
        for h, lo, hi in zip(hist, edges[:-1], edges[1:]):
            f.write(f"{lo:g} {hi:g} {h:g}\n")
    return hist, edges


def model_to_sv_main(cfg: Config):
    """ModelToSv (ModelToSvMain.cpp:77-166): GMM → supervector files.

    * ``meanSv``  — sv = stacked component means; the ``normSv``
      normalisation vector is √(w_i·covInv_ij) of the UBM
      (getMeanNorm, cpp:58-68 — the KL-kernel scaling);
    * ``weightSv`` — sv = component weights; norm = 1/√(w_i)
      (getWeightNorm, cpp:70-75);
    * ``vectors`` — read existing .vect files instead of models and only
      apply the normalisation (cpp:147-156);
    * ``normSv`` (alias ``normalizeSv``) multiplies elementwise by the
      UBM-derived norm vector (cpp:157-160).
    """
    mean_sv = cfg.get_bool("meanSv", not cfg.get_bool("weightSv", False))
    weight_sv = cfg.get_bool("weightSv", False)
    norm_sv = (cfg.get_bool("normSv", False)
               or cfg.get_bool("normalizeSv", False))
    from_vectors = cfg.get_bool("vectors", False)
    if cfg.exists("inputModelList"):
        names = resolve_list(cfg, "inputModelList")
    elif cfg.exists("inputFilename"):
        names = resolve_list(cfg, "inputFilename")
    else:
        names = [cfg.get_str("inputModelFilename")]
    vpath = cfg.get_str("vectorFilesPath", "./")
    vext = cfg.get_str("vectorFilesExtension", ".vect")
    norm_vec = None
    if norm_sv:
        ubm = GmmDiag.load(mixture_path(cfg.get_str("inputWorldFilename"),
                                        cfg))
        w = np.asarray(ubm.weights, np.float64)
        if weight_sv:
            norm_vec = 1.0 / np.sqrt(w)
        else:
            ci = np.asarray(ubm.cov_inv, np.float64)
            norm_vec = np.sqrt(w[:, None] * ci).ravel()
    out = {}
    for n in names:
        if from_vectors:
            iext = cfg.get_str("inputVectorFilesExtension", ".sv")
            sv = read_matrix_file(os.path.join(vpath, n + iext)) \
                .ravel().astype(np.float64)
        else:
            gmm = GmmDiag.load(mixture_path(n, cfg))
            if weight_sv:
                sv = np.asarray(gmm.weights, np.float64)
            else:
                sv = np.asarray(model_to_sv(gmm), np.float64)
        if norm_vec is not None:
            sv = sv * norm_vec
        write_matrix_file(os.path.join(vpath, n + vext), sv[None, :])
        out[n] = sv
    del mean_sv
    return out


def nap_sv_main(cfg: Config):
    u = read_matrix_file(cfg.get_str("napMatrix")).astype(np.float32)
    names = read_simple_list(cfg.get_str("inputVectorList"))
    root = cfg.get_str("vectorFilesPath", "./")
    ext = cfg.get_str("vectorFilesExtension", ".vect")
    out = {}
    for n in names:
        v = read_matrix_file(os.path.join(root, n + ext)).astype(np.float32)
        napped = np.asarray(nap_project_vectors(jnp.asarray(v),
                                                jnp.asarray(u)), np.float64)
        write_matrix_file(os.path.join(root, n + ".napped" + ext), napped)
        out[n] = napped
    return out


def read_feat_main(cfg: Config):
    ff = read_feature_file(
        cfg.get_str("inputFeatureFilename"),
        fmt=cfg.get_str("loadFeatureFileFormat", "SPRO4"),
        big_endian=cfg.get_bool("bigEndian", False),
        vect_size=cfg.get_int("loadFeatureFileVectSize", 0))
    for row in ff.data:
        print(" ".join(f"{v:g}" for v in row))
    return ff


def read_model_main(cfg: Config):
    gmm = GmmDiag.load(mixture_path(cfg.get_str("inputModelFilename"), cfg))
    print(f"MixtureGD distribCount={gmm.n_components} vectSize={gmm.dim}")
    w = np.asarray(gmm.weights)
    m = np.asarray(gmm.means)
    ci = np.asarray(gmm.cov_inv)
    for i in range(gmm.n_components):
        print(f"distrib {i} weight={w[i]:g}")
        print("  mean " + " ".join(f"{v:g}" for v in m[i]))
        print("  covInv " + " ".join(f"{v:g}" for v in ci[i]))
    return gmm


def extract_params_main(cfg: Config):
    from ..io.features import apply_mask
    names = resolve_list(cfg, "inputFeatureFilename")
    out = {}
    for n in names:
        fs, _ = load_features_and_mask([n], cfg)
        data = fs.data
        write_feature_file(
            os.path.join(cfg.get_str("featureFilesPath", "./"),
                         n + cfg.get_str("saveFeatureFileExtension", ".ext.prm")),
            data, fmt=cfg.get_str("saveFeatureFileFormat", "SPRO4"))
        out[n] = data
    return out


def poly_exp_main(cfg: Config):
    """PolyExpand (PolyExpand.cpp:164-211).  Three modes driven by the
    reference's own config keys (test fixture PolyExp/test/):
      default     — per file, mean order-3 expansion over the selected
                    frames, written per ``format`` (SVMLight: "exType
                    1:v1 2:v2 ..." — outputInstanceSVMLight cpp:147-156)
      computeR    — accumulate E[e²]/mean over ALL files (no per-file
                    reset, cpp:193-207) and write "1/sqrt(E[e_i²])
                    mean_i" lines to the ``computeR`` path (cpp:131-146)
      normalize F — load the R file and multiply each output vector
                    elementwise by its first column (cpp:118-122)"""
    names = resolve_list(cfg, "inputFeatureFilename")
    compute_r = cfg.exists("computeR")
    r_vec = None
    if cfg.exists("normalize"):
        rows = []
        with open(cfg.get_str("normalize")) as f:
            for line in f:
                parts = line.split()
                if parts:
                    rows.append(float(parts[0]))
        r_vec = np.asarray(rows, np.float64)
    fmt = cfg.get_str("format", "matx")
    ex_type = cfg.get_str("exType", "1")
    vext = cfg.get_str("vectorFilesExtension", ".exp.vect")
    out = {}
    acc_sum = acc_sq = acc_cnt = None
    for n in names:
        fs, mask = load_features_and_mask([n], cfg)
        xj = jnp.asarray(fs.data)
        wj = jnp.asarray(mask, jnp.float32)
        if compute_r:
            # FrameAccGD over the whole list (reset only at the end);
            # the (N, ~6545) expansion stays ON DEVICE — only the two
            # accumulator vectors come back to host
            e = poly_expand(xj)
            s1 = np.asarray(jnp.sum(e * wj[:, None], axis=0), np.float64)
            s2 = np.asarray(jnp.sum(e * e * wj[:, None], axis=0),
                            np.float64)
            if acc_sum is None:
                acc_sum, acc_sq, acc_cnt = s1, s2, 0.0
            else:
                acc_sum += s1
                acc_sq += s2
            acc_cnt += float(np.asarray(jnp.sum(wj)))
            continue
        # mean expansion computed on device (glds_expand_mean) — a
        # 6545-vector comes back, not the full frame expansion
        v = np.asarray(glds_expand_mean(xj, wj), np.float64)
        if r_vec is not None:
            v = v * r_vec
        path = os.path.join(cfg.get_str("vectorFilesPath", "./"), n + vext)
        if fmt == "SVMLight":
            with open(path, "w") as f:
                f.write(ex_type + " "
                        + " ".join(f"{i + 1}:{x:g}" for i, x in enumerate(v))
                        + " \n")
        else:
            write_matrix_file(path, v[None, :])
        out[n] = v
    if compute_r:
        if acc_sum is None:
            raise ValueError("polyExp computeR: empty input file list")
        mean = acc_sum / max(acc_cnt, 1e-30)
        msq = acc_sq / max(acc_cnt, 1e-30)
        # computeRSqrt cpp:131-136; identically-zero columns would give
        # inf — normalise them by 1 instead (they carry no information)
        r = np.where(msq > 0, 1.0 / np.sqrt(np.maximum(msq, 1e-300)), 1.0)
        with open(cfg.get_str("computeR"), "w") as f:
            for ri, mi in zip(r, mean):
                f.write(f"{ri:g} {mi:g}\n")
            f.write("\n")
        out["R"] = np.stack([r, mean])
    return out


def sequence_extract_main(cfg: Config):
    """SequenceExtractor (SequenceExtractor.cpp:732-827): load ngram
    files of order 1..maxOrder into a common-part tree, greedily carve
    nbOutputSymb equal-probability variable-length sequences, save the
    decoder tree + an info file (test fixture SequenceExtractor/test/
    test1.sh drives exactly these keys)."""
    from ..utils.seqtree import CommonPartTree, sequence_extractor
    tree = CommonPartTree.from_ngram_files(
        cfg.get_str("ngramFilename"), cfg.get_str("ngramExt", ".dta"),
        cfg.get_int("maxOrder"), cfg.get_int("maxNgram", 1 << 30))
    dec, info = sequence_extractor(
        tree, cfg.get_int("nbInputSymb"), cfg.get_int("nbOutputSymb"),
        equal_input_info=cfg.get_bool("equalInputInfo", False),
        verbose=cfg.get_bool("verbose", False))
    if cfg.exists("outputFilename"):
        with open(cfg.get_str("outputFilename"), "w") as f:
            dec.save(f)
    if cfg.exists("outputInfoFilename"):
        with open(cfg.get_str("outputInfoFilename"), "w") as f:
            for seq_id, count in info:
                f.write(f"{seq_id} {count}\n")
    return dec, info


def cov_intra_main(cfg: Config):
    """CovIntra (CovIntra.cpp:151-280): train the NAP / within-speaker
    covariance subspace from session supervectors.

    NDX lines = one speaker per line, elements = that speaker's session
    vectors; ``gmm true`` loads GMM files and stacks their means
    (loadMeanSv, cpp:107-118) instead of .vect files.  The top
    ``nbEigenVectors`` eigenvectors of the within-class scatter (the
    reference's SVDLIBC svdLAS2 call, cpp:257) are saved to
    ``channelMatrix``."""
    from ..backend.supervector import model_to_sv as _m2sv
    from ..backend.supervector import train_nap_subspace
    from ..io.lists import read_xlist

    lines = read_xlist(cfg.get_str("ndx"))
    from_gmm = cfg.get_bool("gmm", False)
    vpath = cfg.get_str("vectorFilesPath", "./")
    vext = cfg.get_str("vectorFilesExtension", ".vect")
    vecs, spk_ids = [], []
    for spk, line in enumerate(lines):
        for name in line:
            if from_gmm:
                sv = np.asarray(_m2sv(GmmDiag.load(mixture_path(name, cfg))),
                                np.float64).ravel()
            else:
                sv = read_matrix_file(os.path.join(vpath, name + vext)) \
                    .ravel().astype(np.float64)
            vecs.append(sv)
            spk_ids.append(spk)
    v = jnp.asarray(np.stack(vecs), jnp.float32)
    nap = train_nap_subspace(v, jnp.asarray(spk_ids), len(lines),
                             cfg.get_int("nbEigenVectors", 40))
    write_matrix_file(cfg.get_str("channelMatrix"), np.asarray(nap))
    return np.asarray(nap)


def gmm_tokenizer_main(cfg: Config):
    """GmmTokenizer symbolsExtract mode (GmmTokenizer.cpp:171-208): winning
    component per selected frame, consecutive repeats collapsed (the
    in-tree golden ``test1.sym.ref`` is the collapsed stream; pass
    ``duration true`` to keep repeats, GmmTokenizerMain.cpp:73).
    ``confusionMatrix true`` switches to GaussianConfusionMatrix
    (cpp:128-160): counts of (best, i-th best) over topDistribsCount."""
    world_key = ("inputWorldModelName"
                 if cfg.exists("inputWorldModelName") else "inputWorldFilename")
    gmm = GmmDiag.load(mixture_path(cfg.get_str(world_key), cfg))
    names = resolve_list(cfg, "inputFeatureFilename")
    sym_dir = cfg.get_str("symbolsFilesPath", cfg.get_str("symFilesPath", "./"))
    if cfg.get_bool("confusionMatrix", False):
        import jax as _jax
        from ..gmm.kernels import weighted_logdens
        n_best = cfg.get_int("topDistribsCount", 10)
        k = gmm.n_components
        mce = np.zeros((k, k), np.int64)
        for n in names:
            fs, mask = load_features_and_mask([n], cfg)
            ld = weighted_logdens(jnp.asarray(fs.data[mask > 0]), gmm)
            idx = np.asarray(_jax.lax.top_k(ld, min(n_best, k))[1])
            np.add.at(mce, (np.repeat(idx[:, 0], idx.shape[1]),
                            idx.ravel()), 1)
        out_name = cfg.get_str("matrixOutputName", "mce_matrix.mat")
        with open(out_name, "w", encoding="utf-8") as f:
            f.write(f"{k} {k}\n")
            for row in mce:
                f.write(" ".join(str(int(v)) for v in row) + " \n")
        return mce
    keep_repeats = cfg.get_bool("duration", False)
    out = {}
    for n in names:
        fs, mask = load_features_and_mask([n], cfg)
        syms = gmm_tokenize(jnp.asarray(fs.data), gmm)
        syms = syms[mask > 0]
        if not keep_repeats and syms.size:
            syms = syms[np.concatenate([[True], np.diff(syms) != 0])]
        path = os.path.join(sym_dir, n + ".sym")
        with open(path, "w") as f:
            f.write(" ".join(str(int(s)) for s in syms) + "\n")
        out[n] = syms
    return out


def bngram_main(cfg: Config):
    syms = read_simple_list(cfg.get_str("inputSymFile"))
    order = cfg.get_int("ngramOrder", 2)
    counts = ngram_counts(syms, order)
    with open(cfg.get_str("outputFile"), "w") as f:
        for gram, c in counts.most_common():
            f.write(" ".join(gram) + f" {c}\n")
    return counts


def sequence_decode_main(cfg: Config):
    """Train per-class n-gram models from 'class symfile' lines, decode
    test symbol files (SequenceExtractor + SequenceDecoder)."""
    order = cfg.get_int("ngramOrder", 2)
    train = read_ndx(cfg.get_str("trainList"))
    models = {}
    by_class: dict[str, list] = {}
    for cls, files in train:
        for fp in files:
            by_class.setdefault(cls, []).append(read_simple_list(fp))
    for cls, seqs in by_class.items():
        models[cls] = NGramModel.train(seqs, order)
    results = {}
    for name in read_simple_list(cfg.get_str("testList")):
        syms = read_simple_list(name)
        best, scores = sequence_decode(syms, models)
        results[name] = (best, scores)
        print(f"{name} {best} " + " ".join(
            f"{c}:{s:.4f}" for c, s in scores.items()))
    return results


def label_ngram_main(cfg: Config):
    """Transform a per-frame token stream into a label file via a
    bag-of-ngram codebook (reference LabelNGram, LabelNGramMain.cpp
    schema: inputFilename/NGramFilename/NGramOrder/NGramSelected/
    symbolPath/symbolFileExtension/labelOutputPath/
    saveLabelFileExtension)."""
    from ..io.labels import Segment
    from ..utils import label_ngram, read_ngram_codebook

    order = cfg.get_int("NGramOrder", 3)
    codebook = read_ngram_codebook(cfg.get_str("NGramFilename"), order,
                                   cfg.get_int("NGramSelected", 16))
    name = cfg.get_str("inputFilename")
    sym_path = os.path.join(
        cfg.get_str("symbolPath", "./"),
        name + cfg.get_str("symbolFileExtension", ".sym"))
    syms = read_simple_list(sym_path)
    frame_length = cfg.get_float("frameLength", 0.01)
    segs = None
    if cfg.exists("labelInputPath"):
        lbl = read_label_file(os.path.join(
            cfg.get_str("labelInputPath"),
            name + cfg.get_str("labelFileExtension", ".lbl")))
        segs = [s.frames(frame_length) for s in lbl]
    spans = label_ngram(syms, codebook, order, segments=segs)
    out = [Segment(b * frame_length, e * frame_length, lab)
           for b, e, lab in spans]
    out_path = os.path.join(
        cfg.get_str("labelOutputPath", "./"),
        name + cfg.get_str("saveLabelFileExtension", ".sym.lbl"))
    write_label_file(out_path, out)
    return out


def label_fusion_main(cfg: Config):
    files = read_simple_list(cfg.get_str("labelFileList"))
    seg_lists = [read_label_file(f) for f in files]
    nframes = cfg.get_int("nbFrames")
    out = fuse_label_files(
        seg_lists, nframes,
        frame_length=cfg.get_float("frameLength", 0.01),
        mode=cfg.get_str("fusionMode", "union"),
        label=cfg.get_str("labelOutputFrames", "speech"),
        close_gap=cfg.get_int("closeGap", 0),
        drop_short=cfg.get_int("dropShort", 0))
    write_label_file(cfg.get_str("outputFile"), out)
    return out


def time_cluster_main(cfg: Config):
    segs = read_label_file(cfg.get_str("inputFile"))
    out = time_cluster_filter(
        segs,
        min_duration=cfg.get_float("minDuration", 0.0),
        begin=cfg.get_float("begin") if cfg.exists("begin") else None,
        end=cfg.get_float("end") if cfg.exists("end") else None,
        labels=cfg.get_str("keepLabels").split(",")
        if cfg.exists("keepLabels") else None)
    write_label_file(cfg.get_str("outputFile"), out)
    return out


def svm_train_main(cfg: Config):
    """Train one SVM per target: target supervector(s) vs cohort
    (reference Svm tool, GmmSv configs)."""
    root = cfg.get_str("vectorFilesPath", "./")
    ext = cfg.get_str("vectorFilesExtension", ".vect")

    def load(names):
        return np.stack([read_matrix_file(os.path.join(root, n + ext)).ravel()
                         for n in names]).astype(np.float32)

    cohort = load(read_simple_list(cfg.get_str("backgroundList")))
    out = {}
    for target, files in read_ndx(cfg.get_str("targetIdList")):
        tv = load(files if files else [target])
        x = np.vstack([tv, cohort])
        y = np.r_[np.ones(len(tv)), -np.ones(len(cohort))].astype(np.float32)
        model = svm_train(
            x, y,
            c=cfg.get_float("C") if cfg.exists("C") else None,
            target_penalty=cfg.get_float("targetPenalty")
            if cfg.exists("targetPenalty") else None,
            kind={0: "linear", 1: "poly", 2: "rbf"}.get(
                cfg.get_int("kernelType", 0), "linear"))
        np.savez(os.path.join(root, target + ".svm.npz"),
                 support=model.support, alpha_y=model.alpha_y,
                 bias=model.bias, kind=model.kind, degree=model.degree,
                 gamma=model.gamma, coef0=model.coef0)
        out[target] = model
    return out


def svm_predict_main(cfg: Config):
    from ..io.nist import ScoreLine
    root = cfg.get_str("vectorFilesPath", "./")
    ext = cfg.get_str("vectorFilesExtension", ".vect")
    results = []
    for seg, models in read_ndx(cfg.get_str("ndxFilename")):
        v = read_matrix_file(os.path.join(root, seg + ext)).ravel()
        for m in models:
            z = np.load(os.path.join(root, m + ".svm.npz"))
            model = SvmModel(z["support"], z["alpha_y"], float(z["bias"]),
                             str(z["kind"]), int(z["degree"]),
                             float(z["gamma"]), float(z["coef0"]))
            sc = float(np.asarray(model.decision(
                jnp.asarray(v[None, :], jnp.float32)))[0])
            results.append(ScoreLine(cfg.get_str("gender", "M"), m,
                                     "1" if sc > 0 else "0", seg, sc))
    write_nist_scores(cfg.get_str("outputFilename"), results)
    return results


MODES = {
    "scoring": scoring_main, "fusion": fusion_main,
    "scoreWarp": score_warp_main, "hist": hist_main,
    "modelToSv": model_to_sv_main, "napSv": nap_sv_main,
    "covIntra": cov_intra_main,
    "readFeatFile": read_feat_main, "readModel": read_model_main,
    "extractParams": extract_params_main, "polyExp": poly_exp_main,
    "sequenceExtract": sequence_extract_main,
    "gmmTokenizer": gmm_tokenizer_main, "bNgram": bngram_main,
    "sequenceDecode": sequence_decode_main,
    "labelNgram": label_ngram_main,
    "labelFusion": label_fusion_main, "timeCluster": time_cluster_main,
    "svmTrain": svm_train_main, "svmPredict": svm_predict_main,
}


def main(cfg: Config):
    return MODES[cfg.get_str("utilMode")](cfg)


if __name__ == "__main__":
    main(Config.from_cli(sys.argv[1:]))
