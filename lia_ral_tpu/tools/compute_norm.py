"""ComputeNorm: score normalization CLI over NIST score files.

Equivalent of reference ``LIA_SpkDet/ComputeNorm`` (ComputeNorm.cpp:
491-765): tnorm | znorm | ztnorm | tznorm, driven by a main score file and
impostor score files, writing a normalised NIST score file.  Supports the
reference's ``meanMode`` (0 mean / 1 median+MAD), ``percentH/percentL``
percentile trimming (cpp:127-135), target-independent impostor selection
via ``impostorIDList`` (cpp:511-514), and configurable score-file field
positions ``fieldGender/fieldName/fieldSeg/fieldLLR`` (cpp:519-523).
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from ..backend.norm import tnorm, tznorm, znorm, ztnorm
from ..config import Config
from ..io.nist import ScoreLine, write_nist_scores
from .common import setup_verbose


def _read_lines(path: str, fields: tuple[int, int, int, int]
                ) -> list[ScoreLine]:
    """Read a score file honouring configurable field positions
    (fieldGender, fieldName, fieldSeg, fieldLLR)."""
    fg, fn, fs, fl = fields
    out: list[ScoreLine] = []
    with open(path, "r", encoding="utf-8", errors="replace") as f:
        for line in f:
            p = line.split()
            if len(p) <= max(fg, fn, fs, fl):
                continue
            out.append(ScoreLine(p[fg], p[fn], "-", p[fs], float(p[fl])))
    return out


def _score_matrix(lines: list[ScoreLine]
                  ) -> tuple[np.ndarray, list[str], list[str]]:
    models = list(dict.fromkeys(l.model for l in lines))
    segs = list(dict.fromkeys(l.seg for l in lines))
    mi = {m: i for i, m in enumerate(models)}
    si = {s: i for i, s in enumerate(segs)}
    mat = np.full((len(models), len(segs)), np.nan)
    for l in lines:
        mat[mi[l.model], si[l.seg]] = l.score
    return mat, models, segs


def main(cfg: Config) -> list[ScoreLine]:
    verbose = setup_verbose(cfg)
    mode = cfg.get_str("normType", "tnorm")   # tnorm|znorm|ztnorm|tznorm
    mean_mode = cfg.get_str("meanMode", "0")
    use_median = mean_mode in ("1", "median")
    percent_h = cfg.get_float("percentH", 0.0)
    percent_l = cfg.get_float("percentL", 0.0)
    fields = (cfg.get_int("fieldGender", 0), cfg.get_int("fieldName", 1),
              cfg.get_int("fieldSeg", 3), cfg.get_int("fieldLLR", 4))
    imp_ids: set[str] | None = None
    if cfg.exists("impostorIDList"):
        with open(cfg.get_str("impostorIDList")) as f:
            imp_ids = {ln.split()[0] for ln in f if ln.strip()}

    main_lines = _read_lines(cfg.get_str("testNistFile"), fields)
    scores, models, segs = _score_matrix(main_lines)
    # missing trials stay NaN: per-entity impostor statistics are computed
    # over the PRESENT scores only (the reference keeps ragged per-entity
    # distributions, DistribNorm ComputeNorm.cpp:96-365 — never a fill)
    s = jnp.asarray(np.nan_to_num(scores, nan=0.0), jnp.float32)

    def load_matrix(key: str, imp_models: bool):
        lines = _read_lines(cfg.get_str(key), fields)
        if imp_ids is not None and imp_models:
            lines = [l for l in lines if l.model in imp_ids]
        mat, ms, ss = _score_matrix(lines)
        return mat, ~np.isnan(mat), ms, ss

    def dev(mat, msk):
        return (jnp.asarray(np.nan_to_num(mat, nan=0.0), jnp.float32),
                jnp.asarray(msk))

    kw = dict(use_median=use_median, percent_h=percent_h,
              percent_l=percent_l)
    if mode == "tnorm":
        # impostor models scored against the SAME test segments
        imp, im, _, imp_segs = load_matrix("tnormNistFile", imp_models=True)
        order = [imp_segs.index(x) for x in segs]
        mat, msk = dev(imp[:, order], im[:, order])
        out = tnorm(s, mat, impostor_mask=msk, **kw)
    elif mode == "znorm":
        imp, im, imp_models, _ = load_matrix("znormNistFile",
                                             imp_models=False)
        order = [imp_models.index(m) for m in models]
        mat, msk = dev(imp[order], im[order])
        out = znorm(s, mat, impostor_mask=msk, **kw)
    elif mode in ("ztnorm", "tznorm"):
        impz, imz, impz_models, _ = load_matrix("znormNistFile",
                                                imp_models=False)
        impt, imt, _, impt_segs = load_matrix("tnormNistFile",
                                              imp_models=True)
        impc, imc, _, _ = load_matrix("ztnormNistFile", imp_models=True)
        zorder = [impz_models.index(m) for m in models]
        torder = [impt_segs.index(x) for x in segs]
        fn = ztnorm if mode == "ztnorm" else tznorm
        zmat, zmsk = dev(impz[zorder], imz[zorder])
        tmat, tmsk = dev(impt[:, torder], imt[:, torder])
        cmat, cmsk = dev(impc, imc)
        out = fn(s, zmat, tmat, cmat, z_mask=zmsk, t_mask=tmsk,
                 cross_mask=cmsk, **kw)
    else:
        raise ValueError(f"unknown normType {mode}")

    out = np.asarray(out)
    by_key = {(l.model, l.seg): l for l in main_lines}
    results = []
    for i, m in enumerate(models):
        for j, x in enumerate(segs):
            if (m, x) in by_key:
                l = by_key[(m, x)]
                results.append(ScoreLine(l.gender, m, l.decision, x,
                                         float(out[i, j]),
                                         begin=l.begin, end=l.end))
    write_nist_scores(cfg.get_str("outputFileBaseName"), results)
    if verbose:
        print(f"{mode}: normalised {len(results)} scores")
    return results


if __name__ == "__main__":
    main(Config.from_cli(sys.argv[1:]))
