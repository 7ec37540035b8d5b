"""ComputeNorm: score normalization CLI over NIST score files.

Equivalent of reference ``LIA_SpkDet/ComputeNorm`` (ComputeNorm.cpp:
491-765): tnorm | znorm | ztnorm | tznorm, driven by a main score file and
impostor score files, writing a normalised NIST score file.
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from ..backend.norm import tnorm, tznorm, znorm, ztnorm
from ..config import Config
from ..io.nist import ScoreLine, read_nist_scores, write_nist_scores
from .common import setup_verbose


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
    use_median = cfg.get_str("meanMode", "mean") == "median"
    main_lines = read_nist_scores(cfg.get_str("testNistFile"))
    scores, models, segs = _score_matrix(main_lines)
    if np.isnan(scores).any():
        scores = np.where(np.isnan(scores), np.nanmin(scores), scores)
    s = jnp.asarray(scores, jnp.float32)

    def load_matrix(key: str):
        lines = read_nist_scores(cfg.get_str(key))
        return _score_matrix(lines)

    if mode == "tnorm":
        # impostor models scored against the SAME test segments
        imp, _, imp_segs = load_matrix("tnormNistFile")
        order = [imp_segs.index(x) for x in segs]
        out = tnorm(s, jnp.asarray(imp[:, order], jnp.float32),
                    use_median=use_median)
    elif mode == "znorm":
        imp, imp_models, _ = load_matrix("znormNistFile")
        order = [imp_models.index(m) for m in models]
        out = znorm(s, jnp.asarray(imp[order], jnp.float32),
                    use_median=use_median)
    elif mode in ("ztnorm", "tznorm"):
        impz, impz_models, _ = load_matrix("znormNistFile")
        impt, _, impt_segs = load_matrix("tnormNistFile")
        impc, _, _ = load_matrix("ztnormNistFile")
        zorder = [impz_models.index(m) for m in models]
        torder = [impt_segs.index(x) for x in segs]
        fn = ztnorm if mode == "ztnorm" else tznorm
        out = fn(s, jnp.asarray(impz[zorder], jnp.float32),
                 jnp.asarray(impt[:, torder], jnp.float32),
                 jnp.asarray(impc, jnp.float32), use_median=use_median)
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
