"""ComputeTest: GMM-UBM LLR trial scoring CLI.

Equivalent of reference ``LIA_SpkDet/ComputeTest`` plain mode
(ComputeTest.cpp:90-224): per NDX line (test file × targets), top-K LLR
scoring with worldDecime decimation, NIST-format output.  Segmental mode
emits one LLR per segment.
"""

from __future__ import annotations

import sys

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..gmm.model import GmmDiag
from ..gmm.scoring import compute_test_llr, decime_groups, stack_gmms, top_k_llk
from ..io.labels import frame_mask_to_segments
from ..io.lists import read_ndx
from ..io.nist import ScoreLine, write_nist_scores
from .common import load_features_and_mask, mixture_path, setup_verbose


def main(cfg: Config) -> list[ScoreLine]:
    verbose = setup_verbose(cfg)
    ndx = read_ndx(cfg.get_str("ndxFilename"))
    world = GmmDiag.load(mixture_path(cfg.get_str("inputWorldFilename"), cfg))
    gender = cfg.get_str("gender", "M")
    top_k = cfg.get_int("topDistribsCount", 10)
    world_decime = cfg.get_int("worldDecime", 1)
    threshold = cfg.get_float("decisionThreshold", 0.0)
    segmental = cfg.get_bool("segmentLLR", False)
    frame_length = cfg.get_float("frameLength", 0.01)
    results: list[ScoreLine] = []
    model_cache: dict[str, GmmDiag] = {}
    for test_name, model_names in ndx:
        fs, mask = load_features_and_mask([test_name], cfg)
        if mask.sum() == 0:
            print(f"ATTENTION, TEST FILE [{test_name}] is empty")
            continue
        clients = []
        for mn in model_names:
            if mn not in model_cache:
                model_cache[mn] = GmmDiag.load(mixture_path(mn, cfg))
            clients.append(model_cache[mn])
        stacked = stack_gmms(clients)
        segs = frame_mask_to_segments(mask > 0, frame_length)
        sel = np.nonzero(mask > 0)[0]
        x = jnp.asarray(fs.data[sel])
        w = jnp.ones(sel.shape[0], jnp.float32)
        seg_lengths = [s.frames(frame_length)[1] - s.frames(frame_length)[0]
                       for s in segs]
        groups = jnp.asarray(decime_groups(seg_lengths, world_decime))
        if segmental:
            world_llk, client_llk = top_k_llk(x, world, stacked, groups,
                                              top_k=top_k)
            off = 0
            for s, L in zip(segs, seg_lengths):
                wl = float(jnp.mean(world_llk[off:off + L]))
                for i, mn in enumerate(model_names):
                    cl = float(jnp.mean(client_llk[i, off:off + L]))
                    llr = cl - wl
                    results.append(ScoreLine(
                        gender, mn, "1" if llr > threshold else "0",
                        test_name, llr, begin=s.begin, end=s.end))
                off += L
        else:
            llr = np.asarray(compute_test_llr(x, w, world, stacked,
                                              groups=groups, top_k=top_k))
            for i, mn in enumerate(model_names):
                results.append(ScoreLine(
                    gender, mn, "1" if llr[i] > threshold else "0",
                    test_name, float(llr[i])))
        if verbose:
            print(f"test seg[{test_name}] scored vs {model_names}")
    write_nist_scores(cfg.get_str("outputFilename"), results)
    return results


if __name__ == "__main__":
    main(Config.from_cli(sys.argv[1:]))
