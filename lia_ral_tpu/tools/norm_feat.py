"""NormFeat: feature normalization CLI.

Equivalent of reference ``LIA_SpkDet/NormFeat`` modes (NormFeat.cpp):
``norm`` (cpp:231 — CMVN: file / segmental / window with global fallback),
``featWarp`` (cpp:661), ``info`` (cpp:520 — write stats).  Normalised
features are written with the save format/extension config keys.

Dispatch shape discipline: the reference streams one file at a time and
compiles nothing (NormFeat.cpp:231); the TPU equivalent obligation is
compile-once.  Files are zero-weight padded to power-of-two-ish frame
buckets and processed as (B, T, D) batches through one jitted executable
per bucket (`frontend/normfeat.py` *_batch kernels), instead of one
XLA compile + one device round trip per file shape.
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..frontend.normfeat import (cmvn_global_batch, cmvn_segmental,
                                 cmvn_window_batch, feature_warping,
                                 feature_warping_batch)
from ..io.features import write_feature_file
from ..utils.shapes import FRAME_BUCKET, bucket_len, next_pow2
from .common import load_features_and_mask, resolve_list, setup_verbose

# Files per device dispatch.  Sized for the axon tunnel, where each
# dispatch pays a ~130 ms round trip regardless of payload (measured
# p50, scripts/profile_normfeat.py): 128 files × 640 frames × 39 dims
# is still only ~12 MB, so fewer/larger dispatches are strictly better
# until HBM pressure, which CMVN never approaches.
FILE_BATCH = 128


def _out_path(name: str, cfg: Config) -> str:
    root = cfg.get_str("featureFilesPath", "./")
    ext = cfg.get_str("saveFeatureFileExtension", ".norm.prm")
    return os.path.join(root, name + ext)


def _batched_norm(entries, kernel, prepad=None):
    """Run ``kernel(x (B,T,D), w (B,T)) -> (B,T,D)`` over length-bucketed
    padded batches of ragged files; returns per-file outputs in input
    order (the bw_stats_bucketed pattern, fa/stats.py)."""
    outs: list = [None] * len(entries)
    by_len: dict[int, list[int]] = {}
    for i, (x, _) in enumerate(entries):
        by_len.setdefault(bucket_len(x.shape[0]), []).append(i)
    for plen, idxs in by_len.items():
        for s0 in range(0, len(idxs), FILE_BATCH):
            grp = idxs[s0:s0 + FILE_BATCH]
            # batch axis padded to the next power of two with zero-weight
            # files: a ragged tail batch must not cost its own XLA compile
            b_pad = next_pow2(len(grp))
            d = entries[grp[0]][0].shape[1]
            if prepad is not None:
                mats = [prepad(entries[i][0], entries[i][1], plen)
                        for i in grp]
                rows = mats[0][0].shape[0]
                xs = np.zeros((b_pad, rows, d), np.float32)
                ws = np.zeros((b_pad, rows), np.float32)
                for j, m in enumerate(mats):
                    xs[j], ws[j] = m
            else:
                xs = np.zeros((b_pad, plen, d), np.float32)
                ws = np.zeros((b_pad, plen), np.float32)
                for j, i in enumerate(grp):
                    x, m = entries[i]
                    xs[j, :x.shape[0]] = x
                    ws[j, :m.shape[0]] = m
            ys = np.asarray(kernel(jnp.asarray(xs), jnp.asarray(ws)))
            for j, i in enumerate(grp):
                outs[i] = ys[j, :entries[i][0].shape[0]]
    return outs


def _warp_prepad(window: int):
    """Host-side reflect-pad (the exact layout feature_warping builds on
    device) + zero-pad to the bucket, so batched and per-file results are
    identical."""
    half = window // 2

    def pad(x: np.ndarray, w: np.ndarray, plen: int):
        n, d = x.shape
        xp = np.zeros((plen + 2 * half, d), np.float32)
        wp = np.zeros((plen + 2 * half,), np.float32)
        xp[:half] = x[:half][::-1]
        wp[:half] = w[:half][::-1]
        xp[half:half + n] = x
        wp[half:half + n] = w
        xp[half + n:half + n + half] = x[-half:][::-1]
        wp[half + n:half + n + half] = w[-half:][::-1]
        return xp, wp

    return pad


def main(cfg: Config) -> dict[str, np.ndarray]:
    verbose = setup_verbose(cfg)
    mode = cfg.get_str("mode", "norm")
    names = resolve_list(cfg, "inputFeatureFilename"
                         if cfg.exists("inputFeatureFilename")
                         else "inputFeatureFileName")
    seg_mode = cfg.get_str("segmentalMode", "file")
    window = int(cfg.get_float("windowDuration", 3.0)
                 / cfg.get_float("frameLength", 0.01))
    cms_only = cfg.get_bool("cmsOnly", False)
    var_only = cfg.get_bool("varOnly", False)
    out: dict[str, np.ndarray] = {}

    # Streamed in chunks of FILE_BATCH files: each chunk is loaded by the
    # parallel native reader, normalised through the bucketed batch
    # kernels, written, and FREED — a full-corpus NormFeat run keeps one
    # chunk's INPUTS resident (the old whole-list load held every file at
    # once), while the jit cache still gives compile-once across chunks.
    # (The returned dict accumulates outputs for API/test callers; the
    # normalised files are on disk either way, so CLI-scale runs can
    # ignore it.)
    for c0 in range(0, len(names), FILE_BATCH):
        _process_chunk(names[c0:c0 + FILE_BATCH], cfg, mode, seg_mode,
                       window, cms_only, var_only, verbose, out)
    return out


def _process_chunk(names, cfg, mode, seg_mode, window, cms_only, var_only,
                   verbose, out):
    from .common import file_frame_mask, load_files_batch
    mats = load_files_batch(names, cfg)
    entries: list[tuple[np.ndarray, np.ndarray]] = []
    for name, x in zip(names, mats):
        if x is None:
            # surface the real error through the strict single-file path
            fs, mask = load_features_and_mask([name], cfg)
            x, mask = np.asarray(fs.data, np.float32), mask
        else:
            mask = file_frame_mask(name, x.shape[0], cfg)
        entries.append((np.asarray(x, np.float32),
                        np.asarray(mask, np.float32)))

    # ---- batched fast paths (the overwhelmingly common modes) ------------
    batched: list[np.ndarray] | None = None
    if mode == "norm" and seg_mode == "file":
        batched = _batched_norm(
            entries, lambda x, w: cmvn_global_batch(
                x, w, cms_only=cms_only, var_only=var_only))
    elif mode == "norm" and seg_mode == "window":
        batched = _batched_norm(
            entries, lambda x, w: cmvn_window_batch(x, w, window))
    elif mode == "featWarp":
        # files shorter than half a window keep the per-file path (their
        # degenerate reflect-pad layout isn't worth a bucket shape)
        wwin = window if window % 2 == 1 else window + 1
        big = [i for i, (x, _) in enumerate(entries)
               if x.shape[0] >= wwin // 2]
        if big:
            sub = _batched_norm(
                [entries[i] for i in big],
                lambda x, w: feature_warping_batch(x, w, wwin),
                prepad=_warp_prepad(wwin))
            batched = [None] * len(entries)
            for j, i in enumerate(big):
                batched[i] = sub[j]

    for idx, name in enumerate(names):
        xn, mask = entries[idx]
        x = jnp.asarray(xn)
        w = jnp.asarray(mask)
        if batched is not None and batched[idx] is not None:
            y = batched[idx]
        elif mode == "norm" and seg_mode == "segment":
            # one segment id per contiguous selected run
            runs = np.cumsum(np.abs(np.diff(np.r_[0, mask > 0])))[..., None]
            ids = np.maximum((runs[:, 0] - 1) // 2, 0).astype(np.int32)
            n_seg = int(ids.max()) + 1 if ids.size else 1
            y = cmvn_segmental(x, jnp.asarray(ids), w, n_seg)
        elif mode == "featWarp":
            y = feature_warping(x, w, window if window % 2 == 1
                                else window + 1)
        elif mode == "featMap":
            # feature mapping onto a channel-independent root model
            # (reference featMap, NormFeat.cpp:583)
            from ..frontend.normfeat import feature_mapping
            from ..gmm.model import GmmDiag
            from .common import mixture_path
            channel = GmmDiag.load(mixture_path(
                cfg.get_str("channelMixture"), cfg))
            root = GmmDiag.load(mixture_path(
                cfg.get_str("inputWorldFilename"), cfg))
            y = feature_mapping(x, channel, root)
        elif mode in ("featFA", "featLFA"):
            # feature-domain channel compensation (reference normFeatFA/
            # normFeatLFA, NormFeat.cpp:793/856)
            from ..fa.lfa import (compensate_features, estimate_channel,
                                  lfa_model)
            from ..fa.stats import BwStats, accumulate_bw_stats
            from ..gmm.model import GmmDiag
            from ..io.matrix import read_matrix_file
            from .common import mixture_path
            world = GmmDiag.load(mixture_path(
                cfg.get_str("inputWorldFilename"), cfg))
            u = read_matrix_file(os.path.join(
                cfg.get_str("matrixFilesPath", "./"),
                cfg.get_str("eigenChannelMatrix")
                + cfg.get_str("loadMatrixFilesExtension", ".matx")))
            k_, d_ = world.means.shape
            model = lfa_model(u.reshape(u.shape[0], k_, d_), world,
                              tau=cfg.get_float("regulationFactor", 16.0))
            n_, f_ = accumulate_bw_stats(x, w, world)
            x_h = estimate_channel(BwStats(n=n_[None], f=f_[None]), model)[0]
            y = compensate_features(x, world, model, x_h)
        elif mode == "featNAP":
            # NAP feature-domain compensation (reference normFeatNAP,
            # NormFeat.cpp:724; featureChannelCompNAP cpp:213-229): remove
            # the occupancy-weighted projection of the UBM supervector on
            # the NAP subspace from every frame —
            # x_d -= Σ_k γ_k(x) · ubm_offset[k,d]  (one (N,K)@(K,D) matmul)
            from ..backend.supervector import model_to_sv, project_on_subspace
            from ..gmm.kernels import llk_and_posteriors
            from ..gmm.model import GmmDiag
            from ..io.matrix import read_matrix_file
            from .common import mixture_path
            world = GmmDiag.load(mixture_path(
                cfg.get_str("inputWorldFilename"), cfg))
            u = jnp.asarray(
                read_matrix_file(cfg.get_str("initChannelMatrix")),
                jnp.float32)
            k_, d_ = world.means.shape
            ubm_offset = project_on_subspace(model_to_sv(world), u) \
                .reshape(k_, d_)                     # getUbmOffset cpp:189-197
            _, occ = llk_and_posteriors(x, world)    # (N,K) posteriors
            y = x - occ @ ubm_offset
        elif mode == "info":
            mean = np.average(xn, axis=0, weights=mask)
            var = np.average((xn - mean) ** 2, axis=0, weights=mask)
            print(f"[{name}] mean={mean} var={var}")
            out[name] = np.stack([mean, var])
            continue
        else:
            raise ValueError(f"unknown NormFeat mode {mode}")
        data = np.asarray(y, np.float32)
        if cfg.get_bool("writeAllFeatures", True):
            keep = data
        else:
            keep = data[mask > 0]
        write_feature_file(_out_path(name, cfg), keep,
                           fmt=cfg.get_str("saveFeatureFileFormat", "SPRO4"))
        out[name] = keep
        if verbose:
            print(f"[{name}] mode={mode}/{seg_mode} → {_out_path(name, cfg)}")


if __name__ == "__main__":
    main(Config.from_cli(sys.argv[1:]))
