"""NormFeat: feature normalization CLI.

Equivalent of reference ``LIA_SpkDet/NormFeat`` modes (NormFeat.cpp):
``norm`` (cpp:231 — CMVN: file / segmental / window with global fallback),
``featWarp`` (cpp:661), ``info`` (cpp:520 — write stats).  Normalised
features are written with the save format/extension config keys.
"""

from __future__ import annotations

import os
import sys

import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..frontend.normfeat import (cmvn_global, cmvn_segmental, cmvn_window,
                                 feature_warping)
from ..io.features import write_feature_file
from .common import load_features_and_mask, resolve_list, setup_verbose


def _out_path(name: str, cfg: Config) -> str:
    root = cfg.get_str("featureFilesPath", "./")
    ext = cfg.get_str("saveFeatureFileExtension", ".norm.prm")
    return os.path.join(root, name + ext)


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
    for name in names:
        fs, mask = load_features_and_mask([name], cfg)
        x = jnp.asarray(fs.data)
        w = jnp.asarray(mask)
        if mode == "norm":
            if seg_mode == "window":
                y = cmvn_window(x, w, window)
            elif seg_mode == "segment":
                # one segment id per contiguous selected run
                runs = np.cumsum(np.abs(np.diff(np.r_[0, mask > 0])))[..., None]
                ids = np.maximum((runs[:, 0] - 1) // 2, 0).astype(np.int32)
                n_seg = int(ids.max()) + 1 if ids.size else 1
                y = cmvn_segmental(x, jnp.asarray(ids), w, n_seg)
            else:
                y = cmvn_global(x, w, cms_only=cms_only, var_only=var_only)
        elif mode == "featWarp":
            y = feature_warping(x, w, window if window % 2 == 1 else window + 1)
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
            import numpy as _np
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
            mean = np.average(fs.data, axis=0, weights=mask)
            var = np.average((fs.data - mean) ** 2, axis=0, weights=mask)
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
    return out


if __name__ == "__main__":
    main(Config.from_cli(sys.argv[1:]))
