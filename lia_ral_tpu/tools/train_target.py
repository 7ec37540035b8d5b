"""TrainTarget: MAP/MLLR target model training CLI.

Equivalent of reference ``LIA_SpkDet/TrainTarget`` (TrainTarget.cpp:73-237):
per line of ``targetIdList`` (client id followed by its training files),
MAP-adapt the world model on the client's frames and save the client model.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp

from ..config import Config
from ..gmm.map_adapt import MapCfg, adapt_model
from ..gmm.model import GmmDiag
from .common import load_features_and_mask, mixture_path, setup_verbose
from ..io.lists import read_ndx


def _load_fa_model(cfg: Config, world: GmmDiag):
    """Channel model for the TrainTargetFA variant."""
    import os
    from ..fa.lfa import lfa_model
    from ..io.matrix import read_matrix_file
    u = read_matrix_file(os.path.join(
        cfg.get_str("matrixFilesPath", "./"),
        cfg.get_str("eigenChannelMatrix")
        + cfg.get_str("loadMatrixFilesExtension", ".matx")))
    k, d = world.means.shape
    return lfa_model(u.reshape(u.shape[0], k, d), world,
                     tau=cfg.get_float("regulationFactor", 16.0))


def main(cfg: Config) -> dict[str, GmmDiag]:
    verbose = setup_verbose(cfg)
    ndx_path = cfg.get_str("targetIdList")
    world = GmmDiag.load(mixture_path(cfg.get_str("inputWorldFilename"), cfg))
    mcfg = MapCfg.from_config(cfg)
    seed = cfg.get_int("randomSeed", 0)
    # TrainTargetFA variant (TrainTarget.cpp:279-420): estimate the
    # session channel factor on the client data and remove U·x from the
    # frames before MAP
    fa_model = None
    if cfg.get_bool("channelCompensation", False):
        fa_model = _load_fa_model(cfg, world)
    # optional NAP of the client supervector (TrainTarget.cpp:154-157) and
    # supervector output instead of a model file (outputAdaptParam,
    # cpp:158-169: getSuperVector KL|SVMUBM written as a .vect matrix)
    nap_u = None
    if cfg.get_bool("NAP", False):
        from ..io.matrix import read_matrix_file
        nap_u = jnp.asarray(
            read_matrix_file(cfg.get_str("NAPChannelMatrix",
                                         cfg.get_str("channelMatrix", "U"))),
            jnp.float32)
    output_adapt_param = cfg.get_bool("outputAdaptParam", False)
    out: dict[str, GmmDiag] = {}
    for line_no, (client, files) in enumerate(read_ndx(ndx_path)):
        try:
            # useIdForSelectedFrame (GeneralTools.cpp:866): the client id
            # is the frame-selection label for its own files
            ccfg = cfg
            if cfg.get_bool("useIdForSelectedFrame", False):
                ccfg = cfg.copy()
                ccfg["labelSelectedFrames"] = client
            fs, mask = load_features_and_mask(files, ccfg)
        except FileNotFoundError as e:
            # reference warns and optionally falls back to the world model
            print(f"WARNING: no data for client [{client}]: {e}")
            if cfg.get_bool("useModelData", False):
                out[client] = world
                world.save(mixture_path(client, cfg, save=True),
                           fmt=cfg.get_str("saveMixtureFileFormat", "RAW"),
                           model_id=client)
            continue
        x = jnp.asarray(fs.data)
        w = jnp.asarray(mask)
        if fa_model is not None:
            from ..fa.lfa import compensate_features, estimate_channel
            from ..fa.stats import BwStats, accumulate_bw_stats
            n, f = accumulate_bw_stats(x, w, world)
            x_h = estimate_channel(BwStats(n=n[None], f=f[None]),
                                   fa_model)[0]
            x = compensate_features(x, world, fa_model, x_h)
        key = jax.random.key(seed + line_no)
        client_model = adapt_model(key, x, w, world, mcfg)
        if nap_u is not None:
            from ..backend.supervector import compute_nap
            client_model = compute_nap(client_model, nap_u)
        if output_adapt_param:
            import numpy as np
            from ..backend.supervector import get_supervector
            from ..io.matrix import write_matrix_file
            sv = get_supervector(cfg.get_str("superVector", "KL"),
                                 world, client_model)
            write_matrix_file(
                os.path.join(cfg.get_str("saveVectorFilesPath", "./"),
                             client + cfg.get_str("vectorFilesExtension",
                                                  ".vect")),
                np.asarray(sv, np.float64)[None, :])
        else:
            client_model.save(mixture_path(client, cfg, save=True),
                              fmt=cfg.get_str("saveMixtureFileFormat", "RAW"),
                              model_id=client)
        out[client] = client_model
        if verbose:
            print(f"client [{client}]: {int(mask.sum())} frames "
                  f"→ {mixture_path(client, cfg, save=True)}")
    return out


if __name__ == "__main__":
    main(Config.from_cli(sys.argv[1:]))
