"""TrainWorld: GMM-UBM EM training CLI.

Equivalent of reference ``LIA_SpkDet/TrainWorld`` (trainWorld
TrainWorld.cpp:101-191; schema TrainWorldMain.cpp:61-87).  Same config
keys; reads .prm features + .lbl labels, writes the UBM as a .gmm file.
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp

from ..config import Config
from ..gmm.em import TrainCfg, mixture_init, train_model
from ..gmm.model import GmmDiag
from .common import (load_features_and_mask, mixture_path, resolve_list,
                     resolve_stats_fn, setup_verbose)


def main(cfg: Config) -> GmmDiag:
    verbose = setup_verbose(cfg)
    names = resolve_list(cfg, "inputFeatureFilename")
    fs, mask = load_features_and_mask(names, cfg)
    x = jnp.asarray(fs.data)
    w = jnp.asarray(mask)
    k = cfg.get_int("mixtureDistribCount")
    tcfg = TrainCfg.from_config(cfg)
    seed = cfg.get_int("randomSeed", 0)
    key = jax.random.key(seed)
    if cfg.exists("inputWorldFilename"):
        init = GmmDiag.load(
            mixture_path(cfg.get_str("inputWorldFilename"), cfg),
            cfg.get_str("loadMixtureFileFormat", None)
            if cfg.exists("loadMixtureFileFormat") else None)
        if verbose:
            print(f"init from model [{cfg.get_str('inputWorldFilename')}]")
    else:
        key, sub = jax.random.split(key)
        init = mixture_init(sub, x, w, k,
                            tcfg.bagged_frame_probability_init or 0.1,
                            tcfg.bagged_minimal_length,
                            tcfg.bagged_maximal_length)
        if verbose:
            print(f"init from scratch: {k} components, "
                  f"{fs.nframes} frames ({int(mask.sum())} selected)")
    world = train_model(key, x, w, init, tcfg,
                        stats_fn=resolve_stats_fn(cfg), verbose=verbose)
    out = cfg.get_str("outputWorldFilename")
    world.save(mixture_path(out, cfg, save=True),
               fmt=cfg.get_str("saveMixtureFileFormat", "RAW"),
               model_id=out)
    if verbose:
        print(f"saved world model [{out}]")
    return world


if __name__ == "__main__":
    main(Config.from_cli(sys.argv[1:]))
