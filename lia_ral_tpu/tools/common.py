"""Shared tool plumbing: feature/label loading per config, device setup.

Replaces the per-tool boilerplate of the reference mains
(FeatureServer construction + initializeClusters + verifyClusterFile,
e.g. TrainWorld.cpp:66-77).
"""

from __future__ import annotations

import os

import numpy as np

from ..config import Config
from ..io.features import FeatureServer, server_from_config
from ..io.labels import SegmentStore
from ..io.lists import read_simple_list


def resolve_list(cfg: Config, key: str) -> list[str]:
    """A config value that is either a list file (one name per line) or a
    direct basename (reference inputFeatureFilename semantics)."""
    val = cfg.get_str(key)
    lst_path = os.path.join(cfg.get_str("lstPath", "./"), val)
    for p in (val, lst_path):
        if os.path.isfile(p) and not p.endswith(
                cfg.get_str("loadFeatureFileExtension", ".prm")):
            try:
                names = read_simple_list(p)
                if names:
                    return names
            except UnicodeDecodeError:
                pass
    return [val]


def label_path(name: str, cfg: Config, save: bool = False) -> str:
    root = cfg.get_str("labelFilesPath", "./")
    key = "saveLabelFileExtension" if save else "loadLabelFileExtension"
    ext = cfg.get_str(key, ".lbl")
    return os.path.join(root, name + ext)


def load_features_and_mask(
    names: list[str], cfg: Config
) -> tuple[FeatureServer, np.ndarray]:
    """FeatureServer over the listed files + the frame selection mask from
    the per-file label files (labelSelectedFrames / addDefaultLabel)."""
    fs = server_from_config(names, cfg)
    frame_length = cfg.get_float("frameLength", 0.01)
    label = cfg.get_str("labelSelectedFrames", "speech")
    add_default = cfg.get_bool("addDefaultLabel", False)
    default_label = cfg.get_str("defaultLabel", label)
    mask = np.zeros(fs.nframes, dtype=np.float32)
    for i, name in enumerate(names):
        a, b = fs.source_range(i)
        lp = label_path(name, cfg)
        store = SegmentStore.from_label_file(
            lp if os.path.isfile(lp) else None,
            b - a, frame_length, add_default, default_label)
        m = store.mask(label, b - a)
        if not m.any() and add_default and label == default_label:
            m[:] = True
        mask[a:b] = m.astype(np.float32)
    return fs, mask


def mixture_path(name: str, cfg: Config, save: bool = False) -> str:
    root = cfg.get_str("mixtureFilesPath", "./")
    key = "saveMixtureFileExtension" if save else "loadMixtureFileExtension"
    ext = cfg.get_str(key, ".gmm")
    return os.path.join(root, name + ext)


def setup_verbose(cfg: Config) -> bool:
    return cfg.get_bool("verbose", False)


def resolve_stats_fn(cfg: Config):
    """Honour the reference's ``numThread`` knob (AccumulateStat.cpp:236):
    the pthread pool maps to data-parallel sharding — shard the frame axis
    over min(numThread, available devices) and psum the stats.  Returns
    None (single-device default kernel) when no parallelism is requested
    or only one device is visible."""
    n_thread = cfg.get_int("numThread", 1)
    if n_thread <= 1:
        if cfg.get_bool("fastMath", False):
            from ..gmm.em import default_stats_fn
            return default_stats_fn(fast_math=True)
        return None
    import jax

    from ..parallel.mesh import make_mesh
    from ..parallel.sharding import sharded_stats_fn

    n = min(n_thread, len(jax.devices()))
    if n <= 1:
        return None
    mesh = make_mesh(n_data=n, devices=jax.devices()[:n])
    return sharded_stats_fn(mesh)
