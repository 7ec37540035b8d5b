"""ctypes bindings for the native liaio feature-I/O library.

The reference's runtime is native C++ (ALIZE FeatureServer); liaio is the
equivalent native hot path here (native/liaio.cpp): SPRO3/SPRO4/RAW
parsing + column masking.  The library is built on demand with the
in-image toolchain (``make -C native``) and cached; every entry point
falls back to the pure-Python reader when the toolchain or build is
unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_FMT_IDS = {"SPRO3": 0, "SPRO4": 1, "RAW": 2, "RAW64": 3}

_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_lib_tried = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _load() -> ctypes.CDLL | None:
    global _lib, _lib_tried
    with _lock:
        if _lib is not None or _lib_tried:
            return _lib
        _lib_tried = True
        so = os.path.join(_native_dir(), "libliaio.so")
        if not os.path.isfile(so):
            try:
                subprocess.run(["make", "-C", _native_dir()], check=True,
                               capture_output=True, timeout=120)
            except (subprocess.SubprocessError, OSError):
                return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:
            return None
        lib.liaio_probe.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int)]
        lib.liaio_probe.restype = ctypes.c_int
        lib.liaio_read.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int]
        lib.liaio_read.restype = ctypes.c_int
        lib.liaio_mask.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float)]
        lib.liaio_mask.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_features_native(path: str, fmt: str, big_endian: bool = False,
                         vect_size: int = 0) -> np.ndarray | None:
    """Native feature read → (frames, dim) float32, or None to fall back."""
    lib = _load()
    if lib is None or fmt.upper() not in _FMT_IDS:
        return None
    fid = _FMT_IDS[fmt.upper()]
    frames = ctypes.c_int64()
    dim = ctypes.c_int()
    rc = lib.liaio_probe(path.encode(), fid, int(big_endian), vect_size,
                         ctypes.byref(frames), ctypes.byref(dim))
    if rc != 0:
        return None
    out = np.empty((frames.value, dim.value), np.float32)
    rc = lib.liaio_read(path.encode(), fid, int(big_endian), vect_size,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                        frames.value, dim.value)
    return out if rc == 0 else None


def apply_mask_native(data: np.ndarray, idx: list[int]) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    data = np.ascontiguousarray(data, np.float32)
    idx_arr = np.asarray(idx, np.int32)
    out = np.empty((data.shape[0], idx_arr.size), np.float32)
    lib.liaio_mask(data.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                   data.shape[0], data.shape[1],
                   idx_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                   idx_arr.size,
                   out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out


def read_features_batch_native(paths: list[str], fmt: str,
                               big_endian: bool = False, vect_size: int = 0,
                               n_threads: int = 0
                               ) -> "list[np.ndarray | None] | None":
    """Parallel native batch read (liaio_read_batch's worker pool over an
    atomic file index — the native data-loader face of the reference's
    per-thread file-list split, AccumulateTVStat.cpp:478-551).

    Returns per-file (frames, dim) float32 views in input order, None
    entries for unreadable/mismatched files, or None overall to fall
    back to the Python path.  All files must share the first readable
    file's dim (the framework's batch contract)."""
    lib = _load()
    if lib is None or fmt.upper() not in _FMT_IDS or not paths:
        return None
    if not hasattr(lib, "liaio_read_batch"):
        return None
    lib.liaio_read_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64, ctypes.c_int, ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int]
    lib.liaio_read_batch.restype = ctypes.c_int
    # the reference's own fixtures mislabel SPRO3/SPRO4 (TrainWorld.cfg
    # declares SPRO4 for SPRO3-headered files) — mirror the per-file
    # reader's header sniffing: if the declared format probes nothing,
    # try the sibling SPRO format for the whole batch
    orders = {"SPRO4": ["SPRO4", "SPRO3"], "SPRO3": ["SPRO3", "SPRO4"]}
    frames = ctypes.c_int64()
    dim_c = ctypes.c_int()
    fid = dim = 0
    for f_try in orders.get(fmt.upper(), [fmt.upper()]):
        fid = _FMT_IDS[f_try]
        for p in paths:
            if lib.liaio_probe(p.encode(), fid, int(big_endian),
                               vect_size, ctypes.byref(frames),
                               ctypes.byref(dim_c)) == 0:
                dim = dim_c.value
                break
        if dim > 0:
            break
    if dim <= 0:
        return None
    sizes = []
    for p in paths:
        try:
            sizes.append(os.path.getsize(p))
        except OSError:
            sizes.append(0)
    t_pad = max(1, max(sizes) // (dim * 4) + 1)
    arena = np.zeros((len(paths), t_pad, dim), np.float32)
    lengths = np.full(len(paths), -1, np.int64)
    c_paths = (ctypes.c_char_p * len(paths))(
        *[p.encode() for p in paths])
    lib.liaio_read_batch(
        c_paths, len(paths), fid, int(big_endian), vect_size,
        arena.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        t_pad, dim, lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        n_threads)
    # .copy(): a view would pin the whole (n, t_pad, dim) arena (sized by
    # the LARGEST file of the batch) for the lifetime of every small
    # file's array — multi-GB retention over a thousands-of-files NDX
    return [arena[i, :int(lengths[i])].copy() if lengths[i] >= 0 else None
            for i in range(len(paths))]
