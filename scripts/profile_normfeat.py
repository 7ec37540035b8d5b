"""Profile NormFeat wall-time variance (round-3 verdict weak #2).

Generates a small corpus, then runs the batched NormFeat call several
times in one process, breaking the wall into load / device / write by
monkey-timing the internal phases.  Prints one JSON line per repeat.

Usage: python scripts/profile_normfeat.py [--files N] [--repeats M]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", type=int, default=100)
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    from lia_ral_tpu.config import Config
    from lia_ral_tpu.io.features import write_feature_file
    from lia_ral_tpu.tools import norm_feat

    d = tempfile.mkdtemp(prefix="nfprof_")
    rng = np.random.default_rng(7)
    names = []
    for i in range(args.files):
        nm = f"f{i}"
        n = 300 if i % 2 else 600
        write_feature_file(os.path.join(d, nm + ".prm"),
                           rng.standard_normal((n, 24)).astype(np.float32),
                           fmt="SPRO4")
        names.append(nm)
    with open(os.path.join(d, "all.lst"), "w") as f:
        f.write("\n".join(names) + "\n")

    base = {
        "featureFilesPath": d + "/", "lstPath": d + "/",
        "labelFilesPath": d + "/",
        "loadFeatureFileFormat": "SPRO4",
        "loadFeatureFileExtension": ".prm",
        "saveFeatureFileFormat": "SPRO4",
        "saveFeatureFileExtension": ".norm.prm",
        "addDefaultLabel": "true", "defaultLabel": "speech",
        "labelSelectedFrames": "speech",
        "inputFeatureFilename": os.path.join(d, "all.lst"),
        "mode": "norm",
    }

    # phase timers around the internals
    from lia_ral_tpu.tools import common as tc
    from lia_ral_tpu.io import features as iof
    t_load = t_write = 0.0

    orig_load = tc.load_files_batch
    orig_write = iof.write_feature_file

    def timed_load(*a, **kw):
        nonlocal t_load
        t0 = time.perf_counter()
        r = orig_load(*a, **kw)
        t_load += time.perf_counter() - t0
        return r

    def timed_write(*a, **kw):
        nonlocal t_write
        t0 = time.perf_counter()
        r = orig_write(*a, **kw)
        t_write += time.perf_counter() - t0
        return r

    tc.load_files_batch = timed_load
    norm_feat.write_feature_file = timed_write

    for rep in range(args.repeats):
        t_load = t_write = 0.0
        t0 = time.perf_counter()
        norm_feat.main(Config(base))
        wall = time.perf_counter() - t0
        print(json.dumps({
            "repeat": rep, "files": args.files,
            "wall_s": round(wall, 3),
            "load_s": round(t_load, 3),
            "write_s": round(t_write, 3),
            "device_other_s": round(wall - t_load - t_write, 3),
            "per_file_ms": round(wall / args.files * 1000, 2),
        }), flush=True)


if __name__ == "__main__":
    main()
