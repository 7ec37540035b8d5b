"""Sustained serving throughput through the TCP wire protocol.

Complements milestone_audio.py (single-stream latency): N concurrent
clients loop {send features → verify} against a SpkDetServer
(SpkDetServer.cpp:845 protocol) for a fixed duration, measuring
sustained verifications/s and per-request latency percentiles at
concurrency 1 / 4 / 8.

The server handles each connection in a thread; device work serialises
through the single chip, so concurrency mainly pipelines host-side
protocol/feature handling against device dispatches — the measured
scaling factor IS the result.

Usage: python scripts/bench_serving.py [--seconds 10] [--out FILE]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

K, D = 128, 24
T_TEST = 300          # 3 s of 10 ms frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from lia_ral_tpu.api import RemoteSpkDetClient, SpkDetServer
    from lia_ral_tpu.config import Config
    from lia_ral_tpu.gmm.em import TrainCfg, mixture_init, train_model
    from lia_ral_tpu.gmm.map_adapt import MapCfg, adapt_model

    rng = np.random.default_rng(7)
    centers = rng.standard_normal((64, D)) * 2.0

    def utt(off, n):
        comp = rng.integers(0, 64, n)
        return (centers[comp] + off
                + rng.standard_normal((n, D)) * 0.7).astype(np.float32)

    bg = jnp.asarray(utt(0.0, 60_000))
    w = jnp.ones(bg.shape[0], jnp.float32)
    init = mixture_init(jax.random.key(0), bg, w, K, 1.0)
    ubm = train_model(jax.random.key(1), bg, w, init,
                      TrainCfg(nb_train_it=3))
    off = rng.standard_normal(D) * 0.8
    spk = adapt_model(jax.random.key(2), jnp.asarray(utt(off, 2000)),
                      jnp.ones(2000, jnp.float32), ubm,
                      MapCfg(method="MAPOccDep", mean_adapt=True,
                             mean_r=14.0, nb_train_it=2))
    import tempfile
    d = tempfile.mkdtemp(prefix="srv_bench_")
    ubm.save(os.path.join(d, "wld.gmm"))
    spk.save(os.path.join(d, "spk.gmm"))

    srv = SpkDetServer(Config(), port=0)
    port = srv.start()
    results = {}
    try:
        test_feats = [utt(off, T_TEST) for _ in range(8)]

        def worker(idx, stop, lat, cnt):
            cli = RemoteSpkDetClient(port=port)
            cli.load_world(os.path.join(d, "wld.gmm"))
            cli.load_speaker("spk", os.path.join(d, "spk.gmm"))
            f = test_feats[idx % len(test_feats)]
            while not stop.is_set():
                t0 = time.perf_counter()
                cli.reset_features()
                cli.send_features(f)
                cli.verify("spk")
                lat.append(time.perf_counter() - t0)
                cnt[0] += 1
            cli.close()

        for conc in (1, 4, 8):
            stop = threading.Event()
            lats: list[list[float]] = [[] for _ in range(conc)]
            cnts = [[0] for _ in range(conc)]
            threads = [threading.Thread(
                target=worker, args=(i, stop, lats[i], cnts[i]))
                for i in range(conc)]
            t0 = time.perf_counter()
            for t in threads:
                t.start()
            time.sleep(args.seconds)
            stop.set()
            for t in threads:
                t.join()
            wall = time.perf_counter() - t0
            all_lat = np.asarray(sum(lats, [])) * 1000.0
            total = sum(c[0] for c in cnts)
            results[f"conc{conc}"] = {
                "verifies_per_s": round(total / wall, 1),
                "p50_ms": round(float(np.percentile(all_lat, 50)), 1),
                "p95_ms": round(float(np.percentile(all_lat, 95)), 1),
            }
            print(json.dumps({f"conc{conc}": results[f"conc{conc}"]}),
                  flush=True)
    finally:
        srv.stop()

    summary = {
        "milestone": "TCP serving throughput (features->verify loop)",
        "platform": str(jax.devices()[0]),
        "shapes": {"K": K, "D": D, "t_test": T_TEST,
                   "seconds_per_level": args.seconds},
        "results": results,
    }
    print(json.dumps(summary), flush=True)
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
