"""Streaming corpus path (VERDICT.md weak #7): featureServerBufferSize
honoured — corpora stream through bounded buffers and train identically
to the in-RAM path (stat merge is associative)."""

import os

import numpy as np
import jax
import jax.numpy as jnp

from lia_ral_tpu.config import Config
from lia_ral_tpu.gmm.em import TrainCfg, train_model, train_model_streaming
from lia_ral_tpu.gmm.model import GmmDiag
from lia_ral_tpu.io.features import write_feature_file
from lia_ral_tpu.io.gmm_io import read_gmm_file, write_gmm_file
from lia_ral_tpu.tools import train_world
from lia_ral_tpu.tools.common import feature_chunk_loader


def _corpus(rng, n=1200, d=6, k=5):
    cent = rng.standard_normal((k, d)) * 2
    x = (cent[rng.integers(0, k, n)]
         + rng.standard_normal((n, d)) * 0.4).astype(np.float32)
    return x


def test_streaming_equals_in_ram(rng):
    x = _corpus(rng)
    w = np.ones(x.shape[0], np.float32)
    init = GmmDiag.create(np.full(5, 0.2), rng.standard_normal((5, 6)),
                          rng.random((5, 6)) + 0.5)
    cfg = TrainCfg(nb_train_it=4, bagged_frame_probability=1.0)
    ref = train_model(jax.random.key(0), jnp.asarray(x), jnp.asarray(w),
                      init, cfg)

    buf = 512   # corpus is 1200 frames → 3 chunks, last zero-padded

    def loader():
        for off in range(0, x.shape[0], buf):
            xc, wc = x[off:off + buf], w[off:off + buf]
            if xc.shape[0] < buf:
                pad = buf - xc.shape[0]
                xc = np.concatenate([xc, np.zeros((pad, x.shape[1]),
                                                  np.float32)])
                wc = np.concatenate([wc, np.zeros(pad, np.float32)])
            yield xc, wc

    got = train_model_streaming(jax.random.key(0), loader, init, cfg)
    np.testing.assert_allclose(np.asarray(got.means), np.asarray(ref.means),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(got.weights),
                               np.asarray(ref.weights), rtol=1e-4, atol=1e-5)


def test_feature_chunk_loader_shapes(tmp_path, rng):
    d = str(tmp_path)
    sizes = [300, 450, 250]    # 1000 frames over 3 files, buffer 400
    for i, n in enumerate(sizes):
        write_feature_file(os.path.join(d, f"u{i}.prm"),
                           rng.standard_normal((n, 4)).astype(np.float32),
                           fmt="SPRO4")
    cfg = Config({
        "featureFilesPath": d + "/", "labelFilesPath": d + "/",
        "loadFeatureFileFormat": "SPRO4", "loadFeatureFileExtension": ".prm",
        "addDefaultLabel": "true", "defaultLabel": "speech",
        "labelSelectedFrames": "speech",
    })
    loader = feature_chunk_loader([f"u{i}" for i in range(3)], cfg, 400)
    chunks = list(loader())
    assert [c[0].shape for c in chunks] == [(400, 4)] * 3
    # total selected weight = total real frames (padding is zero-weight)
    assert sum(float(c[1].sum()) for c in chunks) == sum(sizes)
    # epochs are repeatable (fresh generator per call)
    again = list(loader())
    np.testing.assert_array_equal(chunks[0][0], again[0][0])


def test_train_world_tool_streaming(tmp_path, rng):
    """TrainWorld with a numeric featureServerBufferSize trains from
    bounded buffers and matches the ALL_FEATURES run exactly (bagged
    probability 1)."""
    d = str(tmp_path)
    x = _corpus(rng, n=1000)
    # two files so the buffer spans a file boundary
    write_feature_file(os.path.join(d, "a.prm"), x[:600], fmt="SPRO4")
    write_feature_file(os.path.join(d, "b.prm"), x[600:], fmt="SPRO4")
    with open(os.path.join(d, "corpus.lst"), "w") as f:
        f.write("a\nb\n")
    base = {
        "featureFilesPath": d + "/", "mixtureFilesPath": d + "/",
        "labelFilesPath": d + "/", "lstPath": d + "/",
        "loadFeatureFileFormat": "SPRO4", "loadFeatureFileExtension": ".prm",
        "saveMixtureFileExtension": ".gmm", "loadMixtureFileExtension": ".gmm",
        "addDefaultLabel": "true", "defaultLabel": "speech",
        "labelSelectedFrames": "speech",
        "mixtureDistribCount": 5, "nbTrainIt": 3,
        "baggedFrameProbability": 1.0, "baggedFrameProbabilityInit": 1.0,
        "inputFeatureFilename": "corpus.lst",
    }
    # seed the same init model for both runs (random init draws from the
    # first buffer only in streaming mode, so init must be shared)
    w0, m0, ci0 = (np.full(5, 0.2), np.asarray(rng.standard_normal((5, 6))),
                   np.asarray(rng.random((5, 6)) + 0.5))
    write_gmm_file(os.path.join(d, "init.gmm"), w0, m0, ci0)
    cfg1 = Config(dict(base, outputWorldFilename="wld_ram",
                       inputWorldFilename="init",
                       featureServerBufferSize="ALL_FEATURES"))
    train_world.main(cfg1)
    cfg2 = Config(dict(base, outputWorldFilename="wld_stream",
                       inputWorldFilename="init",
                       featureServerBufferSize="384"))
    train_world.main(cfg2)
    w1, m1, c1 = read_gmm_file(os.path.join(d, "wld_ram.gmm"))
    w2, m2, c2 = read_gmm_file(os.path.join(d, "wld_stream.gmm"))
    np.testing.assert_allclose(m2, m1, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(w2, w1, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(c2, c1, rtol=1e-3, atol=1e-3)
