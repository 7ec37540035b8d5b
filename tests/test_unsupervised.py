import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lia_ral_tpu.backend.unsupervised import (UnsupervisedAdapter, windowed_llr,
                                              wmap, wmap_gmm)
from lia_ral_tpu.gmm import (GmmDiag, MapCfg, TrainCfg, mixture_init,
                             train_model)
from lia_ral_tpu.gmm.em import reduce_model, train_model_streams
from lia_ral_tpu.gmm.map_adapt import compute_mllr
from lia_ral_tpu.gmm.kernels import em_stats
from lia_ral_tpu.gmm.em import m_step


def test_wmap_posterior_behaviour():
    scores = np.asarray([-3.0, 0.0, 3.0])
    p = wmap(scores, tar_mean=2.0, tar_std=1.0, imp_mean=-2.0, imp_std=1.0,
             prior_tar=0.5)
    assert p[0] < 0.1 and p[2] > 0.9
    assert 0.3 < p[1] < 0.7
    # GMM-based variant agrees for single-component models
    tar = GmmDiag.create(np.ones(1), np.asarray([[2.0]]), np.ones((1, 1)))
    imp = GmmDiag.create(np.ones(1), np.asarray([[-2.0]]), np.ones((1, 1)))
    pg = wmap_gmm(scores, tar, imp, prior_tar=0.5)
    np.testing.assert_allclose(pg, p, atol=1e-4)


def test_windowed_llr():
    llr = np.r_[np.zeros(50), np.ones(50)]
    starts, means = windowed_llr(llr, window=20, step=10)
    assert means[0] == 0.0 and means[-1] == 1.0
    assert starts[0] == 0 and starts[-1] == 80
    # too-short input
    s, m = windowed_llr(np.ones(5), 10, 5)
    assert s.size == 0


def test_unsupervised_adapter_improves(rng):
    d, k = 4, 8
    centers = rng.standard_normal((k, d)) * 2
    spk = rng.standard_normal(d)

    def utt(shift, n=800):
        comp = rng.integers(0, k, n)
        return jnp.asarray(centers[comp] + shift
                           + rng.standard_normal((n, d)) * 0.5, jnp.float32)

    bg = utt(0.0, 6000)
    w = jnp.ones(bg.shape[0], jnp.float32)
    init = mixture_init(jax.random.key(0), bg, w, k, 1.0)
    world = train_model(jax.random.key(1), bg, w, init, TrainCfg(nb_train_it=3))
    ad = UnsupervisedAdapter(world=world,
                             map_cfg=MapCfg(method="MAPOccDep",
                                            mean_adapt=True, mean_r=14.0))
    enroll = utt(spk, 300)    # short enrollment
    ad.enroll(enroll, jnp.ones(300))
    test = utt(spk, 500)
    s_before = ad.score(test, jnp.ones(500))
    # feed several matched trials with high WMAP weight
    for _ in range(3):
        ad.process_trial(utt(spk, 500), jnp.ones(500), 0.9)
    s_after = ad.score(test, jnp.ones(500))
    assert s_after > s_before


def test_mllr_shifts_means_toward_data(rng):
    d, k = 3, 4
    world = GmmDiag.create(np.ones(k) / k, rng.standard_normal((k, d)),
                           np.ones((k, d)))
    x = jnp.asarray(np.asarray(world.means)[rng.integers(0, k, 2000)] + 1.5
                    + rng.standard_normal((2000, d)) * 0.3, jnp.float32)
    st = em_stats(x, jnp.ones(2000), world)
    em_model = m_step(st)
    adapted, w_mat = compute_mllr(world, em_model, st.count)
    assert w_mat.shape == (d, d + 1)
    # adapted means closer to the shifted data than the world's
    d_world = np.abs(np.asarray(world.means) + 1.5
                     - np.asarray(em_model.means)).mean()
    d_mllr = np.abs(np.asarray(adapted.means)
                    - np.asarray(em_model.means)).mean()
    assert d_mllr < np.abs(np.asarray(world.means)
                           - np.asarray(em_model.means)).mean()
    del d_world


def test_reduce_model():
    g = GmmDiag.create(np.asarray([0.5, 0.3, 0.15, 0.05]),
                       np.arange(8).reshape(4, 2).astype(float),
                       np.ones((4, 2)))
    r = reduce_model(g, 2)
    assert r.n_components == 2
    np.testing.assert_allclose(float(jnp.sum(r.weights)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(r.weights),
                               [0.625, 0.375], rtol=1e-5)


def test_train_model_streams(rng):
    d, k = 3, 4
    x1 = jnp.asarray(rng.standard_normal((1000, d)) + 2, jnp.float32)
    x2 = jnp.asarray(rng.standard_normal((1000, d)) - 2, jnp.float32)
    w = jnp.ones(1000, jnp.float32)
    init = mixture_init(jax.random.key(0),
                        jnp.concatenate([x1, x2]),
                        jnp.ones(2000, jnp.float32), k, 1.0)
    cfg = TrainCfg(nb_train_it=3)
    # heavily weight stream 1 → model mass concentrates near +2
    gmm = train_model_streams(jax.random.key(1), [(x1, w), (x2, w)],
                              [10.0, 0.1], init, cfg)
    mean_of_means = float(jnp.sum(gmm.weights[:, None] * gmm.means) / d)
    assert mean_of_means > 0.5, mean_of_means


def test_window_llr_compute_test_mode(tmp_path, rng):
    from lia_ral_tpu.config import Config
    from lia_ral_tpu.io.features import write_feature_file
    from lia_ral_tpu.io.lists import write_xlist
    from lia_ral_tpu.tools import compute_test, train_target, train_world
    d = str(tmp_path)
    dim, k = 4, 8
    centers = rng.standard_normal((k, dim)) * 2

    def utt(shift, n):
        comp = rng.integers(0, k, n)
        return (centers[comp] + shift
                + rng.standard_normal((n, dim)) * 0.5).astype(np.float32)

    write_feature_file(os.path.join(d, "bg.prm"), utt(0, 3000), fmt="SPRO4")
    write_feature_file(os.path.join(d, "spk1.prm"), utt(1.0, 800),
                       fmt="SPRO4")
    # test file: half spk1, half impostor
    write_feature_file(os.path.join(d, "test1.prm"),
                       np.concatenate([utt(1.0, 300), utt(-1.0, 300)]),
                       fmt="SPRO4")
    base = {
        "featureFilesPath": d + "/", "mixtureFilesPath": d + "/",
        "labelFilesPath": d + "/", "lstPath": d + "/",
        "loadFeatureFileFormat": "SPRO4", "loadFeatureFileExtension": ".prm",
        "saveMixtureFileFormat": "RAW", "saveMixtureFileExtension": ".gmm",
        "loadMixtureFileExtension": ".gmm",
        "addDefaultLabel": "true", "defaultLabel": "speech",
        "labelSelectedFrames": "speech", "mixtureDistribCount": k,
        "initVarianceFlooring": 1.0, "initVarianceCeiling": 10.0,
        "finalVarianceFlooring": 0.5, "finalVarianceCeiling": 5.0,
        "nbTrainIt": 3, "baggedFrameProbability": 1.0,
        "baggedFrameProbabilityInit": 1.0,
    }
    cfg = Config(base)
    cfg["inputFeatureFilename"] = "bg"
    cfg["outputWorldFilename"] = "wld"
    train_world.main(cfg)
    write_xlist(os.path.join(d, "t.ndx"), [["spk1", "spk1"]])
    tcfg = Config(base)
    tcfg["targetIdList"] = os.path.join(d, "t.ndx")
    tcfg["inputWorldFilename"] = "wld"
    tcfg["MAPAlgo"] = "MAPOccDep"
    tcfg["meanAdapt"] = "true"
    tcfg["MAPRegFactorMean"] = 14.0
    train_target.main(tcfg)
    write_xlist(os.path.join(d, "trials.ndx"), [["test1", "spk1"]])
    scfg = Config(base)
    scfg["ndxFilename"] = os.path.join(d, "trials.ndx")
    scfg["inputWorldFilename"] = "wld"
    scfg["outputFilename"] = os.path.join(d, "win.nist")
    scfg["windowLLR"] = "true"
    scfg["windowLLRSize"] = 100
    scfg["windowLLRDec"] = 100
    res = compute_test.main(scfg)
    assert len(res) == 6     # 600 frames / 100
    # first windows (target half) score higher than last windows
    assert np.mean([r.score for r in res[:3]]) > \
        np.mean([r.score for r in res[3:]])
