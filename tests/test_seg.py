import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lia_ral_tpu.gmm import GmmDiag, TrainCfg, mixture_init, train_model
from lia_ral_tpu.seg import (DiarHmm, acoustic_segmentation, bic_crit,
                             clr_crit, delta_bic_crit, e_hmm_segmentation,
                             gllr_crit, resegmentation, turn_detection,
                             viterbi_decode)
from lia_ral_tpu.seg.hmm import compute_transitions, path_to_segments


def gauss_gmm(mean, var=0.3, d=4):
    return GmmDiag.create(np.ones(1), np.full((1, d), mean),
                          np.full((1, d), 1.0 / var))


def two_speaker_signal(rng, n_turns=6, turn_len=200, d=4, sep=3.0):
    xs, truth = [], []
    for i in range(n_turns):
        spk = i % 2
        mean = sep if spk == 0 else -sep
        xs.append(mean + rng.standard_normal((turn_len, d)) * 0.5)
        truth.extend([spk] * turn_len)
    return np.concatenate(xs).astype(np.float32), np.asarray(truth)


def test_transitions():
    t = compute_transitions(3, gamma=0.8)
    np.testing.assert_allclose(t.sum(1), 1.0)
    assert t[0, 0] == 0.8


def test_viterbi_recovers_states(rng):
    x, truth = two_speaker_signal(rng)
    hmm = DiarHmm.from_gmms([gauss_gmm(3.0), gauss_gmm(-3.0)], ["A", "B"])
    path = viterbi_decode(jnp.asarray(x), hmm)
    assert (path == truth).mean() > 0.98


def test_path_to_segments_min_duration():
    path = np.asarray([0] * 50 + [1] * 3 + [0] * 50 + [1] * 60)
    segs = path_to_segments(path, ["A", "B"], 0.01, min_duration=10)
    # the 3-frame blip is absorbed
    assert [s.label for s in segs] == ["A", "B"]


def test_clustering_criteria_prefer_split_for_distinct(rng):
    d = 4
    x1 = rng.standard_normal((300, d)) + 3
    x2 = rng.standard_normal((300, d)) - 3
    x = jnp.asarray(np.concatenate([x1, x2]), jnp.float32)
    w1 = jnp.asarray(np.r_[np.ones(300), np.zeros(300)], jnp.float32)
    w2 = 1.0 - w1
    def fit(w):
        from lia_ral_tpu.gmm.kernels import em_stats
        from lia_ral_tpu.gmm.em import m_step
        g = GmmDiag.uniform_init(1, d)
        for _ in range(3):
            g = m_step(em_stats(x, w, g))
        return g
    m1, m2, m12 = fit(w1), fit(w2), fit(jnp.ones(600))
    world = m12
    gllr = gllr_crit(x, w1, w2, m1, m2, m12)
    assert gllr < 0          # merging distinct speakers loses likelihood
    clr = clr_crit(x, w1, w2, m1, m2, world)
    assert clr < 0           # cross-likelihood low for distinct speakers
    assert delta_bic_crit(x, w1, w2, m1, m2, m12) == gllr
    # same-speaker case: split halves of one distribution
    y1 = rng.standard_normal((300, d))
    y2 = rng.standard_normal((300, d))
    y = jnp.asarray(np.concatenate([y1, y2]), jnp.float32)
    def fity(w):
        from lia_ral_tpu.gmm.kernels import em_stats
        from lia_ral_tpu.gmm.em import m_step
        g = GmmDiag.uniform_init(1, d)
        for _ in range(3):
            g = m_step(em_stats(y, w, g))
        return g
    n1, n2, n12 = fity(w1), fity(w2), fity(jnp.ones(600))
    gllr_same = gllr_crit(y, w1, w2, n1, n2, n12)
    assert gllr_same > gllr  # merging same-speaker halves costs less
    # BIC penalises the extra model for same-speaker data
    assert bic_crit(y, w1, w2, n1, n2, n12) < bic_crit(x, w1, w2, m1, m2, m12)


def test_turn_detection_finds_boundaries(rng):
    x, truth = two_speaker_signal(rng, n_turns=4, turn_len=150)
    turns = turn_detection(x, window=50, alpha=0.5, min_gap=40)
    true_bounds = [150, 300, 450]
    assert len(turns) >= 2
    for tb in true_bounds:
        assert min(abs(t - tb) for t in turns) <= 20, (turns, tb)


def _world_for(x, rng_key=0, k=8):
    xj = jnp.asarray(x)
    w = jnp.ones(x.shape[0], jnp.float32)
    init = mixture_init(jax.random.key(rng_key), xj, w, k, 1.0)
    return train_model(jax.random.key(rng_key + 1), xj, w, init,
                       TrainCfg(nb_train_it=3))


def _diar_error(path, truth):
    """Best-permutation frame error for 2 speakers."""
    a = (path == path[0]).astype(int)
    b = (truth == truth[0]).astype(int)
    return min(np.mean(a != b), np.mean(a == b))


def test_e_hmm_segmentation_two_speakers(rng):
    x, truth = two_speaker_signal(rng, n_turns=6, turn_len=200)
    world = _world_for(x)
    segs, path = e_hmm_segmentation(x, world, max_speakers=2,
                                    init_seg_frames=150, min_duration=50)
    assert len(set(s.label for s in segs)) == 2
    assert _diar_error(path, truth) < 0.1


def test_resegmentation_improves_noisy_input(rng):
    from lia_ral_tpu.io.labels import Segment
    x, truth = two_speaker_signal(rng, n_turns=6, turn_len=200)
    world = _world_for(x)
    # noisy initial segmentation: boundaries off by 60 frames
    segs0 = []
    for i in range(6):
        a = max(i * 200 - 60, 0) if i % 2 else i * 200
        b = min((i + 1) * 200 + (60 if i % 2 == 0 else 0), 1200)
        segs0.append(Segment(a * 0.01, b * 0.01, f"SPK{i % 2}"))
    segs, path = resegmentation(x, segs0, world, nb_it=3)
    assert _diar_error(path, truth) < 0.08


def test_acoustic_segmentation(rng):
    x, truth = two_speaker_signal(rng, n_turns=4, turn_len=100, sep=4.0)
    segs, path = acoustic_segmentation(
        x, [gauss_gmm(4.0), gauss_gmm(-4.0)], ["speech", "music"],
        min_duration=20)
    assert (path == truth).mean() > 0.95
    assert {s.label for s in segs} == {"speech", "music"}


# ---------------------------------------------------------------------------
# ClusteringCriterion merging/search layer
# (reference ClusteringCriterion.cpp:155-800)
# ---------------------------------------------------------------------------

def _two_cluster_scene(rng, d=4, seg_len=700):
    """Frame array with 4 segments: A A B B (A ~ +3, B ~ -3)."""
    parts, segs = [], []
    for i, mean in enumerate([3.0, 3.0, -3.0, -3.0]):
        parts.append(mean + rng.standard_normal((seg_len, d)) * 0.5)
        segs.append((i * seg_len, (i + 1) * seg_len))
    x = jnp.asarray(np.concatenate(parts), jnp.float32)
    return x, segs


def _world_for_segs(x, key=0, k=4):
    cfg = TrainCfg(nb_train_it=3)
    w = jnp.ones((x.shape[0],), jnp.float32)
    init = mixture_init(jax.random.key(key), x, w, k)
    return train_model(jax.random.key(key + 1), x, w, init, cfg)


def test_segment_mean_llk_matches_direct(rng):
    from lia_ral_tpu.gmm.kernels import frame_llk
    from lia_ral_tpu.seg import segment_mean_llk
    x, segs = _two_cluster_scene(rng, seg_len=100)
    world = _world_for_segs(x)
    got = segment_mean_llk(x, segs, world)
    llk = np.asarray(frame_llk(x, world))
    want = [llk[b:e].mean() for b, e in segs]
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_merge_cluster_sorted():
    from lia_ral_tpu.seg import merge_cluster
    assert merge_cluster([(10, 20)], [(0, 5), (30, 40)]) == [
        (0, 5), (10, 20), (30, 40)]


def test_clustering_criterion_by_adapt_separates(rng):
    from lia_ral_tpu.seg import clustering_criterion_by_adapt
    x, segs = _two_cluster_scene(rng)
    # a broad world so MAP adaptation actually specialises the models
    world = gauss_gmm(0.0, var=10.0)
    key = jax.random.key(7)
    for crit, same_higher in [("CLR", True), ("DELTABIC", True),
                              ("BIC", False)]:
        same = clustering_criterion_by_adapt(key, x, segs[0], segs[1],
                                             world, crit)
        diff = clustering_criterion_by_adapt(key, x, segs[0], segs[2],
                                             world, crit)
        assert (same > diff) == same_higher, crit


def test_is_similar_segment_em_decision(rng):
    from lia_ral_tpu.seg import is_similar_segment
    x, segs = _two_cluster_scene(rng)
    world = _world_for_segs(x)
    key = jax.random.key(3)
    # DELTABIC (=GLLR): same-speaker pair merges, cross-speaker does not.
    # Threshold slightly below 0 absorbs the EM-overfit noise of separate
    # models (the reference exposes this as clusteringCritThresh).
    assert is_similar_segment(key, x, segs[2], segs[3], world, "DELTABIC",
                              threshold=-50.0)
    assert not is_similar_segment(key, x, segs[0], segs[2], world,
                                  "DELTABIC", threshold=-50.0)


def test_best_fitting_segment_and_cluster(rng):
    from lia_ral_tpu.seg import best_fitting_cluster, best_fitting_segment
    x, segs = _two_cluster_scene(rng)
    world = _world_for_segs(x)
    m_a = gauss_gmm(3.0)
    m_b = gauss_gmm(-3.0)
    # cluster contaminated with one B segment: best fitting under A model
    # must be an A segment (length > 600 rule satisfied: seg_len=700)
    cluster = [segs[0], segs[2], segs[1]]
    ind = best_fitting_segment(x, cluster, m_a, world=world)
    assert ind in (0, 2)
    # a short cluster (< 600 frames per segment) yields None
    short = [(0, 100), (100, 200)]
    assert best_fitting_segment(x, short, m_a, world=world) is None
    # cohort normalisation path
    ind2 = best_fitting_segment(x, cluster, m_a, cohort=[m_a, m_b],
                                except_ind=0)
    assert ind2 in (0, 2)
    assert best_fitting_cluster(x, [m_a, m_b], segs[3]) == 1
    assert best_fitting_cluster(x, [m_a, m_b], segs[3], except_ind=1) == 0


def test_intra_inter_cluster_purity(rng):
    from lia_ral_tpu.seg import inter_cluster, intra_cluster
    x, segs = _two_cluster_scene(rng)
    world = _world_for_segs(x)
    m_a, m_b = gauss_gmm(3.0), gauss_gmm(-3.0)
    # cluster 0 is impure: contains one B segment
    clusters = [[segs[0], segs[2]], [segs[3], segs[1]]]
    key = jax.random.key(11)
    intra = intra_cluster(key, x, clusters, [m_a, m_b], world,
                          "DELTABIC", threshold=-50.0)
    assert intra[0] == [True, False]       # B segment flagged impure
    inter = inter_cluster(key, x, clusters, [m_a, m_b], world,
                          "DELTABIC", threshold=-50.0)
    # cluster 0's best segment (an A) matches the A segment inside cluster 1
    assert (1, 1) in inter[0]
    # cluster 1's best segment (a B) matches the B segment inside cluster 0
    assert (0, 1) in inter[1]


def test_cohort_max_likelihood(rng):
    from lia_ral_tpu.seg import cohort_max_likelihood, segment_mean_llk
    x, segs = _two_cluster_scene(rng, seg_len=100)
    m_a, m_b = gauss_gmm(3.0), gauss_gmm(-3.0)
    v = cohort_max_likelihood(x, [m_a, m_b], segs[0], except_ind=0)
    np.testing.assert_allclose(v, segment_mean_llk(x, [segs[0]], m_b)[0],
                               rtol=1e-6)


def test_mixture_init_by_split(rng):
    """Binary-split init (Tools.cpp:1057): reaches the exact component
    count (incl. non-power-of-two via unitary splits) and fits the data at
    least as well as a single Gaussian."""
    from lia_ral_tpu.gmm.em import mixture_init_by_split, TrainCfg
    from lia_ral_tpu.gmm.kernels import frame_llk
    x, _ = two_speaker_signal(rng, n_turns=4, turn_len=300)
    xj = jnp.asarray(x)
    w = jnp.ones(xj.shape[0], jnp.float32)
    g6 = mixture_init_by_split(jax.random.key(0), xj, w, 6,
                               TrainCfg(nb_train_it=2))
    assert g6.n_components == 6
    np.testing.assert_allclose(float(jnp.sum(g6.weights)), 1.0, atol=1e-4)
    g1 = mixture_init_by_split(jax.random.key(0), xj, w, 1)
    llk6 = float(jnp.mean(frame_llk(xj, g6)))
    llk1 = float(jnp.mean(frame_llk(xj, g1)))
    assert llk6 > llk1 + 0.3


def test_create_world_and_seg_adaptation(rng):
    from lia_ral_tpu.seg import create_world, seg_adaptation, seg_em
    x, truth = two_speaker_signal(rng, n_turns=4, turn_len=200)
    xj = jnp.asarray(x)
    w = jnp.ones(xj.shape[0], jnp.float32)
    world = create_world(jax.random.key(0), xj, w, 4, nb_train_it=2)
    assert world.n_components == 4
    hmm = DiarHmm.from_gmms([gauss_gmm(3.0), gauss_gmm(-3.0),
                             gauss_gmm(10.0)], ["A", "B", "ghost"])
    path = viterbi_decode(xj, hmm)
    # the ghost state gets no frames → NoDataSpeakerVerification drops it
    hmm2, keep = seg_adaptation(jax.random.key(1), xj, hmm, path, world)
    assert keep == [0, 1]
    assert hmm2.names == ["A", "B"]
    m = seg_em(jax.random.key(2), xj,
               jnp.asarray((path == 0).astype(np.float32)), world,
               nb_train_it=2)
    assert m.n_components == world.n_components


def test_glr_distance_curve_matches_host_loop(rng):
    """Device prefix-sum GLR curve == the per-frame host loop
    (TurnDetection.cpp:54-78 math), and a 100k-frame curve runs fast."""
    import time
    import jax.numpy as jnp
    from lia_ral_tpu.seg.clustering import glr_window_distance
    from lia_ral_tpu.seg.diarization import glr_distance_curve
    x = rng.standard_normal((400, 6)).astype(np.float32)
    x[200:] += 3.0
    w = 30
    curve = np.asarray(glr_distance_curve(jnp.asarray(x), w))
    for t in [w, 100, 199, 201, 320, 400 - w - 1]:
        ref = glr_window_distance(x[t - w:t], x[t:t + w])
        np.testing.assert_allclose(curve[t], ref, rtol=2e-3, atol=2e-2)
    assert curve[0] == 0.0 and curve[-1] == 0.0
    # scale check: 100k frames in one device call, well under a second
    big = rng.standard_normal((100_000, 13)).astype(np.float32)
    c = glr_distance_curve(jnp.asarray(big), 50)
    c.block_until_ready()
    t0 = time.perf_counter()
    c = glr_distance_curve(jnp.asarray(big), 50)
    float(c[0])
    assert time.perf_counter() - t0 < 1.0


def test_turn_detection_finds_change_point(rng):
    from lia_ral_tpu.seg.diarization import turn_detection
    x = rng.standard_normal((600, 5)).astype(np.float32)
    x[300:] += 4.0
    turns = turn_detection(x, window=40, alpha=0.5, min_gap=20)
    assert len(turns) >= 1
    assert any(abs(int(t) - 300) <= 15 for t in turns), turns
