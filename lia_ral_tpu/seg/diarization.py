"""Diarization processes: turn detection, E-HMM segmentation,
resegmentation, acoustic segmentation.

TPU-native equivalents of the LIA_SpkSeg tools (SURVEY.md §2.3):
* TurnDetection (TurnDetection.cpp:54-101): GLR/BIC over two sliding
  0.5 s windows, peak picking at α·σ;
* Segmentation (Segmentation.cpp:63-484): one-step E-HMM — iteratively
  add speakers (addSpeaker cpp:211), EM-train state models, Viterbi
  decode (cpp:459), stop criteria (cpp:275/332);
* ReSegmentation (ReSegmentation.cpp:55-328): rebuild the HMM from an
  existing segmentation, MAP-adapt speaker models + Viterbi loop;
* AcousticSegmentation (AcousticSegmentation.cpp:55-354): decode with
  pretrained event GMMs + minimum-duration rules.

Orchestration is host-side (matching the reference's loop structure over
small HMMs); all per-frame compute (emissions, EM stats, Viterbi) runs in
the jitted kernels.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..gmm.em import TrainCfg, m_step, mixture_init, train_model
from ..gmm.kernels import em_stats
from ..gmm.map_adapt import MapCfg, adapt_model
from ..gmm.model import GmmDiag
from .clustering import glr_window_distance
from .hmm import DiarHmm, path_to_segments, viterbi_decode


def create_world(key, x: jax.Array, w: jax.Array, max_distrib: int,
                 nb_train_it: int = 3) -> GmmDiag:
    """World model for diarization by binary-split init + EM (reference
    createWorld, Tools.cpp:1243-1271 → mixtureInitBySplit)."""
    from ..gmm.em import mixture_init_by_split
    return mixture_init_by_split(key, x, w, max_distrib,
                                 TrainCfg(nb_train_it=nb_train_it))


def seg_em(key, x: jax.Array, w: jax.Array, init: GmmDiag,
           nb_train_it: int = 5) -> GmmDiag:
    """EM-train a state model on the frames of one segmentation mask
    (reference segEM, Tools.h:153)."""
    return train_model(key, x, w, init, TrainCfg(nb_train_it=nb_train_it))


def seg_adaptation(key, x: jax.Array, hmm: DiarHmm, path: np.ndarray,
                   world: GmmDiag, min_state_frames: int = 1
                   ) -> tuple[DiarHmm, list[int]]:
    """MAP-adapt every HMM state on its currently assigned frames and drop
    states that lost all data (reference segAdaptation, Tools.cpp:1276 →
    NoDataSpeakerVerification, Tools.cpp:862-908).  Returns the updated
    HMM and the kept state indices."""
    keep, models, names = [], [], []
    for si in range(hmm.n_states):
        mask = (path == si).astype(np.float32)
        if mask.sum() < min_state_frames:
            continue            # zero-data speaker: deleted
        key, kk = jax.random.split(key)
        models.append(_train_state_model(kk, x, jnp.asarray(mask), world))
        names.append(hmm.names[si])
        keep.append(si)
    return DiarHmm.from_gmms(models, names), keep


def turn_detection(x: np.ndarray, window: int = 50, alpha: float = 0.6,
                   min_gap: int = 25) -> np.ndarray:
    """Speaker-turn candidates: GLR distance between the two windows
    around each frame, peaks above mean+α·σ, local-maximum pick with a
    minimum gap (reference TurnDetection.cpp:54-101).
    Returns frame indices of detected turns."""
    n = x.shape[0]
    if n < 2 * window + 1:
        return np.zeros(0, np.int64)
    dists = np.zeros(n)
    for t in range(window, n - window):
        dists[t] = glr_window_distance(x[t - window:t], x[t:t + window])
    thr = dists.mean() + alpha * dists.std()
    turns = []
    for t in range(window, n - window):
        lo, hi = max(t - min_gap, 0), min(t + min_gap + 1, n)
        if dists[t] >= thr and dists[t] == dists[lo:hi].max():
            if not turns or t - turns[-1] >= min_gap:
                turns.append(t)
    return np.asarray(turns, np.int64)


def _train_state_model(key, x, w, world: GmmDiag, map_reg: float = 16.0,
                       nb_it: int = 3) -> GmmDiag:
    """Speaker state model by MAP adaptation from the world (the
    reference's segEM/segAdaptation, Tools.h:152-153)."""
    cfg = MapCfg(method="MAPOccDep", mean_adapt=True, weight_adapt=True,
                 mean_r=map_reg, weight_r=map_reg, nb_train_it=nb_it)
    return adapt_model(key, x, w, world, cfg)


def e_hmm_segmentation(
    x: np.ndarray,
    world: GmmDiag,
    max_speakers: int = 5,
    init_seg_frames: int = 300,
    nb_decode_it: int = 3,
    min_duration: int = 50,
    frame_length: float = 0.01,
    seed: int = 0,
    verbose: bool = False,
):
    """E-HMM speaker segmentation (reference Segmentation.cpp:356-484).

    Iteratively: pick the region worst-explained by existing speakers as
    the seed of a new speaker, MAP-train its model, re-decode with the
    grown HMM, until max_speakers or no region left.
    Returns (segments, state path)."""
    xj = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    w_all = jnp.ones((n,), jnp.float32)
    key = jax.random.key(seed)
    key, k0 = jax.random.split(key)
    models = [_train_state_model(k0, xj, w_all, world)]
    names = ["S0"]
    path = np.zeros(n, np.int64)
    from .hmm import emission_llk
    for spk in range(1, max_speakers):
        hmm = DiarHmm.from_gmms(models, names)
        path = viterbi_decode(xj, hmm)
        # per-frame LLK of the assigned state → find the worst window
        em = np.asarray(emission_llk(xj, hmm))
        assigned = em[np.arange(n), path]
        if n <= init_seg_frames:
            break
        window_scores = np.convolve(assigned,
                                    np.ones(init_seg_frames) / init_seg_frames,
                                    mode="valid")
        start = int(np.argmin(window_scores))
        seed_mask = np.zeros(n, np.float32)
        seed_mask[start:start + init_seg_frames] = 1.0
        key, ks = jax.random.split(key)
        new_model = _train_state_model(ks, xj, jnp.asarray(seed_mask), world)
        models.append(new_model)
        names.append(f"S{spk}")
        # iterative decode + re-adapt (reference nbDecodeIt loop)
        for _ in range(nb_decode_it):
            hmm = DiarHmm.from_gmms(models, names)
            path = viterbi_decode(xj, hmm)
            for si in range(len(models)):
                mask = (path == si).astype(np.float32)
                if mask.sum() < 10:
                    continue
                key, ka = jax.random.split(key)
                models[si] = _train_state_model(ka, xj, jnp.asarray(mask),
                                                world)
        if verbose:
            counts = np.bincount(path, minlength=len(models))
            print(f"E-HMM: {len(models)} speakers, frames/state={counts}")
    hmm = DiarHmm.from_gmms(models, names)
    path = viterbi_decode(xj, hmm)
    segs = path_to_segments(path, names, frame_length, min_duration)
    return segs, path


def resegmentation(
    x: np.ndarray,
    segments,
    world: GmmDiag,
    nb_it: int = 3,
    min_duration: int = 50,
    min_state_frames: int = 25,
    frame_length: float = 0.01,
    seed: int = 0,
):
    """Refinement pass (reference ReSegmentation.cpp:245-328): rebuild the
    HMM from an existing segmentation, MAP-adapt state models, Viterbi
    re-decode, drop speakers that lose all their frames."""
    from ..io.labels import segments_to_frame_mask
    xj = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    names = sorted({s.label for s in segments})
    key = jax.random.key(seed)
    models = []
    for nm in names:
        mask = segments_to_frame_mask(
            [s for s in segments if s.label == nm], n, frame_length)
        key, kk = jax.random.split(key)
        models.append(_train_state_model(kk, xj,
                                         jnp.asarray(mask, jnp.float32),
                                         world))
    path = None
    for _ in range(nb_it):
        hmm = DiarHmm.from_gmms(models, names)
        path = viterbi_decode(xj, hmm)
        keep = []
        for si, nm in enumerate(names):
            mask = (path == si).astype(np.float32)
            if mask.sum() >= min_state_frames:
                key, kk = jax.random.split(key)
                models[si] = _train_state_model(kk, xj, jnp.asarray(mask),
                                                world)
                keep.append(si)
        if len(keep) < len(names):   # drop irrelevant speakers
            models = [models[i] for i in keep]
            names = [names[i] for i in keep]
    hmm = DiarHmm.from_gmms(models, names)
    path = viterbi_decode(xj, hmm)
    return path_to_segments(path, names, frame_length, min_duration), path


def acoustic_segmentation(
    x: np.ndarray,
    event_models: list[GmmDiag],
    event_names: list[str],
    min_duration: int = 30,
    frame_length: float = 0.01,
):
    """SAD/acoustic event segmentation with pretrained GMMs (reference
    AcousticSegmentation.cpp:258-354): Viterbi over the event HMM with
    minimum-duration post-rules."""
    hmm = DiarHmm.from_gmms(event_models, event_names)
    path = viterbi_decode(jnp.asarray(x, jnp.float32), hmm)
    return path_to_segments(path, event_names, frame_length, min_duration), path
