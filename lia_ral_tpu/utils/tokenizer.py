"""Acoustic tokenization: best-Gaussian symbol per frame.

Equivalent of reference ``LIA_Utils/GmmTokenizer`` (test1.sh: emit the
winning component index per frame as a symbol stream + confusion matrix).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..gmm.kernels import weighted_logdens
from ..gmm.model import GmmDiag


def gmm_tokenize(x: jax.Array, gmm: GmmDiag) -> np.ndarray:
    """Symbol (winning component index) per frame — one argmax over the
    batched log-density matrix."""
    return np.asarray(jnp.argmax(weighted_logdens(x, gmm), axis=-1))


def confusion_matrix(symbols_a: np.ndarray, symbols_b: np.ndarray,
                     n_symbols: int) -> np.ndarray:
    """Co-occurrence counts of two aligned symbol streams (reference
    mce_matrix output)."""
    assert symbols_a.shape == symbols_b.shape
    mat = np.zeros((n_symbols, n_symbols), np.int64)
    np.add.at(mat, (symbols_a, symbols_b), 1)
    return mat
