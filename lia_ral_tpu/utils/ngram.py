"""N-gram counting and sequence decoding over symbol streams.

Equivalents of reference ``LIA_Utils/BNGram`` (n-gram counting toolset),
``LabelNGram`` (n-grams over label streams with codebooks) and
``SequenceExtractor``/``SequenceDecoder`` (decoder tree from n-grams +
symbol-sequence decoding) — the phonotactic language-ID pipeline
(SURVEY.md §2.4).
"""

from __future__ import annotations

import dataclasses
from collections import Counter

import numpy as np


def ngram_counts(symbols, order: int) -> Counter:
    """Counts of all n-grams of the given order in a symbol sequence."""
    symbols = list(symbols)
    return Counter(tuple(symbols[i:i + order])
                   for i in range(len(symbols) - order + 1))


@dataclasses.dataclass
class NGramModel:
    """Backoff-free n-gram model with add-delta smoothing."""

    order: int
    counts: Counter
    context_counts: Counter
    vocab: set
    delta: float = 0.5

    @classmethod
    def train(cls, sequences, order: int, delta: float = 0.5) -> "NGramModel":
        counts: Counter = Counter()
        ctx: Counter = Counter()
        vocab = set()
        for seq in sequences:
            seq = list(seq)
            vocab.update(seq)
            for i in range(len(seq) - order + 1):
                g = tuple(seq[i:i + order])
                counts[g] += 1
                ctx[g[:-1]] += 1
        return cls(order, counts, ctx, vocab, delta)

    def log_prob(self, gram: tuple) -> float:
        v = max(len(self.vocab), 1)
        c = self.counts.get(gram, 0)
        n = self.context_counts.get(gram[:-1], 0)
        return float(np.log((c + self.delta) / (n + self.delta * v)))

    def sequence_log_likelihood(self, symbols) -> float:
        symbols = list(symbols)
        if len(symbols) < self.order:
            return 0.0
        return sum(self.log_prob(tuple(symbols[i:i + self.order]))
                   for i in range(len(symbols) - self.order + 1))


def sequence_decode(symbols, models: dict[str, NGramModel],
                    normalize: bool = True) -> tuple[str, dict[str, float]]:
    """Classify a symbol sequence by max n-gram likelihood (reference
    SequenceDecoder: walk the decoder tree built from per-class n-grams).
    Returns (best class, per-class log-likelihoods)."""
    n = max(len(list(symbols)), 1)
    scores = {}
    for name, m in models.items():
        ll = m.sequence_log_likelihood(symbols)
        scores[name] = ll / n if normalize else ll
    best = max(scores, key=scores.get)
    return best, scores
