"""Utility algorithms backing the LIA_Utils tool set (SURVEY.md §2.4):
score post-processing/fusion/warping, polynomial expansion, acoustic
tokenization, n-gram counting/decoding, label fusion.
"""

from .scores import (
    scoring_decisions, max_score_identification, fuse_scores, score_warp,
    histogram,
)
from .polyexp import poly_expand, poly_expansion_size
from .tokenizer import gmm_tokenize, confusion_matrix
from .ngram import (ngram_counts, NGramModel, sequence_decode,
                    label_ngram, read_ngram_codebook)
from .labels import fuse_label_files, time_cluster_filter

__all__ = [
    "scoring_decisions", "max_score_identification", "fuse_scores",
    "score_warp", "histogram",
    "poly_expand", "poly_expansion_size",
    "gmm_tokenize", "confusion_matrix",
    "ngram_counts", "NGramModel", "sequence_decode",
    "label_ngram", "read_ngram_codebook",
    "fuse_label_files", "time_cluster_filter",
]
