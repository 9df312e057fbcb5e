"""Lucene-default BM25 scoring math (k1=1.2, b=0.75).

The reference's query capability is Elasticsearch's default similarity
(``/root/reference/README.md:3``); this is its exact formula:

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tfnorm(t,d) = tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    score(q,d)  = Σ_{t ∈ q} idf(t) * tfnorm(t, d)

Expression shape matters: the engine (numpy), the pure-Python oracle, and
tests all evaluate contributions with the SAME expression tree and sum
per-document contributions in sorted-term order, so scores are
bit-identical across implementations (IEEE-754 double ops).
"""

from __future__ import annotations

import numpy as np


def idf(n_docs: int, df: int) -> float:
    return float(np.log(1.0 + (n_docs - df + 0.5) / (df + 0.5)))


def tf_norm(tf, dl, avgdl: float, k1: float = 1.2, b: float = 0.75):
    """Vectorized tf normalization. tf/dl may be numpy arrays."""
    return tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


def contribution(term_idf: float, tf, dl, avgdl: float, k1: float = 1.2, b: float = 0.75):
    return term_idf * tf_norm(tf, dl, avgdl, k1, b)


def block_upper_bound(
    term_idf: float, max_tf: int, min_dl: int, avgdl: float, k1: float = 1.2, b: float = 0.75
) -> float:
    """Upper bound on any posting's contribution within a skip block: BM25
    is increasing in tf and decreasing in dl, so (max_tf, min_dl) bounds."""
    return float(term_idf * tf_norm(float(max_tf), float(min_dl), avgdl, k1, b))
