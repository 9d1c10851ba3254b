"""BM25 scoring math (k1=1.2, b=0.75), per the published tantivy formula that
the reference depends on (SURVEY.md §2.7; the reference snapshot itself turns
scoring *off* — quickwit-search/src/collector.rs:276-281 — but the north rule
requires BM25 top-k, validated against our frozen pure-Python oracle).

    idf(t)      = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm(d)  = tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(d) / avg_len))
    score(d, q) = Σ_{t ∈ q matched in d} idf(t) * tf_norm(t, d)

Unlike tantivy's lossy 1-byte fieldnorm quantization, we use exact doc
lengths; the oracle (quickwit_spark.search.oracle) uses the identical
float64 expressions, so golden scores match to <1e-12 relative.
"""

from __future__ import annotations

import math

import numpy as np

K1 = 1.2
B = 0.75


def idf(doc_freq: int, num_docs: int) -> float:
    return math.log(1.0 + (num_docs - doc_freq + 0.5) / (doc_freq + 0.5))


def tf_norm(tfs: np.ndarray, doc_lens: np.ndarray, avg_len: float) -> np.ndarray:
    """Vectorized tf normalization over matched postings."""
    tfs = tfs.astype(np.float64)
    norm = K1 * (1.0 - B + B * doc_lens.astype(np.float64) / avg_len)
    return tfs * (K1 + 1.0) / (tfs + norm)


def score(tfs: np.ndarray, doc_lens: np.ndarray, doc_freq: int, num_docs: int, avg_len: float) -> np.ndarray:
    return idf(doc_freq, num_docs) * tf_norm(tfs, doc_lens, avg_len)


def duckdb_score_sql(tf: str, doc_len: str, df: str, n: str, avg_len: str) -> str:
    """The identical formula as a DuckDB SQL expression (driver oracle)."""
    return (
        f"ln(1.0 + ({n} - {df} + 0.5) / ({df} + 0.5)) * "
        f"({tf} * ({K1} + 1.0) / ({tf} + {K1} * (1.0 - {B} + {B} * {doc_len} / {avg_len})))"
    )
