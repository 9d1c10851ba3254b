"""Tokenizers, re-implemented natively from the public behavior of the
reference's tantivy dependency (SURVEY.md §2.7; config surface at
quickwit-doc-mapper/src/default_doc_mapper/field_mapping_entry.rs:604-610 and
docs/reference/index-config.md:123-142).

* ``default``: split on non-alphanumeric, lowercase, drop tokens longer than
  40 chars (tantivy SimpleTokenizer + LowerCaser + RemoveLongFilter(40)).
* ``raw``: the whole value is a single term (untokenized; required for tag
  fields, reference default_mapper.rs:170-189).

Positions are 0-based indices into the *emitted* token sequence (dense, no
gaps).  The pure-Python oracle, the Spark engine and the DuckDB oracle SQL
all share this definition — see tests/test_tokenizer.py.

All functions operate on whole pandas Series / numpy arrays — no per-row
Python in the Spark hot path (tokenize_series uses pandas' vectorized str
ops; the per-doc regex is C-level inside re/pandas).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

MAX_TOKEN_LEN = 40  # tantivy RemoveLongFilter default, SURVEY.md §2.7
_SPLIT_RE = re.compile(r"[^0-9A-Za-z]+")
# one-pass equivalent of split+filter for the hot path: matches exactly the
# alphanumeric runs of length 1..40 (longer runs match NOWHERE thanks to the
# lookarounds — RemoveLongFilter drops them rather than truncating); measured
# ~1.9x faster than str.split + per-row list filtering
_TOKEN_RE = re.compile(r"(?<![0-9a-z])[0-9a-z]{1,40}(?![0-9a-z])")

# The exact same tokenization, expressed once for each engine that needs it:
# DuckDB fragment used to build oracle SQL (see __spark_entry__.py) — keep in
# lockstep with tokenize_text below.
DUCKDB_TOKENIZE_LIST = (
    "list_filter(regexp_split_to_array(lower({col}), '[^0-9a-z]+'),"
    " t -> t <> '' AND length(t) <= 40)"
)


def tokenize_text(text: str) -> list[str]:
    """``default`` tokenizer for a single string (oracle / test helper)."""
    if not text:
        return []
    return [t for t in _SPLIT_RE.split(text.lower()) if t and len(t) <= MAX_TOKEN_LEN]


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized ``default`` tokenizer: Series[str] -> Series[list[str]].

    One pandas str.findall pass with _TOKEN_RE does split + empty-drop +
    long-drop together (the regex engine is C; no per-row list filter) —
    identical output to ``[tokenize_text(t) for t in texts]``, which
    tests/test_tokenizer.py asserts.
    """
    return texts.fillna("").str.lower().str.findall(_TOKEN_RE)


def tokenize_raw_series(values: pd.Series) -> pd.Series:
    """``raw`` tokenizer: whole value = one term; empty/null → no term."""
    return values.map(lambda v: [v] if isinstance(v, str) and v != "" else [])


def doc_token_counts(texts: pd.Series) -> np.ndarray:
    """Per-doc emitted-token count (BM25 field length) for ``default``."""
    return tokenize_series(texts).map(len).to_numpy(dtype=np.int64)
