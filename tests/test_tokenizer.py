"""Tokenizer semantics tests (tantivy default/raw behavior, SURVEY.md §2.7),
including cross-checks of the DuckDB oracle fragment used by the driver."""

import duckdb
import pandas as pd

from quickwit_spark.functions.tokenizer import (
    DUCKDB_TOKENIZE_LIST,
    MAX_TOKEN_LEN,
    doc_token_counts,
    tokenize_raw_series,
    tokenize_series,
    tokenize_text,
)


def test_default_tokenizer_basics():
    assert tokenize_text("Hello, World!") == ["hello", "world"]
    assert tokenize_text("a-b_c.d") == ["a", "b", "c", "d"]
    assert tokenize_text("") == []
    assert tokenize_text("   ") == []
    assert tokenize_text("ABC123 def") == ["abc123", "def"]


def test_long_token_dropped():
    long_tok = "x" * (MAX_TOKEN_LEN + 1)
    ok_tok = "y" * MAX_TOKEN_LEN
    assert tokenize_text(f"start {long_tok} {ok_tok} end") == ["start", ok_tok, "end"]


def test_positions_dense_after_drop():
    """Positions are indices into the emitted sequence — a dropped long token
    does NOT leave a gap (our frozen definition; see tokenizer.py docstring)."""
    toks = tokenize_text(f"alpha {'z'*50} beta")
    assert toks == ["alpha", "beta"]  # beta is at position 1, adjacent to alpha


def test_series_matches_scalar():
    texts = pd.Series(["Hello, World!", None, "", "a" * 50 + " ok", "Mixed-CASE_tok3ns here"])
    out = tokenize_series(texts)
    for txt, toks in zip(texts, out):
        assert toks == tokenize_text(txt if isinstance(txt, str) else "")


def test_raw_tokenizer():
    vals = pd.Series(["assistant", "", None, "Tool-Name"])
    out = tokenize_raw_series(vals)
    assert list(out) == [["assistant"], [], [], ["Tool-Name"]]


def test_doc_token_counts():
    texts = pd.Series(["one two three", "", "single"])
    assert list(doc_token_counts(texts)) == [3, 0, 1]


def test_duckdb_fragment_matches_python():
    """The DuckDB tokenize fragment (driver oracle SQL) must agree exactly
    with the Python/pandas tokenizer on edge cases."""
    samples = [
        "Hello, World!",
        "a-b_c.d 123ABC",
        "x" * 41 + " keep",
        "ünïcode stays? ascii-only split",
        "trailing space ",
        " leading",
        "",
        "UPPER lower MiXeD",
    ]
    con = duckdb.connect()
    frag = DUCKDB_TOKENIZE_LIST.format(col="t")
    for s in samples:
        (res,) = con.execute(f"SELECT {frag} FROM (SELECT ? AS t)", [s]).fetchone()
        assert list(res) == tokenize_text(s), s
