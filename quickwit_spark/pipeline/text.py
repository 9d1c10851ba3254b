"""Text-analysis operators for large-scale training-data pipelines:
language ID (stopword heuristic), quality scoring, token counting, document
fingerprinting.  All expressed with built-in pyspark.sql.functions (JVM-side,
whole-stage codegen — no Python in the hot path), each with an exact DuckDB
SQL twin for the driver's correctness oracle.

The tokenization used everywhere is the engine's `default` tokenizer
(quickwit_spark.functions.tokenizer): lowercase, split on non-alphanumeric,
drop tokens > 40 chars — expressed here as a Spark higher-order-function
filter over split(), and in SQL as list_filter(regexp_split_to_array(...)).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.tokenizer import DUCKDB_TOKENIZE_LIST

# English stopword set for the language-ID heuristic — deterministic, tiny,
# mirrored verbatim into the SQL twin.
EN_STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "for", "on", "with",
    "is", "are", "was", "be", "this", "that", "it", "as", "at", "by", "from",
)


def tokens_col(col: str = "text") -> Column:
    """token array, JVM-side (matches tokenizer.tokenize_text exactly)."""
    return F.filter(
        F.split(F.lower(F.col(col)), "[^0-9a-z]+"),
        lambda t: (t != F.lit("")) & (F.length(t) <= 40),
    )


def duckdb_tokens(col: str = "text") -> str:
    return DUCKDB_TOKENIZE_LIST.format(col=col)


# -- token counting -----------------------------------------------------------


def with_token_count(df: DataFrame, col: str = "text") -> DataFrame:
    return df.withColumn("n_tokens", F.size(tokens_col(col)).cast("long"))


TOKEN_COUNT_SQL = "CAST(len({toks}) AS BIGINT)"


# -- language ID ----------------------------------------------------------------


def with_lang_id(df: DataFrame, col: str = "text", threshold: float = 0.08) -> DataFrame:
    """Stopword-ratio heuristic: share of tokens in EN_STOPWORDS >= threshold
    → 'en', else 'unk'.  (A real n-gram model plugs in the same shape; the
    heuristic is the deterministic, oracle-checkable core.)"""
    toks = tokens_col(col)
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    ratio = F.when(F.size(toks) > 0, n_stop / F.size(toks)).otherwise(F.lit(0.0))
    return df.withColumn(
        "lang_pred", F.when(ratio >= threshold, F.lit("en")).otherwise(F.lit("unk"))
    ).withColumn("stopword_ratio", F.round(ratio, 6))


def lang_id_sql(toks: str, threshold: float = 0.08) -> tuple[str, str]:
    stop_list = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    ratio = (
        f"CASE WHEN len({toks}) > 0 THEN "
        f"CAST(len(list_filter({toks}, t -> list_contains([{stop_list}], t))) AS DOUBLE)"
        f" / len({toks}) ELSE 0.0 END"
    )
    pred = f"CASE WHEN ({ratio}) >= {threshold} THEN 'en' ELSE 'unk' END"
    return pred, f"round({ratio}, 6)"


# -- quality scoring --------------------------------------------------------------


def with_quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Deterministic quality features + a composite score in [0, 1]:
    length band, alpha ratio, mean token length band, stopword presence.
    All whole-stage-codegen expressions."""
    toks = tokens_col(col)
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(col))
    alpha_chars = F.length(F.regexp_replace(F.col(col), "[^A-Za-z]", ""))
    alpha_ratio = F.when(n_chars > 0, alpha_chars / n_chars).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tokens > 0, (F.length(F.concat_ws("", toks)) / n_tokens)).otherwise(
        F.lit(0.0)
    )
    len_ok = (n_tokens >= 5) & (n_tokens <= 5000)
    tok_ok = (mean_tok_len >= 2.0) & (mean_tok_len <= 12.0)
    score = (
        F.when(len_ok, 0.4).otherwise(0.0)
        + F.when(tok_ok, 0.3).otherwise(0.0)
        + alpha_ratio * 0.3
    )
    return (
        df.withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("alpha_ratio", F.round(alpha_ratio, 6))
        .withColumn("mean_tok_len", F.round(mean_tok_len, 6))
        .withColumn("quality_score", F.round(score, 6))
    )


def quality_score_sql(col: str, toks: str) -> dict[str, str]:
    n_tokens = f"len({toks})"
    n_chars = f"length({col})"
    alpha = f"length(regexp_replace({col}, '[^A-Za-z]', '', 'g'))"
    alpha_ratio = f"CASE WHEN {n_chars} > 0 THEN CAST({alpha} AS DOUBLE)/{n_chars} ELSE 0.0 END"
    mean_tok = (
        f"CASE WHEN {n_tokens} > 0 THEN CAST(length(list_aggregate({toks}, 'string_agg', ''))"
        f" AS DOUBLE)/{n_tokens} ELSE 0.0 END"
    )
    len_ok = f"({n_tokens} >= 5 AND {n_tokens} <= 5000)"
    tok_ok = f"(({mean_tok}) >= 2.0 AND ({mean_tok}) <= 12.0)"
    score = (
        f"(CASE WHEN {len_ok} THEN 0.4 ELSE 0.0 END"
        f" + CASE WHEN {tok_ok} THEN 0.3 ELSE 0.0 END"
        f" + ({alpha_ratio}) * 0.3)"
    )
    return {
        "n_tokens": f"CAST({n_tokens} AS BIGINT)",
        "alpha_ratio": f"round({alpha_ratio}, 6)",
        "mean_tok_len": f"round({mean_tok}, 6)",
        "quality_score": f"round({score}, 6)",
    }


# -- fingerprinting -----------------------------------------------------------------


def with_fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Canonical document fingerprint = md5 of the normalized token stream —
    whitespace/punctuation/case-insensitive exact-dup key."""
    return df.withColumn("fingerprint", F.md5(F.concat_ws(" ", tokens_col(col))))


def fingerprint_sql(toks: str) -> str:
    return f"md5(array_to_string({toks}, ' '))"
