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


# -- BPE-ish token counting ---------------------------------------------------

# GPT-2-style pre-tokenizer pattern, restricted to constructs that Java regex
# (Spark) and RE2 (DuckDB) evaluate identically on ASCII: contraction
# suffixes, optionally space-prefixed letter runs, <=3-digit number chunks
# (modern BPEs chunk digits), and punctuation runs.  No lookaround, no
# unicode property classes (Java and RE2 disagree on those).  Both engines
# use leftmost-first alternation, so match counts agree exactly.
BPE_PATTERN = r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]{1,3}| ?[^A-Za-z0-9\s]+"


def with_bpe_token_count(df: DataFrame, col: str = "text") -> DataFrame:
    """Two token-count columns: whitespace-delimited tokens and BPE-ish
    regex pre-tokens (a deterministic proxy for a real BPE vocab's token
    count — the pre-tokenizer dominates the count; merges only shrink it)."""
    ws = F.filter(F.split(F.col(col), r"\s+"), lambda t: t != F.lit(""))
    return df.withColumn("n_ws_tokens", F.size(ws).cast("long")).withColumn(
        "n_bpe_tokens", F.regexp_count(F.col(col), F.lit(BPE_PATTERN)).cast("long")
    )


def bpe_token_count_sql(col: str = "text") -> dict[str, str]:
    pat = BPE_PATTERN.replace("'", "''")
    return {
        "n_ws_tokens": (
            f"CAST(len(list_filter(regexp_split_to_array({col}, '\\s+'), "
            f"t -> t != '')) AS BIGINT)"
        ),
        "n_bpe_tokens": f"CAST(len(regexp_extract_all({col}, '{pat}')) AS BIGINT)",
    }


# -- language ID ----------------------------------------------------------------


def with_lang_id(df: DataFrame, col: str = "text", threshold_pct: int = 8) -> DataFrame:
    """Stopword-ratio heuristic: share of tokens in EN_STOPWORDS >=
    threshold_pct% → 'en', else 'unk'.  (A real n-gram model plugs in the
    same shape; the heuristic is the deterministic, oracle-checkable core.)

    Outputs are exact-integer (`stopword_ppm` = floor(1e6·n_stop/n_tokens),
    threshold compared as 100·n_stop >= pct·n_tokens) so that the engine and
    the DuckDB oracle can never disagree on a float-rounding boundary."""
    # tokens and the stopword count go through multi-referenced aliases so
    # each is computed once per row (CodegenFallback higher-order exprs get
    # no codegen-level CSE; see with_repetition_signals)
    toks = F.col("__l_toks")
    n_stop = F.col("__l_nstop")
    n_tok = F.size(toks)
    ppm = F.when(n_tok > 0, F.floor(F.lit(1_000_000) * n_stop / n_tok)).otherwise(F.lit(0))
    is_en = n_stop * 100 >= n_tok * threshold_pct
    return (
        df.withColumn("__l_toks", tokens_col(col))
        .withColumn("__l_nstop", _stopword_count_expr(toks))
        .withColumn(
            "lang_pred", F.when((n_tok > 0) & is_en, F.lit("en")).otherwise(F.lit("unk"))
        )
        .withColumn("stopword_ppm", ppm.cast("long"))
        .drop("__l_toks", "__l_nstop")
    )


def lang_id_sql(toks: str, threshold_pct: int = 8) -> tuple[str, str]:
    stop_list = ", ".join(f"'{s}'" for s in EN_STOPWORDS)
    n_stop = f"len(list_filter({toks}, t -> list_contains([{stop_list}], t)))"
    n_tok = f"len({toks})"
    ppm = f"CASE WHEN {n_tok} > 0 THEN CAST(floor(1000000.0 * {n_stop} / {n_tok}) AS BIGINT) ELSE 0 END"
    pred = (
        f"CASE WHEN {n_tok} > 0 AND {n_stop} * 100 >= {n_tok} * {threshold_pct} "
        f"THEN 'en' ELSE 'unk' END"
    )
    return pred, ppm


# -- shared signal expression builders ---------------------------------------
# One definition per formula, parameterized over a token Column, so the
# withColumn surfaces (with_quality_score / with_repetition_signals /
# with_lang_id) and the lambda-bound filter_corpus predicate can never
# drift apart (or away from their DuckDB twins).


def _stopword_count_expr(toks: Column) -> Column:
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    return F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))


def _quality_ppm_expr(toks: Column, col: str) -> Column:
    """score_ppm = 400000·[5<=n_tokens<=5000] + 300000·[2<=mean_tok_len<=12]
    + floor(300000·alpha/chars) — see with_quality_score."""
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(col))
    alpha_chars = F.length(F.regexp_replace(F.col(col), "[^A-Za-z]", ""))
    sum_tok_len = F.length(F.concat_ws("", toks))
    len_ok = (n_tokens >= 5) & (n_tokens <= 5000)
    tok_ok = (
        (sum_tok_len >= 2 * n_tokens)
        & (sum_tok_len <= 12 * n_tokens)
        & (n_tokens > 0)
    )
    return (
        F.when(len_ok, 400_000).otherwise(0)
        + F.when(tok_ok, 300_000).otherwise(0)
        + F.when(
            n_chars > 0, F.floor(F.lit(300_000) * alpha_chars / n_chars)
        ).otherwise(F.lit(0))
    )


def _dup_ppm_expr(grams: Column) -> Column:
    """ppm of n-grams that repeat an earlier identical n-gram."""
    total = F.size(grams)
    dups = total - F.size(F.array_distinct(grams))
    return (
        F.when(total > 0, F.floor(F.lit(1_000_000) * dups / total))
        .otherwise(F.lit(0))
        .cast("long")
    )


def _top_run_count_expr(toks: Column) -> Column:
    """Max token frequency == longest run of equal values in the sorted
    token array, O(n log n) per doc (a distinct×filter scan is
    O(tokens·distinct) and dominates on long documents).  The initial
    prev='' can never match a real token (the tokenizer emits no empty
    tokens)."""
    return F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc.prev, acc.run + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc.best,
                F.when(t == acc.prev, acc.run + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc.best,
    )


# -- quality scoring --------------------------------------------------------------


def with_quality_score(df: DataFrame, col: str = "text") -> DataFrame:
    """Deterministic quality features + a composite score, scaled to ppm
    (parts-per-million) BIGINTs computed with exact integer arithmetic:
    floor(1e6·a/c) is bit-deterministic because the exact rational is either
    an integer (IEEE division of small ints is exact) or at least 1/c away
    from one — so no engine can land on the other side of the floor.
    Bands are compared as cross-multiplied integers (no float thresholds).

    score_ppm = 400000·[5 <= n_tokens <= 5000]
              + 300000·[2 <= mean_token_len <= 12]
              + floor(300000·alpha_chars/n_chars)
    """
    # the token array is materialized through a multi-referenced alias
    # (dropped before return) so the regexp tokenizer runs ONCE per row —
    # higher-order array exprs are CodegenFallback, so inlined copies are
    # each evaluated (see with_repetition_signals)
    toks = F.col("__q_toks")
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(col))
    alpha_chars = F.length(F.regexp_replace(F.col(col), "[^A-Za-z]", ""))
    sum_tok_len = F.length(F.concat_ws("", toks))
    alpha_ppm = F.when(n_chars > 0, F.floor(F.lit(1_000_000) * alpha_chars / n_chars)).otherwise(F.lit(0))
    mean_tok_ppm = F.when(n_tokens > 0, F.floor(F.lit(1_000_000) * sum_tok_len / n_tokens)).otherwise(F.lit(0))
    score_ppm = _quality_ppm_expr(toks, col)
    return (
        df.withColumn("__q_toks", tokens_col(col))
        .withColumn("n_tokens", n_tokens.cast("long"))
        .withColumn("alpha_ppm", alpha_ppm.cast("long"))
        .withColumn("mean_tok_ppm", mean_tok_ppm.cast("long"))
        .withColumn("quality_ppm", score_ppm.cast("long"))
        .drop("__q_toks")
    )


def quality_score_sql(col: str, toks: str) -> dict[str, str]:
    n_tokens = f"len({toks})"
    n_chars = f"length({col})"
    alpha = f"length(regexp_replace({col}, '[^A-Za-z]', '', 'g'))"
    sum_tok = f"length(list_aggregate({toks}, 'string_agg', ''))"
    alpha_ppm = f"CASE WHEN {n_chars} > 0 THEN CAST(floor(1000000.0 * {alpha} / {n_chars}) AS BIGINT) ELSE 0 END"
    mean_ppm = f"CASE WHEN {n_tokens} > 0 THEN CAST(floor(1000000.0 * {sum_tok} / {n_tokens}) AS BIGINT) ELSE 0 END"
    len_ok = f"({n_tokens} >= 5 AND {n_tokens} <= 5000)"
    tok_ok = f"({sum_tok} >= 2 * {n_tokens} AND {sum_tok} <= 12 * {n_tokens} AND {n_tokens} > 0)"
    score = (
        f"(CASE WHEN {len_ok} THEN 400000 ELSE 0 END"
        f" + CASE WHEN {tok_ok} THEN 300000 ELSE 0 END"
        f" + CASE WHEN {n_chars} > 0 THEN CAST(floor(300000.0 * {alpha} / {n_chars}) AS BIGINT) ELSE 0 END)"
    )
    return {
        "n_tokens": f"CAST({n_tokens} AS BIGINT)",
        "alpha_ppm": alpha_ppm,
        "mean_tok_ppm": mean_ppm,
        "quality_ppm": f"CAST({score} AS BIGINT)",
    }


# -- repetition signals -------------------------------------------------------


def _ngram_col(toks: Column, n: int) -> Column:
    """Sliding word n-grams as an array column, built JVM-side: transform
    over a length-(len-n+1) slice, joining each window with an unprintable
    separator so 'a b'+'c' can never collide with 'a'+'b c'."""
    length = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    return F.transform(
        F.slice(toks, 1, length),
        lambda x, i: F.concat_ws(
            "\x1f", x, *[F.element_at(toks, i + k + 1) for k in range(1, n)]
        ),
    )


def with_repetition_signals(df: DataFrame, col: str = "text") -> DataFrame:
    """Within-document repetition signals (the Gopher-style quality rules:
    heavily self-repeating documents are low-value training data):

    * ``dup_bigram_ppm`` / ``dup_trigram_ppm`` — fraction (ppm) of word
      2-/3-grams that are repeats of an earlier identical n-gram,
    * ``top_token_ppm`` — concentration of the single most frequent token.

    All ppm values use the module's exact-integer floor(1e6·a/c) scheme, so
    the DuckDB oracle can never disagree on a rounding boundary.  Everything
    is built-in higher-order functions — zero Python in the hot path.

    The token and n-gram arrays are materialized through ALIASED columns
    (``__rep_*``, dropped before return), not inlined: higher-order array
    functions are CodegenFallback, so whole-stage codegen's subexpression
    elimination never sees them — an inlined ``tokens_col`` was evaluated
    31 separate times in the executed plan (regexp split per occurrence),
    ~13x the whole pass.  CollapseProject keeps a multi-referenced
    non-cheap alias as its own projection, which is exactly the barrier
    needed.  The top-token count is a sort + longest-equal-run fold,
    O(n log n) per doc (a distinct×filter scan is O(tokens·distinct) and
    dominates on long documents)."""
    toks = F.col("__rep_toks")
    n_tok = F.size(toks)

    def dup_ppm(n: int) -> Column:
        return _dup_ppm_expr(F.col(f"__rep_g{n}"))

    top_cnt = _top_run_count_expr(toks)
    top_ppm = (
        F.when(n_tok > 0, F.floor(F.lit(1_000_000) * top_cnt / n_tok))
        .otherwise(F.lit(0))
        .cast("long")
    )
    return (
        df.withColumn("__rep_toks", tokens_col(col))
        .withColumn("__rep_g2", _ngram_col(toks, 2))
        .withColumn("__rep_g3", _ngram_col(toks, 3))
        .withColumn("dup_bigram_ppm", dup_ppm(2))
        .withColumn("dup_trigram_ppm", dup_ppm(3))
        .withColumn("top_token_ppm", top_ppm)
        .drop("__rep_toks", "__rep_g2", "__rep_g3")
    )


def repetition_sql(toks: str) -> dict[str, str]:
    def grams(n: int) -> str:
        return (
            f"list_transform(generate_series(1, greatest(len({toks})-{n - 1}, 0)), "
            f"i -> array_to_string({toks}[i:i+{n - 1}], chr(31)))"
        )

    def dup(n: int) -> str:
        g = grams(n)
        return (
            f"CASE WHEN len({g}) > 0 THEN CAST(floor(1000000.0 * "
            f"(len({g}) - len(list_distinct({g}))) / len({g})) AS BIGINT) "
            f"ELSE 0 END"
        )

    top_cnt = (
        f"list_max(list_transform(list_distinct({toks}), "
        f"t2 -> len(list_filter({toks}, x -> x = t2))))"
    )
    top = (
        f"CASE WHEN len({toks}) > 0 THEN CAST(floor(1000000.0 * {top_cnt} / "
        f"len({toks})) AS BIGINT) ELSE 0 END"
    )
    return {"dup_bigram_ppm": dup(2), "dup_trigram_ppm": dup(3), "top_token_ppm": top}


# -- composed corpus filter ----------------------------------------------------


def filter_corpus(
    df: DataFrame,
    col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 5000,
    min_quality_ppm: int = 500_000,
    max_dup_trigram_ppm: int = 300_000,
    max_top_token_ppm: int = 300_000,
    lang: str | None = None,
) -> DataFrame:
    """The standard one-call training-data filter (C4/Gopher recipe shape):
    token-count bounds, composite quality floor, repetition ceilings, and an
    optional language gate — all built-in expressions, so Catalyst fuses the
    whole filter into the scan (one pass, no shuffle, predicate-pushdown
    friendly).  Returns the surviving rows of ``df`` unchanged (signal
    columns are computed for the predicate, then dropped)."""
    # The predicate is ONE self-contained expression with the token array
    # LET-BOUND via a higher-order function: transform over a 1-element
    # array binds the tokenizer's output to a lambda variable that every
    # signal then references.  Composing the with_*() columns and
    # filtering on them instead measures 31 copies of the regexp
    # tokenizer in the executed plan (30 s vs ~2 s on a 5k-doc corpus):
    # the optimizer substitutes the aliases into the condition
    # transitively, and higher-order array exprs are CodegenFallback, so
    # no codegen CSE ever deduplicates the copies.  A lambda variable
    # cannot be substituted — the expression stays single-evaluation no
    # matter where the optimizer moves it.
    def pred_of(toks: Column) -> Column:
        n_tokens = F.size(toks)
        # nested let: the trigram array is also bound once
        dup3_ok = F.element_at(
            F.transform(
                F.array(_ngram_col(toks, 3)),
                lambda g3: _dup_ppm_expr(g3) <= max_dup_trigram_ppm,
            ),
            1,
        )
        top_ppm = (
            F.when(
                n_tokens > 0,
                F.floor(F.lit(1_000_000) * _top_run_count_expr(toks) / n_tokens),
            )
            .otherwise(F.lit(0))
            .cast("long")
        )
        keep = (
            (n_tokens >= min_tokens)
            & (n_tokens <= max_tokens)
            & (_quality_ppm_expr(toks, col) >= min_quality_ppm)
            & dup3_ok
            & (top_ppm <= max_top_token_ppm)
        )
        if lang is not None:
            n_stop = _stopword_count_expr(toks)
            # same default threshold as with_lang_id (threshold_pct=8)
            is_en = (n_tokens > 0) & (n_stop * 100 >= n_tokens * 8)
            lang_pred = F.when(is_en, F.lit("en")).otherwise(F.lit("unk"))
            keep = keep & (lang_pred == F.lit(lang))
        return keep

    keep = F.element_at(F.transform(F.array(tokens_col(col)), pred_of), 1)
    return df.filter(keep)


def filter_corpus_sql(
    table: str,
    col: str = "text",
    min_tokens: int = 5,
    max_tokens: int = 5000,
    min_quality_ppm: int = 500_000,
    max_dup_trigram_ppm: int = 300_000,
    max_top_token_ppm: int = 300_000,
    lang: str | None = None,
) -> str:
    toks = duckdb_tokens(col)
    q = quality_score_sql(col, toks)
    rep = repetition_sql(toks)
    conds = [
        f"{q['n_tokens']} >= {min_tokens}",
        f"{q['n_tokens']} <= {max_tokens}",
        f"{q['quality_ppm']} >= {min_quality_ppm}",
        f"{rep['dup_trigram_ppm']} <= {max_dup_trigram_ppm}",
        f"{rep['top_token_ppm']} <= {max_top_token_ppm}",
    ]
    if lang is not None:
        pred, _ = lang_id_sql(toks)
        conds.append(f"{pred} = '{lang}'")
    return f"SELECT * FROM {table} WHERE " + " AND ".join(conds)


# -- fingerprinting -----------------------------------------------------------------


def with_fingerprint(df: DataFrame, col: str = "text") -> DataFrame:
    """Canonical document fingerprint = md5 of the normalized token stream —
    whitespace/punctuation/case-insensitive exact-dup key."""
    return df.withColumn("fingerprint", F.md5(F.concat_ws(" ", tokens_col(col))))


def fingerprint_sql(toks: str) -> str:
    return f"md5(array_to_string({toks}, ' '))"


# -- PII scrubbing ------------------------------------------------------------

# Training-data redaction pass (the C4/FineWeb-style PII stage).  Patterns
# are restricted to constructs Java regex (Spark) and RE2 (DuckDB) evaluate
# identically — no lookaround, no backreferences, ASCII classes only,
# leftmost-first alternation — so the DuckDB oracle matches byte-for-byte.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"(?:\+?1[-. ]?)?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b", "<PHONE>"),
)


def with_pii_scrub(df: DataFrame, col: str = "text") -> DataFrame:
    """Redact emails / IPv4 addresses / NANP phone numbers and count each
    class.  Counts are measured on the ORIGINAL text; redactions apply
    sequentially (email → ip → phone) so a digit run inside an already-
    redacted span is never doubly redacted.  Pure JVM regexp inside
    whole-stage codegen — zero Python, scan-side, no shuffle: the shape
    that holds at 100 TB."""
    out = df
    for name, pat, _tok in PII_PATTERNS:
        out = out.withColumn(
            f"n_{name}", F.regexp_count(F.col(col), F.lit(pat)).cast("long")
        )
    scrubbed = F.col(col)
    for _name, pat, tok in PII_PATTERNS:
        scrubbed = F.regexp_replace(scrubbed, pat, tok)
    return out.withColumn(f"{col}_scrubbed", scrubbed)


def pii_scrub_sql(col: str = "text") -> dict[str, str]:
    """DuckDB twins of with_pii_scrub's output columns."""
    exprs: dict[str, str] = {}
    scrub = col
    for name, pat, tok in PII_PATTERNS:
        exprs[f"n_{name}"] = f"CAST(len(regexp_extract_all({col}, '{pat}')) AS BIGINT)"
        scrub = f"regexp_replace({scrub}, '{pat}', '{tok}', 'g')"
    exprs[f"{col}_scrubbed"] = scrub
    return exprs


# -- self-perplexity (LM quality signal) ---------------------------------------


def with_self_perplexity(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: float = 0.5
) -> DataFrame:
    """CCNet-style language-model quality signal: train an add-k-smoothed
    BIGRAM LM on the corpus itself, then score every document by its mean
    negative log-likelihood per bigram (high = out-of-distribution /
    low-quality relative to the corpus).  CCNet buckets a corpus by LM
    perplexity before training-data selection; the self-trained bigram LM
    is the dependency-free analog.

    p(w2|w1) = (c(w1,w2) + k) / (c(w1) + k·V), with c(w1) the context
    count (bigrams starting with w1) and V the corpus vocabulary size.

    Per-bigram costs use the module's exact-integer scheme — micro-nats
    ``floor(1e6 · -ln p)`` — summed as BIGINTs, so aggregation order can
    never flip a rounding boundary between engines (the oracle sums
    sequentially, Spark in partial-aggregate order).

    Spark shape at 100 TB: three map-only passes over the corpus (the
    bigram explode feeds both the count agg and the scoring join and is
    deliberately recomputed rather than cached — re-tokenizing a scan is
    cheaper than persisting TBs of exploded bigrams; V is a third
    count-distinct pass), a hash agg on bigram (map-side combined — hot
    bigrams never skew a reducer), a tiny agg on context word, one
    equality join of the bigram stream against the bigram-stats table,
    one agg back to docs.  No broadcast of the LM (the bigram table
    scales with the corpus); V is the single driver scalar.  Returns
    df's id column + (n_bigrams, nll_micro).
    """
    sep = "\x1f"
    # let-bound token array: _ngram_col references its input twice, so an
    # inlined tokenizer expression would run 2x per gram stream (9 copies
    # measured across the whole plan; see filter_corpus)
    bg_arr = F.element_at(
        F.transform(F.array(tokens_col(text_col)), lambda t: _ngram_col(t, 2)), 1
    )
    grams = df.select(F.col(id_col), F.explode(bg_arr).alias("bg"))
    vocab = (
        df.select(F.explode(tokens_col(text_col)).alias("t")).agg(
            F.countDistinct("t").alias("v")
        ).collect()[0]["v"]
    ) or 1
    counts = grams.groupBy("bg").agg(F.count("*").alias("c12"))
    ctx = (
        counts.withColumn("w1", F.substring_index(F.col("bg"), sep, 1))
        .groupBy("w1")
        .agg(F.sum("c12").alias("c1"))
    )
    bgstats = (
        counts.withColumn("w1", F.substring_index(F.col("bg"), sep, 1))
        .join(ctx, "w1")
        .select(
            "bg",
            F.floor(
                F.lit(1_000_000.0)
                * -F.log(
                    (F.col("c12") + F.lit(float(k)))
                    / (F.col("c1") + F.lit(float(k)) * F.lit(float(vocab)))
                )
            ).alias("cost_micro"),
        )
    )
    scored = (
        grams.join(bgstats, "bg")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.floor(F.sum("cost_micro") / F.count("*")).cast("long").alias("nll_micro"),
        )
    )
    return (
        df.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("nll_micro", F.lit(0)).cast("long").alias("nll_micro"),
        )
    )


def self_perplexity_sql(
    table: str = "documents", id_col: str = "doc_id", text_col: str = "text", k: float = 0.5
) -> str:
    """DuckDB twin of with_self_perplexity: same LM, same exact-integer
    micro-nat costs, sequential aggregation."""
    toks = duckdb_tokens(text_col)
    return f"""
WITH grams AS (
  SELECT {id_col}, array_to_string([g[1], g[2]], chr(31)) AS bg
  FROM (
    SELECT {id_col}, unnest(list_transform(
      generate_series(1, greatest(len({toks}) - 1, 0)),
      i -> {toks}[i:i+1])) AS g
    FROM {table}
  )
),
vocab AS (
  SELECT greatest(count(DISTINCT t), 1) AS v
  FROM (SELECT unnest({toks}) AS t FROM {table})
),
counts AS (SELECT bg, count(*) AS c12 FROM grams GROUP BY bg),
ctx AS (
  SELECT split_part(bg, chr(31), 1) AS w1, sum(c12) AS c1
  FROM counts GROUP BY 1
),
bgstats AS (
  SELECT bg,
         CAST(floor(1000000.0 * -ln((c12 + {k}) / (c1 + {k} * vocab.v))) AS BIGINT)
           AS cost_micro
  FROM counts
  JOIN ctx ON split_part(counts.bg, chr(31), 1) = ctx.w1
  CROSS JOIN vocab
),
scored AS (
  SELECT {id_col},
         CAST(count(*) AS BIGINT) AS n_bigrams,
         CAST(floor(sum(cost_micro) * 1.0 / count(*)) AS BIGINT) AS nll_micro
  FROM grams JOIN bgstats USING (bg)
  GROUP BY 1
)
SELECT t.{id_col},
       COALESCE(s.n_bigrams, 0) AS n_bigrams,
       COALESCE(s.nll_micro, 0) AS nll_micro
FROM {table} t LEFT JOIN scored s USING ({id_col})
"""


# -- corpus length statistics ---------------------------------------------------


def corpus_length_stats(
    df: DataFrame, col: str = "text", qs: tuple = (0.5, 0.9, 0.99)
) -> DataFrame:
    """EXACT token-length quantiles + totals for a corpus — the numbers a
    training pipeline reads before picking seq_len / truncation / packing
    parameters.

    Exactness at 100 TB without a global sort: token counts have bounded
    cardinality (a histogram of distinct lengths), so ONE map-side-combined
    hash agg builds the value histogram, a window cumsum over the tiny
    histogram (thousands of rows, one partition is fine) yields cumulative
    counts, and quantile q is ``min(v) where cum >= ceil(q*n)`` — the same
    closed formula the DuckDB twin evaluates, so both engines agree by
    construction (no approxQuantile, no engine-specific quantile_disc).

    Returns one row: n_docs, total_tokens, max_tokens, and q<pct> columns.

    ONE corpus scan total: everything (totals included) derives from the
    collected histogram, which is metadata-scale at any corpus size.
    """
    import math

    n_tok = F.size(tokens_col(col)).alias("n")
    hist = (
        df.select(n_tok).groupBy("n").agg(F.count("*").alias("c")).orderBy("n").collect()
    )
    ns = [int(r["n"]) for r in hist]
    cs = [int(r["c"]) for r in hist]
    n_docs = sum(cs)
    row = {
        "n_docs": n_docs,
        "total_tokens": sum(n * c for n, c in zip(ns, cs)),
        "max_tokens": max(ns) if ns else 0,
    }
    cum = 0
    cums = []
    for c in cs:
        cum += c
        cums.append(cum)
    for q in qs:
        need = math.ceil(q * n_docs)
        row[f"q{round(q * 100)}"] = next(
            (n for n, cm in zip(ns, cums) if cm >= need), 0
        )
    spark = df.sparkSession
    cols = ", ".join(f"{k} long" for k in row)
    return spark.createDataFrame([tuple(row.values())], cols)


def corpus_length_stats_sql(
    table: str = "documents", col: str = "text", qs: tuple = (0.5, 0.9, 0.99)
) -> str:
    """DuckDB twin of corpus_length_stats (same histogram-cumsum formula)."""
    toks = duckdb_tokens(col)
    q_cols = ",\n       ".join(
        f"COALESCE((SELECT CAST(min(n) AS BIGINT) FROM cum "
        f"WHERE cum >= ceil({q} * (SELECT n_docs FROM totals))), 0) AS q{round(q * 100)}"
        for q in qs
    )
    # COALESCE everywhere: the Spark side emits 0s for an empty corpus
    return f"""
WITH hist AS (
  SELECT len({toks}) AS n, count(*) AS c FROM {table} GROUP BY 1
),
cum AS (
  SELECT n, sum(c) OVER (ORDER BY n) AS cum FROM hist
),
totals AS (
  SELECT count(*) AS n_docs,
         COALESCE(CAST(sum(len({toks})) AS BIGINT), 0) AS total_tokens,
         COALESCE(CAST(max(len({toks})) AS BIGINT), 0) AS max_tokens
  FROM {table}
)
SELECT CAST(n_docs AS BIGINT) AS n_docs, total_tokens, max_tokens,
       {q_cols}
FROM totals
"""


# -- RAG-style window chunking -------------------------------------------------


def chunk_windows(
    df: DataFrame,
    col: str = "text",
    window: int = 64,
    stride: int = 48,
    min_tokens: int = 1,
) -> DataFrame:
    """Overlapping token-window chunking for embedding / RAG pipelines:
    each document explodes into windows of `window` tokens starting every
    `stride` tokens (start ordinals 0..floor((n-1)/stride); the tail
    window may be shorter).  Output adds `chunk_idx` (window ordinal),
    `chunk_text` (space-joined window tokens) and `n_chunk_tokens`;
    windows below `min_tokens` are dropped (with stride < window the last
    window can be a suffix of the previous one — the conventional
    fixed-size chunker behavior; min_tokens filters degenerate tails).

    Map-only scan-side explode, zero shuffle, zero Python: the token
    array is let-bound through a transform lambda (computed once per row
    despite the three references — the expression-duplication discipline
    of SURVEY §8), windows built with sequence/slice/array_join.
    """
    if window < 1 or stride < 1 or min_tokens < 1:
        raise ValueError("window, stride and min_tokens must be >= 1")
    sl = F.lit(stride)

    def per_doc(toks: Column) -> Column:
        n = F.size(toks)
        starts = F.when(
            n > F.lit(0),
            F.sequence(F.lit(0), F.floor((n - F.lit(1)) / sl).cast("int")),
        ).otherwise(F.array().cast("array<int>"))
        return F.transform(
            starts,
            lambda s: F.struct(
                s.cast("long").alias("chunk_idx"),
                F.array_join(F.slice(toks, s * sl + F.lit(1), F.lit(window)), " ").alias(
                    "chunk_text"
                ),
                F.size(F.slice(toks, s * sl + F.lit(1), F.lit(window)))
                .cast("long")
                .alias("n_chunk_tokens"),
            ),
        )

    chunks = F.transform(F.array(tokens_col(col)), per_doc)[0]
    out = df.withColumn("__chunk", F.explode(chunks))
    return (
        out.select(
            *[c for c in df.columns if c != col],
            F.col("__chunk.chunk_idx").alias("chunk_idx"),
            F.col("__chunk.chunk_text").alias("chunk_text"),
            F.col("__chunk.n_chunk_tokens").alias("n_chunk_tokens"),
        )
        .where(F.col("n_chunk_tokens") >= F.lit(min_tokens))
    )


def chunk_windows_sql(
    table: str = "documents",
    col: str = "text",
    window: int = 64,
    stride: int = 48,
    min_tokens: int = 1,
    id_cols: str = "doc_id",
) -> str:
    """DuckDB twin of chunk_windows (1-based inclusive list slicing)."""
    toks = duckdb_tokens(col)
    a = f"s*{stride}+1"
    b = f"s*{stride}+{window}"
    return f"""
WITH d AS (SELECT {id_cols}, {toks} AS toks FROM {table})
SELECT {id_cols}, CAST(s AS BIGINT) AS chunk_idx,
       array_to_string(toks[{a}:{b}], ' ') AS chunk_text,
       CAST(len(toks[{a}:{b}]) AS BIGINT) AS n_chunk_tokens
FROM d, UNNEST(range(0, CASE WHEN len(toks) = 0 THEN 0
                             ELSE (len(toks)-1)//{stride} + 1 END)) AS t(s)
WHERE len(toks[{a}:{b}]) >= {min_tokens}
"""
