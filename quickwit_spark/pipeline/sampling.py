"""Deterministic sampling operators for large-scale training-data pipelines.

Random sampling (`df.sample()`) is the wrong tool for corpus curation: it is
not reproducible across runs/engines, not stable under re-partitioning, and
cannot be joined against later ("which sample was doc X in?").  The standard
pipeline answer is HASH sampling: a doc is in the p-sample iff
``h(salt, doc_id) < p`` for a uniform hash — deterministic, engine-portable,
stable under any partitioning, and nested (the 10% sample is a superset of
the 1% sample at the same salt).

Both operators stay entirely in JVM whole-stage codegen (md5 + string
compare / one window), with exact DuckDB SQL twins for the driver oracle:
md5 of the same utf8 string is the same lowercase hex everywhere, and
lexicographic order on fixed-width lowercase hex == numeric order, so the
threshold compare needs no bigint conversions in either engine.

* ``sample_by_hash``      — map-only filter: no shuffle, fully parallel at
  any scale; the filter sits right above the parquet scan so column pruning
  still applies.
* ``stratified_sample``   — per-stratum top-N by hash order (quota
  sampling, e.g. "200k docs per language"): one hash-partitioned window
  per stratum; the hash ordering makes the quota winners deterministic AND
  unbiased within each stratum.  At 100 TB the shuffle is one exchange on
  the stratum key; skewed strata (one language = half the corpus) stay a
  single partition's sort — for pathological skew pre-filter with
  ``sample_by_hash`` at a rate that bounds the biggest stratum first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

HEX_SPACE = 16**8  # the sampling key: first 8 hex chars of md5 → 32 bits


def _threshold_hex(rate: float) -> str:
    """Threshold string h such that key < h keeps ≈rate of keys."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    if rate >= 1.0:
        # every 8-hex-digit key sorts below 'g'; capping at 'ffffffff'
        # (exclusive) would drop the 1-in-2^32 keys equal to it
        return "g"
    return format(int(rate * HEX_SPACE), "08x")


def _spark_key(id_col: str, salt: str):
    return F.substring(
        F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))), 1, 8
    )


def _sql_key(id_col: str, salt: str) -> str:
    return f"substr(md5('{salt}' || ':' || CAST({id_col} AS VARCHAR)), 1, 8)"


def sample_by_hash(
    df: DataFrame, rate: float, id_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic p-sample: keep rows with md5-key(salt, id) < rate.

    Map-only (no shuffle); different salts draw independent samples, the
    same salt nests across rates (train/val splits by disjoint ranges)."""
    return df.filter(_spark_key(id_col, salt) < F.lit(_threshold_hex(rate)))


def sample_by_hash_sql(
    rate: float, table: str = "documents", id_col: str = "doc_id", salt: str = ""
) -> str:
    """DuckDB twin of sample_by_hash (same rows, any engine)."""
    return (
        f"SELECT * FROM {table} "
        f"WHERE {_sql_key(id_col, salt)} < '{_threshold_hex(rate)}'"
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    n_per_stratum: int,
    id_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Quota sample: the n_per_stratum hash-smallest rows of each stratum.

    Hash order = an unbiased, reproducible shuffle of each stratum; doc id
    breaks hash ties so the winner set is total-order stable."""
    w = Window.partitionBy(stratum_col).orderBy(
        _spark_key(id_col, salt), F.col(id_col)
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def stratified_sample_sql(
    stratum_col: str,
    n_per_stratum: int,
    table: str = "documents",
    id_col: str = "doc_id",
    salt: str = "",
) -> str:
    """DuckDB twin of stratified_sample."""
    key = _sql_key(id_col, salt)
    return (
        f"SELECT * EXCLUDE (__rk) FROM ("
        f"  SELECT *, row_number() OVER ("
        f"    PARTITION BY {stratum_col} ORDER BY {key}, {id_col}"
        f"  ) AS __rk FROM {table}"
        f") WHERE __rk <= {n_per_stratum}"
    )


def _copy_key(id_col: str, salt: str, copy_col):
    """Hash key drawing an independent sample per replication index."""
    return F.substring(
        F.md5(
            F.concat_ws(
                ":", F.lit(salt), copy_col.cast("string"), F.col(id_col).cast("string")
            )
        ),
        1,
        8,
    )


def mixture_sample(
    df: DataFrame,
    rates: dict[str, float],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
) -> DataFrame:
    """Data-mixing sampler: per-stratum sampling RATES, including
    upsampling (rate > 1 replicates rows — epoch weighting for training
    mixes, e.g. {"wiki": 3.0, "web": 0.5}).

    Every row expands to ``ceil(rate)`` candidate copies (`copy_idx`
    column, 0-based) and copy c survives iff ``h(salt:c:id) < rate - c`` —
    so floor(rate) copies always survive and the fractional copy is an
    independent hash draw.  Deterministic, join-stable, map-only (the
    explode is scan-side; no shuffle), and nested in `rate` per stratum at
    a fixed salt: raising a stratum's rate only ADDS copies.  Strata
    absent from ``rates`` use ``default_rate``.
    """
    for k, r in rates.items():
        if r < 0:
            raise ValueError(f"negative rate for {k!r}: {r}")
    if default_rate < 0:
        raise ValueError(f"negative default_rate: {default_rate}")
    rate_col = (
        F.coalesce(
            F.create_map(
                *[F.lit(x) for k, r in sorted(rates.items()) for x in (k, float(r))]
            )[F.col(stratum_col)],
            F.lit(float(default_rate)),
        )
        if rates
        else F.lit(float(default_rate))
    )
    out = (
        df.withColumn("__rate", rate_col)
        .filter(F.col("__rate") > 0)
        .withColumn(
            "copy_idx",
            F.explode(F.sequence(F.lit(0), F.ceil("__rate").cast("int") - 1)),
        )
    )
    # survive iff key < (rate - copy_idx), clamped into [0, 1]
    frac = F.least(F.lit(1.0), F.col("__rate") - F.col("copy_idx"))
    thresh = F.lpad(
        F.conv(
            F.floor(frac * F.lit(float(HEX_SPACE))).cast("string"), 10, 16
        ),
        8,
        "0",
    )
    key = _copy_key(id_col, salt, F.col("copy_idx"))
    return out.filter(
        (frac >= 1.0) | (key < F.lower(thresh))
    ).drop("__rate")


def mixture_sample_sql(
    rates: dict[str, float],
    table: str = "documents",
    stratum_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    default_rate: float = 0.0,
) -> str:
    """DuckDB twin of :func:`mixture_sample` (md5 hex keys match Spark's)."""
    cases = " ".join(
        f"WHEN '{k}' THEN CAST({float(r)} AS DOUBLE)" for k, r in sorted(rates.items())
    )
    rate = (
        f"CASE {stratum_col} {cases} ELSE CAST({float(default_rate)} AS DOUBLE) END"
        if rates
        else f"CAST({float(default_rate)} AS DOUBLE)"
    )
    key = (
        f"substr(md5('{salt}' || ':' || CAST(g.copy_idx AS VARCHAR) || ':' "
        f"|| CAST({id_col} AS VARCHAR)), 1, 8)"
    )
    return f"""
SELECT * EXCLUDE (__rate, __frac) FROM (
  SELECT t.*, g.copy_idx, {rate} AS __rate,
         LEAST(1.0, {rate} - g.copy_idx) AS __frac
  FROM {table} t
  CROSS JOIN UNNEST(generate_series(0,
      CAST(CEIL({rate}) AS BIGINT) - 1)) AS g(copy_idx)
  WHERE {rate} > 0
)
WHERE __frac >= 1.0
   OR {key.replace('g.copy_idx', 'copy_idx')} < lpad(lower(format('{{:x}}',
        CAST(FLOOR(__frac * {HEX_SPACE}) AS BIGINT))), 8, '0')
"""
