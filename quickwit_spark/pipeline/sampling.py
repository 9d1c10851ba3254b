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
    """Largest 8-hex-digit string h such that key < h keeps ≈rate of keys."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0,1], got {rate}")
    return format(min(int(rate * HEX_SPACE), HEX_SPACE - 1), "08x")


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
