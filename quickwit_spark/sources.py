"""Batch ingest connectors — the Source implementations of the reference
(quickwit-indexing/src/source/*, SURVEY.md §2.1) re-expressed as Spark
readers.  The streaming (tailing) variants live in streaming/ingest.py.

* NDJSON files   → FileSource analog (source/file_source.rs:37-152; the
  reference's unit of data is one JSON doc per line, docs/design/indexing.md:8)
* parquet tables → the Iceberg-shaped input of BASELINE.json input_hint
* in-memory rows → VecSource analog (source/vec_source.rs)
* KafkaSource    → would be ``spark.readStream.format("kafka")`` + the same
  downstream foreachBatch build (no broker in this sandbox — not exercised)

All readers yield the canonical transcript schema; unknown JSON fields are
silently dropped by the explicit schema (reference behavior,
default_mapper.rs:582-595) and malformed lines become all-null rows that
``project_and_validate`` counts as invalid docs (NotJson analog).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from .streaming.ingest import TRANSCRIPT_SCHEMA


def read_ndjson(spark: SparkSession, path: str) -> DataFrame:
    """NDJSON transcript source.  PERMISSIVE mode: a malformed line yields a
    null-keyed row (counted+dropped by validation) instead of failing the
    read — the reference counts parse failures per doc
    (indexer counters, indexer.rs:38-62)."""
    # No explicit timestampFormat: Spark's default lenient ISO-8601 parser
    # accepts every RFC-3339 fraction precision.  An explicit "[.SSS][XXX]"
    # pattern matches EXACTLY 3 fraction digits, so microsecond timestamps
    # — including the engine's own canonical_date output — parsed to null
    # and the documents were dropped as invalid (same bug class as the
    # Kafka/Kinesis projection, streaming/ingest.py).
    return spark.read.schema(TRANSCRIPT_SCHEMA).option("mode", "PERMISSIVE").json(path)


def read_transcripts_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet/Iceberg-shaped transcript table (the primary input)."""
    return spark.read.parquet(path)


def read_transcripts_table(
    spark: SparkSession, ref: str, fmt: str = "auto"
) -> DataFrame:
    """North-rule input resolution: 'an Iceberg table of transcript turns'.

    In Spark an Iceberg table is just a catalog table — ``spark.read
    .table("catalog.db.turns")`` (or the ``iceberg`` DSv2 format for a
    path-based table); snapshot isolation, partition pruning and column
    pruning all happen inside the data source, and everything downstream of
    this function is plain DataFrame ops, so the engine is agnostic to
    which it got.  fmt:

    * ``auto``     — path-looking refs (contain '/' or end .parquet) read
                     as parquet; anything else as a catalog table
    * ``parquet``  — direct parquet dir/file (the sandbox stand-in for an
                     Iceberg table at the same schema)
    * ``table``    — any Spark catalog table or registered view
    * ``iceberg``  — explicit DSv2 format load; raises a clear error when
                     the Iceberg runtime jars are not on the classpath
                     (this sandbox ships none — gated, not assumed)
    * ``ndjson``   — FileSource analog (read_ndjson)
    """
    if fmt == "auto":
        fmt = "parquet" if ("/" in ref or ref.endswith(".parquet")) else "table"
    if fmt == "parquet":
        return spark.read.parquet(ref)
    if fmt == "ndjson":
        return read_ndjson(spark, ref)
    if fmt == "table":
        return spark.read.table(ref)
    if fmt == "iceberg":
        try:
            return spark.read.format("iceberg").load(ref)
        except Exception as exc:
            raise RuntimeError(
                "iceberg read failed — is the Iceberg Spark runtime on the "
                "classpath (spark-submit --packages org.apache.iceberg:"
                "iceberg-spark-runtime-...)?  Catalog-registered Iceberg "
                "tables also work via fmt='table'."
            ) from exc
    raise ValueError(f"unknown input format {fmt!r}")


def vec_source(spark: SparkSession, rows: pd.DataFrame | list[dict]) -> DataFrame:
    """VecSource analog: an in-memory batch (tests, fixtures)."""
    if isinstance(rows, list):
        rows = pd.DataFrame(rows)
    # pyspark zips pandas columns to schema fields by POSITION; reorder by
    # name so dict/frame inputs with a different key order don't silently
    # swap same-typed columns (missing columns fail loudly as KeyError)
    rows = rows[[f.name for f in TRANSCRIPT_SCHEMA.fields]]
    return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
