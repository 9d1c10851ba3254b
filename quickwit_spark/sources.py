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
    return (
        spark.read.schema(TRANSCRIPT_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss[.SSS][XXX]")
        .json(path)
    )


def read_transcripts_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Parquet/Iceberg-shaped transcript table (the primary input)."""
    return spark.read.parquet(path)


def vec_source(spark: SparkSession, rows: pd.DataFrame | list[dict]) -> DataFrame:
    """VecSource analog: an in-memory batch (tests, fixtures)."""
    if isinstance(rows, list):
        rows = pd.DataFrame(rows)
    return spark.createDataFrame(rows, schema=TRANSCRIPT_SCHEMA)
