"""Generic-schema index builds: NDJSON corpus + DocMapper config → a real
index (the reference's `quickwit index create --index-config … && quickwit
index ingest` path for arbitrary typed schemas, not just transcripts).

The general DocMapper (docmapper.py) parses and validates each JSON doc
with the reference's error taxonomy; valid docs are projected onto the
engine's internal frame:

* ``conv_id``  — the doc identity: md5 of the raw JSON line
  (content-addressed, a pure function of the data — the stable-docID
  invariant, SURVEY.md §7)
* ``turn_idx`` — 0 (single-doc "conversations")
* ``ts``       — the mapper's timestamp_field (i64 epoch seconds, or a
  ``date`` field), else epoch 0.  The engine's ts fast-field packs u32
  epoch seconds (1970-2106); an i64 timestamp carrying milliseconds
  overflows it and fails the build with a pointed error.
* every schema leaf — a typed column (dotted names for nested objects)

Everything downstream — split build, merge, BM25 search with per-field
exact doc lengths, field-scoped queries on any indexed leaf, typed
exact-value term queries — is the same engine the transcripts use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..docmapper import DocMapper, parse_ndjson
from .builder import BuildReport, build_index


def mapper_frame(df: DataFrame, mapper: DocMapper) -> tuple[DataFrame, DataFrame]:
    """Parse a one-JSON-line-per-row DataFrame with the mapper and project
    the engine's internal frame.  Returns (valid_frame, error_rows) where
    error_rows has a `_parse_error` 'kind:field' column (the reference's
    per-doc DocParsingError, counted like IndexerCounters)."""
    return _split_parsed(parse_ndjson(df, mapper, with_identity=True), mapper)


def _split_parsed(parsed: DataFrame, mapper: DocMapper) -> tuple[DataFrame, DataFrame]:
    """(already-parsed frame) → (valid engine frame, error rows)."""
    errors = parsed.filter(F.col("_parse_error").isNotNull()).select("_parse_error")
    valid = parsed.filter(F.col("_parse_error").isNull())

    if mapper.timestamp_field is not None:
        lf = mapper.leaves[mapper.timestamp_field]
        ts_col = F.col(f"`{mapper.timestamp_field}`")
        ts_expr = ts_col.cast("long") if lf.entry.type != "date" else ts_col
    else:
        ts_expr = F.lit(0).cast("long")

    frame = valid.select(
        F.col("_doc_key").alias("conv_id"),
        F.lit(0).alias("turn_idx"),
        ts_expr.alias("ts"),
        *[F.col(f"`{n}`") for n in mapper.leaves],
    )
    return frame, errors


def build_index_from_ndjson(
    spark: SparkSession,
    source,
    mapper: DocMapper | None,
    index_dir: str,
    index_id: str = "ndjson",
    config: IndexConfig | None = None,
    **build_kwargs,
) -> tuple[BuildReport, dict[str, int]]:
    """End-to-end generic build: NDJSON path (or a DataFrame whose first
    column holds JSON lines) + DocMapper → published index.  Returns the
    build report and the invalid-doc taxonomy counts ('kind:field' → n).

    Pass ``config`` to ingest into an EXISTING index (the CLI path: the
    mapper re-hydrates from config.doc_mapper_json, fixed at create time);
    otherwise the config is derived from the mapper."""
    import json

    if config is None:
        config = IndexConfig.from_doc_mapper(
            mapper,
            index_id,
            **{
                k: build_kwargs.pop(k)
                for k in (
                    "split_num_docs_target",
                    "segment_num_docs_target",
                    "merge_factor",
                    "max_merge_factor",
                )
                if k in build_kwargs
            },
        )
    if mapper is None:
        if not config.doc_mapper_json:
            raise ValueError("config carries no doc mapper (doc_mapper_json)")
        mapper = DocMapper.from_dict(json.loads(config.doc_mapper_json))
    df = spark.read.text(source) if isinstance(source, str) else source
    parsed = parse_ndjson(df, mapper, with_identity=True)
    # one parse/validation pass total: the parsed frame feeds BOTH the
    # error-count job and the build (parse is the dominant ingest cost)
    parsed = parsed.persist()
    try:
        frame, errors = _split_parsed(parsed, mapper)
        err_counts = {
            r["_parse_error"]: int(r["n"])
            for r in errors.groupBy("_parse_error").agg(F.count("*").alias("n")).collect()
        }
        report = build_index(spark, frame, config, index_dir, **build_kwargs)
    finally:
        parsed.unpersist()
    report.invalid_docs += sum(err_counts.values())
    report.metrics.setdefault("invalid_by_reason", {}).update(err_counts)
    return report, err_counts
