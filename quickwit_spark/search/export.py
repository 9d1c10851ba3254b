"""Search-stream / export surface: every-matching-doc fast-field
streams and formatted exports (CSV / partitioned RowBinary), single- and
multi-index.  Data-scale paths stay on DataFrames (mapInPandas leaf).

Split out of the monolithic ``executor.py`` in round 5 (no behavior
change).  See ``executor.py`` for the architecture overview.
"""

from __future__ import annotations

import os
import re
import time
from dataclasses import dataclass, replace as _dc_replace

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..config import IndexConfig
from ..storage import storage_for
from ..functions.bm25 import idf as bm25_idf
from ..functions.bm25 import tf_norm
from ..functions.codec import (
    BLOCK,
    decode_blocks,
    decode_positions_at,
    decode_postings,
    decode_u32_column,
)
from ..index.catalog import Catalog, SplitMetadata
from .parser import (
    AllQuery,
    BoolQuery,
    ExistsQuery,
    FuzzyQuery,
    PhrasePrefixQuery,
    PhraseQuery,
    PrefixQuery,
    RegexQuery,
    TermQuery,
    WildcardQuery,
    collect_terms,
    extract_tag_predicate,
    parse_query,
    positive_exists_weights,
    positive_term_weights,
    positive_terms,
    regex_literal_prefix,
    wildcard_literal_prefix,
    wildcard_regex,
)
from .request import SearchRequest


from .plan import _table_scan, open_index
from .root import _leaf_hits_df


def _resolve_fast_field(spark, index_dir: str, fast_field: str) -> str:
    """Export-side fast-field name resolution, mirroring resolve_sort: the
    index's declared timestamp field streams from the ts plumbing column,
    and f64 fast fields are rejected loudly (the stream schema is i64;
    read the fastfields table directly for doubles)."""
    _, config = open_index(spark, index_dir)
    if fast_field == config.timestamp_field:
        return "ts"
    if fast_field in config.extra_fast_float_fields:
        raise ValueError(
            f"cannot stream f64 fast field {fast_field!r}: the stream "
            "schema is integer-class (reference u64 contract); scan the "
            "index's fastfields table for f64 columns"
        )
    if fast_field not in ("ts", "doc_len") and fast_field not in config.extra_fast_fields:
        raise ValueError(
            f"unknown fast field {fast_field!r}: declared fast fields are "
            f"{sorted(('doc_len', config.timestamp_field or 'ts') + config.extra_fast_fields)}"
        )
    return fast_field


def search_stream(
    spark: SparkSession, index_dir: str, request: SearchRequest, fast_field: str
) -> DataFrame:
    """Search-stream fast-field export (search_stream/leaf.rs:71-255 analog):
    the requested fast-field value of EVERY matching doc, no top-k."""
    out_name = fast_field
    fast_field = _resolve_fast_field(spark, index_dir, fast_field)
    # replace(), not a field-by-field rebuild: new SearchRequest fields
    # must flow through this path the same way export_stream's do
    req = _dc_replace(request, start_offset=0, sort_by_field=fast_field)
    hits, splits, ast, config = _leaf_hits_df(spark, index_dir, req)
    return hits.select(
        "split_id", "doc_id", F.col("sort_value").alias(out_name)
    )


def export_stream(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    fast_field: str,
    output_format: str = "csv",
    partition_by: str | None = None,
) -> DataFrame:
    """Search-stream export formats (search_stream/leaf.rs:140-237,
    docs/reference/rest-api.md:70-114 analog): the fast-field value of every
    matching doc, as
    * ``csv``: one row per value (write with ``df.write.csv`` — the
      reference streams text/csv);
    * ``rowbinary``: little-endian i64-packed payload, one row per
      ``partition_by`` value (the ClickHouse RowBinary + partition-by-second-
      fast-field path); without partition_by, a single payload row.
    The partition column is fetched through the doc store (fetch_docs
    semantics), so any stored column can partition the export."""
    hits = _export_hits(spark, index_dir, request, fast_field, partition_by)
    return _format_export(hits, fast_field, output_format, partition_by)


def _export_hits(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    fast_field: str,
    partition_by: str | None,
) -> DataFrame:
    """One index's export stream as (split_id, doc_id, <fast_field>
    [, <partition_by>]) — the leaf pass + optional partition-column join
    shared by the single- and multi-index export surfaces."""
    out_name = fast_field
    fast_field = _resolve_fast_field(spark, index_dir, fast_field)
    req = _dc_replace(request, start_offset=0, sort_by_field=fast_field)
    hits_df, splits, _ast, _config = _leaf_hits_df(spark, index_dir, req)
    hits = hits_df.select("split_id", "doc_id", F.col("sort_value").alias(out_name))
    if partition_by is not None:
        # the doc-store side of the partition-by join scans ONLY the
        # query's candidate splits: split_id is the partition column, so
        # the isin becomes Catalyst partition pruning — at 10^4 splits a
        # time-bounded export reads just the overlapping split dirs
        docs = (
            _table_scan(spark, index_dir, "docs")
            .filter(F.col("split_id").isin([s.split_id for s in splits]))
            .select("split_id", "doc_id", F.col(f"`{partition_by}`"))
        )
        hits = hits.join(docs, ["split_id", "doc_id"])
    return hits


def _format_export(
    hits: DataFrame,
    out_name: str,
    output_format: str,
    partition_by: str | None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Shape an export hits frame for the wire: ``csv`` keeps one row per
    value; ``rowbinary`` packs sorted little-endian i64 payloads per
    partition key (one payload row without partition_by)."""
    if output_format == "csv":
        # backticks: generic-schema column names may be dotted leaves
        cols = (
            [f"`{c}`" for c in extra_cols]
            + ([f"`{partition_by}`"] if partition_by else [])
            + [f"`{out_name}`"]
        )
        return hits.select(*[F.col(c) for c in cols])
    if output_format != "rowbinary":
        raise ValueError(f"unknown output format {output_format!r}")

    key = partition_by or "__part"
    grouped = hits.select(
        (F.col(f"`{partition_by}`") if partition_by else F.lit("")).alias(key),
        F.col(f"`{out_name}`").alias("v"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = np.sort(pdf["v"].to_numpy(np.int64))
        return pd.DataFrame(
            {key: [pdf[key].iloc[0]], "n": [len(vals)], "payload": [vals.astype("<i8").tobytes()]}
        )

    # the partition column keeps its real type ("any stored column can
    # partition the export"): a hardcoded string schema fails Arrow
    # conversion for int/date partition keys
    key_type = grouped.schema[key].dataType.simpleString()
    return grouped.groupBy(key).applyInPandas(
        pack, f"`{key}` {key_type}, n long, payload binary"
    )


def multi_index_export_stream(
    spark: SparkSession,
    index_dirs: list[str],
    request: SearchRequest,
    fast_field: str,
    output_format: str = "csv",
    partition_by: str | None = None,
) -> DataFrame:
    """Search-stream export over SEVERAL indexes (the union-merge pattern
    of multi_index_agg extended to /search/stream): each index runs its
    own leaf pass with its own plan/pruning, the per-index hit streams
    union, and formatting applies to the UNION —

    * ``csv``: one row per matching doc, with an ``index_id`` column
      prepended (split/doc ids are only unique within one index);
    * ``rowbinary``: partition keys MERGE across indexes — a partition
      value present in two indexes packs ONE payload containing both
      indexes' values (exact union-reduce, same contract as the
      multi-index aggregations).

    The union is lazy DataFrame composition — no driver materialization;
    each branch keeps its split-pruned scan."""
    if len(set(index_dirs)) != len(index_dirs) or not index_dirs:
        raise ValueError("index_dirs must be a non-empty list of distinct indexes")
    parts = []
    for d in index_dirs:
        h = _export_hits(spark, d, request, fast_field, partition_by)
        parts.append(
            h.select(
                F.lit(os.path.basename(d.rstrip("/"))).alias("index_id"), "*"
            )
        )
    hits = parts[0]
    for p in parts[1:]:
        hits = hits.unionByName(p)
    return _format_export(
        hits,
        fast_field,
        output_format,
        partition_by,
        extra_cols=("index_id",) if output_format == "csv" else (),
    )


# -- search-side aggregations ---------------------------------------------------
# Beyond the reference: quickwit ~v0.2's only "aggregation" is hit counting
# (SURVEY §2.6).  These compose the stream leaf (every matching doc, no
# top-k) with ordinary Spark hash aggregates — map-side combine, no driver
# collect, no new shuffle shape — so a "facet over 10^12 turns" costs one
# stream leaf + one aggregate exchange.


