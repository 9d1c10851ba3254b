"""Adapter: run the fulltext engine over the driver's ``documents`` table
(/root/testdata/sf*/documents.parquet: doc_id, text, lang, source, n_chars).

The table is recast as transcript turns — the engine's canonical input
shape (BASELINE.json input_hint):

    conv_id  = lpad(doc_id, 12)   (lexicographic == numeric order)
    turn_idx = doc_id         (generic fast i64 field, sortable/exportable)
    role     = lang                (raw-tokenized tag field)
    tool     = source              (raw-tokenized)
    ts       = doc_id as epoch seconds  (deterministic fast field; the
               table has no real timestamp, so doc_id doubles as one,
               which also makes time-range pruning oracle-checkable)

Indexes are built once per (sf_dir, config version) into a /tmp cache and
reused across the driver's per-query invocations.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .config import documents_config
from .index.builder import build_index
from .index.catalog import Catalog

CACHE_ROOT = "/tmp/qwspark_index_cache"
# v7: per-field fieldnorm blobs for ALL indexed fields (raw/typed value
# counts included) — BM25 + WAND bounds read doc_lens_<field>
# v6: generic DocMapper schemas — doc-store column order is config-derived
# and fastfields may carry per-field doc_lens_* columns
# v5: term-stats LSM (termstats sidecars + publish deltas) — old caches
# lack the deltas and would fall back to the O(splits) doc_freq scan.
# v4: turn_idx carries doc_id (generic fast-field sort is oracle-checkable);
# fastfields table gained ff_turn_idx.
# v3: single-job in-task build, crc32 term buckets (was xxhash64 — stale
# caches would silently mis-prune the postings scan)
# v8: postings carry block_tf_cum positions skip data
# v9: big positions payloads chunked into fetchable rows
# v10: per-split term-presence Bloom sidecars
CONFIG_VERSION = "v12"  # v12: chunked pos_bm bitmaps (df ceiling lifted)


def documents_as_transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return docs.select(
        F.lpad(F.col("doc_id").cast("string"), 12, "0").alias("conv_id"),
        F.col("doc_id").cast("int").alias("turn_idx"),
        F.col("lang").alias("role"),
        F.col("text"),
        F.col("source").alias("tool"),
        F.timestamp_seconds(F.col("doc_id")).alias("ts"),
    )


def documents_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (or reuse) the documents index for an sf dir; returns index_dir."""
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}:{CONFIG_VERSION}".encode()).hexdigest()[:12]
    final = os.path.join(CACHE_ROOT, f"docs-{key}")
    if Catalog.exists(final):
        return final
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = final + f".build-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    cfg = documents_config()
    build_index(spark, documents_as_transcripts(spark, sf_dir), cfg, tmp)
    if Catalog.exists(final):  # lost a race
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        try:
            os.replace(tmp, final)
        except OSError:
            # another process published `final` between the exists() check
            # and the rename (os.replace onto a non-empty dir raises);
            # their copy is equivalent — drop ours
            shutil.rmtree(tmp, ignore_errors=True)
    return final


def documents_split_indexes(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    """TWO disjoint half-corpus indexes (doc_id parity) — the multi-index
    aggregation gate's fixture: their union is exactly documents_index's
    corpus, so the single-corpus SQL twins remain valid oracles for
    queries that aggregate across both indexes."""
    dirs = []
    src = documents_as_transcripts(spark, sf_dir)
    for parity in (0, 1):
        key = hashlib.md5(
            f"{os.path.abspath(sf_dir)}:{CONFIG_VERSION}:half{parity}".encode()
        ).hexdigest()[:12]
        final = os.path.join(CACHE_ROOT, f"docs-{key}")
        if not Catalog.exists(final):
            os.makedirs(CACHE_ROOT, exist_ok=True)
            tmp = final + f".build-{os.getpid()}"
            shutil.rmtree(tmp, ignore_errors=True)
            build_index(
                spark,
                src.filter(F.col("turn_idx") % 2 == parity),
                documents_config(),
                tmp,
            )
            if Catalog.exists(final):  # lost a race
                shutil.rmtree(tmp, ignore_errors=True)
            else:
                try:
                    os.replace(tmp, final)
                except OSError:
                    shutil.rmtree(tmp, ignore_errors=True)
        dirs.append(final)
    return dirs[0], dirs[1]


# the general-DocMapper gate index: documents re-serialized as NDJSON with a
# NESTED object field, parsed/validated by the mapper, typed i64 term index
GENERIC_MAPPER_DICT = {
    "field_mappings": [
        {"name": "ext_id", "type": "i64", "fast": True, "stored": True, "indexed": False},
        {"name": "text", "type": "text", "record": "position"},
        {"name": "lang", "type": "text", "tokenizer": "raw"},
        {"name": "n_chars", "type": "i64", "fast": True, "indexed": True},
        {
            "name": "meta",
            "type": "object",
            "field_mappings": [{"name": "source", "type": "text", "tokenizer": "raw"}],
        },
    ],
    "default_search_fields": ["text"],
}


def documents_generic_index(spark: SparkSession, sf_dir: str) -> str:
    """Build (or reuse) a GENERIC-schema index over the documents table: rows
    are re-serialized as NDJSON (nested ``meta.source``), then parsed,
    validated, and indexed by the general DocMapper — the full
    non-transcript path under the driver's correctness gate."""
    from .docmapper import DocMapper
    from .index.generic import build_index_from_ndjson

    key = hashlib.md5(
        f"{os.path.abspath(sf_dir)}:generic:{CONFIG_VERSION}".encode()
    ).hexdigest()[:12]
    final = os.path.join(CACHE_ROOT, f"docs-gen-{key}")
    if Catalog.exists(final):
        return final
    os.makedirs(CACHE_ROOT, exist_ok=True)
    tmp = final + f".build-{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    nd = docs.select(
        F.to_json(
            F.struct(
                F.col("doc_id").alias("ext_id"),
                "text",
                "lang",
                "n_chars",
                F.struct(F.col("source").alias("source")).alias("meta"),
            )
        ).alias("value")
    )
    mapper = DocMapper.from_dict(GENERIC_MAPPER_DICT)
    build_index_from_ndjson(
        spark, nd, mapper, tmp, index_id="documents-generic", split_num_docs_target=2_000
    )
    if Catalog.exists(final):  # lost a race
        shutil.rmtree(tmp, ignore_errors=True)
    else:
        try:
            os.replace(tmp, final)
        except OSError:
            # another process published `final` between the exists() check
            # and the rename (os.replace onto a non-empty dir raises);
            # their copy is equivalent — drop ours
            shutil.rmtree(tmp, ignore_errors=True)
    return final
