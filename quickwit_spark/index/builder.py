"""Index build pipeline — DataFrame-native analog of the reference's
Indexer → Packager → Uploader → Publisher actor DAG
(quickwit-indexing/src/actors/*, SURVEY.md §2.3).

Dataflow (all declarative DataFrame ops + Arrow-batched pandas UDFs):

1. **Project & validate** (doc_from_json analog, default_mapper.rs:410-437):
   select/cast the transcript columns, count+drop invalid rows (missing
   required fast fields is a hard error in the reference → here the row is
   counted in ``invalid_docs`` and dropped; unknown input columns are
   silently ignored, matching default_mapper.rs:582-595 semantics).

2. **Split assignment + stable docID**: ``split_ord = pmod(xxhash64(conv_id),
   n_splits)`` keeps a conversation in one split and is a pure function of
   the data — never of task scheduling.  doc_id within a split is dense
   0..n-1 in (conv_id, turn_idx) order, computed WITHOUT a global sort:
   a conversation-level count + windowed prefix sum (conversation rows are
   ~40x fewer than turns) plus a per-conversation row_number.  This is the
   "stable docIDs across parallelism levels" requirement (SURVEY.md §7).

3. **Phase-1 segment build** (Indexer actor analog, indexer.rs): contiguous
   doc_id ranges form segments (``seg_id = doc_id // segment_num_docs_target``);
   ``groupBy(split, seg).applyInPandas`` tokenizes and builds per-segment
   posting lists, already delta+bitpacked.  This is map-side partial
   aggregation: the only shuffle that follows carries *compressed per-term
   blobs*, never raw (term, doc) pairs — which is what defuses hot-term
   (stopword-class) skew: a term with 30% document frequency contributes one
   small row per segment, not millions of shuffle rows.  Segments are the
   salt; phase 2 is the per-term reduce.

4. **Phase-2 split merge** (Packager's merge-to-one-segment analog,
   packager.rs:116-125): ``groupBy(split, field, term).applyInPandas``
   concatenates segment lists in seg order (doc_ids are already globally
   ascending because segments are contiguous doc ranges) and re-encodes,
   producing the final posting blob + block-max skip metadata
   (block_last_doc / block_max_tf / block_min_len) for WAND pruning.

5. **Publish** (Uploader/Publisher analog): parquet written per split dir
   (partitionBy split_id), split metadata staged then atomically published
   to the catalog with an overlap-rejecting checkpoint delta
   (checkpoint.rs:299-353 analog).  Readers only see Published splits, so a
   killed build leaves no visible partial state; resume skips finished
   splits via the checkpoint (FIXTURES.md F6).

Scale notes (100 TB / 1000 executors): every stage is embarrassingly
parallel over (split, segment); the two applyInPandas shuffles are keyed on
(split, seg) and (split, field, term) with compressed payloads; no
collect() touches doc-level data (only split-level metadata aggregates come
to the driver, one row per split).  Waves bound the failure blast radius
the way the reference publishes split-by-split.
"""

from __future__ import annotations

import os
import shutil
import time
from dataclasses import dataclass, field
from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

from ..config import IndexConfig
from ..functions.codec import (
    BLOCK,
    decode_positions,
    decode_postings,
    decode_u32_column,
    encode_positions,
    encode_postings,
    encode_u32_column,
)
from ..functions.tokenizer import tokenize_series
from .catalog import PUBLISHED, Catalog, SplitMetadata

# phase-1 (per-segment) postings rows — `lens` carries per-posting doc
# lengths so phase 2 can compute block_min_len without re-reading docs;
# block metadata is emitted here too so single-segment terms (the vast
# majority: singletons) pass through phase 2 without decode/re-encode
SEG_POSTINGS_SCHEMA = (
    "split_id string, seg_id long, field string, term string, doc_freq long, "
    "total_tf long, blob binary, positions binary, lens binary, "
    "block_last_doc array<long>, block_max_tf array<long>, block_min_len array<long>"
)

# `lens` stays in the final schema (per-posting doc lengths, the exact
# fieldnorm data tantivy co-locates with segments) so split merges can
# re-derive block_min_len without re-reading the doc store.  `bucket` is the
# stored term-hash bucket: the final table keeps its (split, bucket) shuffle
# distribution (parallel writes, no extra shuffle) and queries prune their
# scan to the buckets of the query terms via parquet min/max stats.
POSTINGS_SCHEMA = (
    "split_id string, bucket int, field string, term string, doc_freq long, "
    "total_tf long, blob binary, positions binary, lens binary, "
    "block_last_doc array<long>, block_max_tf array<long>, block_min_len array<long>"
)

# sentinel field name for the per-segment fastfield pseudo-rows emitted by
# phase 1 (column reuse: blob=doc_lens, positions=ts,
# block_last_doc=[base_doc, num_docs, ts_min, ts_max])
FF_FIELD = "__ff__"

FASTFIELDS_SCHEMA = (
    "split_id string, seg_id long, base_doc long, num_docs long, "
    "doc_lens binary, ts binary, ts_min long, ts_max long"
)

DOC_COLS = ["doc_id", "conv_id", "turn_idx", "role", "text", "tool", "ts", "ts_epoch"]


@dataclass
class BuildReport:
    index_dir: str
    build_id: str
    n_splits: int
    total_docs: int
    invalid_docs: int
    published_splits: list[str] = field(default_factory=list)
    skipped_splits: list[str] = field(default_factory=list)
    metrics: dict = field(default_factory=dict)


_TIMING = os.environ.get("QW_BUILD_TIMING", "") == "1"


class _Timer:
    """Opt-in stage timing (QW_BUILD_TIMING=1) written to stderr."""

    def __init__(self):
        self.t = time.monotonic()

    def lap(self, label: str) -> None:
        if _TIMING:
            now = time.monotonic()
            import sys

            print(f"[build-timing] {label}: {now - self.t:.2f}s", file=sys.stderr, flush=True)
            self.t = now


def _split_id(build_id: str, ord_: int) -> str:
    return f"{build_id}-{ord_:05d}"


def _paths(index_dir: str) -> dict[str, str]:
    return {
        "docs": os.path.join(index_dir, "docs"),
        "postings": os.path.join(index_dir, "postings"),
        "fastfields": os.path.join(index_dir, "fastfields"),
    }


def _cleanup_split_dirs(index_dir: str, split_ids: list[str]) -> None:
    """Remove data dirs of staged-but-unpublished splits before a retry
    (the GC-of-stale-staged-splits analog, garbage_collector.rs:56-146)."""
    for table, path in _paths(index_dir).items():
        for sid in split_ids:
            d = os.path.join(path, f"split_id={sid}")
            if os.path.exists(d):
                shutil.rmtree(d)


# ---------------------------------------------------------------------------
# pandas group functions (Arrow-batched; pure numpy/pandas inside)
# ---------------------------------------------------------------------------


def _flatten_tokens(doc_ids: np.ndarray, token_lists: pd.Series):
    """Explode token lists to flat (term, doc, pos) arrays, fully vectorized
    except the unavoidable list concat (tokens are Python strings)."""
    lens = token_lists.map(len).to_numpy(dtype=np.int64)
    total = int(lens.sum())
    if total == 0:
        return None
    flat_terms = np.empty(total, dtype=object)
    i = 0
    for lst in token_lists:
        n = len(lst)
        if n:
            flat_terms[i : i + n] = lst
            i += n
    doc_rep = np.repeat(doc_ids, lens)
    starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
    pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens)
    return flat_terms, doc_rep, pos


def _postings_from_flat(flat_terms, doc_rep, pos, lens_by_doc, base_doc, want_positions):
    """Group flat (term, doc, pos) into per-term posting rows.

    Sorting uses np.lexsort on integer codes (pd.factorize for terms) —
    no per-row Python in the grouping itself; the outer loop is per *term*.
    Yields (term, doc_ids, tfs, positions_flat | None, posting_doc_lens).
    """
    codes, uniques = pd.factorize(flat_terms, sort=True)
    order = np.lexsort((pos, doc_rep, codes))
    codes = codes[order]
    docs_s = doc_rep[order]
    pos_s = pos[order]

    # run-length boundaries of (term, doc)
    pair_change = np.empty(len(codes), dtype=bool)
    pair_change[0] = True
    pair_change[1:] = (codes[1:] != codes[:-1]) | (docs_s[1:] != docs_s[:-1])
    pair_starts = np.flatnonzero(pair_change)
    tfs_all = np.diff(np.concatenate((pair_starts, [len(codes)])))
    pair_docs = docs_s[pair_starts]
    pair_codes = codes[pair_starts]

    term_change = np.empty(len(pair_codes), dtype=bool)
    term_change[0] = True
    term_change[1:] = pair_codes[1:] != pair_codes[:-1]
    term_starts = np.flatnonzero(term_change)
    term_ends = np.concatenate((term_starts[1:], [len(pair_codes)]))
    # occurrence-level slice bounds per term
    occ_bounds = np.concatenate((pair_starts, [len(codes)]))

    for t_i, (s, e) in enumerate(zip(term_starts, term_ends)):
        term = uniques[pair_codes[s]]
        doc_ids = pair_docs[s:e].astype(np.uint32)
        tfs = tfs_all[s:e].astype(np.uint32)
        positions = pos_s[occ_bounds[s] : occ_bounds[e]].astype(np.uint32) if want_positions else None
        plens = lens_by_doc[(pair_docs[s:e] - base_doc).astype(np.int64)]
        yield term, doc_ids, tfs, positions, plens


def make_segment_builder(config: IndexConfig) -> Callable[[pd.DataFrame], pd.DataFrame]:
    """Phase-1: one (split, segment) group → per-term segment posting rows
    PLUS one fastfield pseudo-row (field=FF_FIELD) carrying the segment's
    packed doc-length + timestamp columns — the Indexer+fastfield-writer in
    one pass over the docs, tokenizing each document exactly once."""
    text_fields = [(m.name, m.record == "position", m.tokenizer) for m in config.indexed_text_fields]

    def build_segment(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        split_id = pdf["split_id"].iloc[0]
        seg_id = int(pdf["seg_id"].iloc[0])
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        base_doc = int(doc_ids[0])
        span = int(doc_ids[-1]) - base_doc + 1
        rows = []
        text_lens = np.zeros(span, np.uint32)  # doc_len fast field (text tokens)
        for fname, want_pos, tok in text_fields:
            if tok == "default":
                token_lists = tokenize_series(pdf[fname])
                lens_by_doc = np.zeros(span, np.uint32)
                lens_by_doc[doc_ids - base_doc] = token_lists.map(len).to_numpy(np.uint32)
                if fname == "text":
                    text_lens = lens_by_doc
            else:  # raw: whole value = one term, field length 1
                vals = pdf[fname].fillna("")
                token_lists = vals.map(lambda v: [v] if v != "" else [])
                lens_by_doc = np.zeros(span, np.uint32)
                lens_by_doc[doc_ids - base_doc] = (vals != "").to_numpy(np.uint32)
            flat = _flatten_tokens(doc_ids, token_lists)
            if flat is None:
                continue
            for term, d, t, p, plens in _postings_from_flat(*flat, lens_by_doc, base_doc, want_pos):
                blob, last_doc, max_tf = encode_postings(d, t)
                min_len = np.minimum.reduceat(plens, np.arange(0, len(d), BLOCK))
                rows.append(
                    (
                        split_id,
                        seg_id,
                        fname,
                        term,
                        len(d),
                        int(t.sum()),
                        blob,
                        encode_positions(p, t) if p is not None else None,
                        encode_u32_column(plens),
                        last_doc.astype(np.int64).tolist(),
                        max_tf.astype(np.int64).tolist(),
                        min_len.astype(np.int64).tolist(),
                    )
                )
        # fastfield pseudo-row (doc ids are dense in a split, so per-segment
        # arrays are indexed by doc offset; column reuse documented at FF_FIELD)
        ts = pdf["ts_epoch"].to_numpy(np.int64)
        rows.append(
            (
                split_id,
                seg_id,
                FF_FIELD,
                "",
                len(pdf),
                0,
                encode_u32_column(text_lens[doc_ids - base_doc]),
                encode_u32_column(ts.astype(np.uint32)),
                None,
                [base_doc, len(pdf), int(ts.min()), int(ts.max())],
                [],
                [],
            )
        )
        return pd.DataFrame(
            rows,
            columns=[
                "split_id", "seg_id", "field", "term", "doc_freq",
                "total_tf", "blob", "positions", "lens",
                "block_last_doc", "block_max_tf", "block_min_len",
            ],
        )

    return build_segment


def merge_bucket_segments(pdf: pd.DataFrame) -> pd.DataFrame:
    """Phase-2: one (split, term-hash bucket) → final rows for ALL its terms.

    Bucketing (instead of groupBy(term)) keeps the number of applyInPandas
    invocations small and constant: each call handles thousands of terms in
    a python loop over numpy group boundaries, so the per-group pandas/Arrow
    overhead is amortized ~10^4x.  Buckets also bound shuffle-partition skew:
    a hot term contributes one compressed row per segment, and terms are
    spread across buckets by hash.  Terms present in a single segment (the
    vast majority — singleton tokens) are passed through verbatim: their
    phase-1 blob + block metadata are already final because segment doc
    ranges are contiguous and ascending."""
    pdf = pdf.sort_values(["field", "term", "seg_id"], kind="mergesort")
    split_id = pdf["split_id"].iloc[0]
    bucket = int(pdf["bucket"].iloc[0])
    fields = pdf["field"].to_numpy()
    terms = pdf["term"].to_numpy()
    blobs = pdf["blob"].to_numpy()
    positions_col = pdf["positions"].to_numpy()
    lens_col = pdf["lens"].to_numpy()
    doc_freqs = pdf["doc_freq"].to_numpy()
    total_tfs = pdf["total_tf"].to_numpy()
    b_last = pdf["block_last_doc"].to_numpy()
    b_maxtf = pdf["block_max_tf"].to_numpy()
    b_minlen = pdf["block_min_len"].to_numpy()
    n = len(pdf)
    change = np.empty(n, dtype=bool)
    change[0] = True
    change[1:] = (fields[1:] != fields[:-1]) | (terms[1:] != terms[:-1])
    starts = np.flatnonzero(change)
    ends = np.concatenate((starts[1:], [n]))
    rows = []
    for s, e in zip(starts, ends):
        if e - s == 1:  # single-segment term: phase-1 row is already final
            rows.append(
                (split_id, bucket, fields[s], terms[s], int(doc_freqs[s]), int(total_tfs[s]),
                 blobs[s], positions_col[s], lens_col[s],
                 list(b_last[s]), list(b_maxtf[s]), list(b_minlen[s]))
            )
            continue
        want_pos = positions_col[s] is not None
        docs, tfs, lens, poss = [], [], [], []
        for i in range(s, e):
            d, t = decode_postings(blobs[i])
            docs.append(d)
            tfs.append(t)
            lens.append(decode_u32_column(lens_col[i]))
            if want_pos:
                poss.append(decode_positions(positions_col[i], t))
        d = np.concatenate(docs)
        t = np.concatenate(tfs)
        ln = np.concatenate(lens)
        blob, last_doc, max_tf = encode_postings(d, t)
        min_len = np.minimum.reduceat(ln, np.arange(0, len(d), BLOCK))
        positions = encode_positions(np.concatenate(poss), t) if want_pos else None
        rows.append(
            (split_id, bucket, fields[s], terms[s], int(len(d)), int(t.sum()),
             blob, positions, encode_u32_column(ln),
             last_doc.astype(np.int64).tolist(), max_tf.astype(np.int64).tolist(),
             min_len.astype(np.int64).tolist())
        )
    return pd.DataFrame(
        rows,
        columns=[
            "split_id", "bucket", "field", "term", "doc_freq", "total_tf", "blob",
            "positions", "lens", "block_last_doc", "block_max_tf", "block_min_len",
        ],
    )


def pack_fastfields(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per (split, segment): bitpack the fast-field columns (doc_len, ts).

    The fast-field analog of tantivy's columnar store: the per-split scorer
    reads exactly these small blobs instead of the doc store (warmup
    analog, leaf.rs:139-171)."""
    pdf = pdf.sort_values("doc_id")
    ts = pdf["ts_epoch"].to_numpy(np.int64)
    return pd.DataFrame(
        [
            (
                pdf["split_id"].iloc[0],
                int(pdf["seg_id"].iloc[0]),
                int(pdf["doc_id"].min()),
                len(pdf),
                encode_u32_column(pdf["doc_len"].to_numpy(np.uint32)),
                encode_u32_column(ts.astype(np.uint32)),
                int(ts.min()),
                int(ts.max()),
            )
        ],
        columns=["split_id", "seg_id", "base_doc", "num_docs", "doc_lens", "ts", "ts_min", "ts_max"],
    )


# ---------------------------------------------------------------------------
# the build driver
# ---------------------------------------------------------------------------


def project_and_validate(
    df: DataFrame, config: IndexConfig, passthrough: tuple[str, ...] = ()
) -> tuple[DataFrame, DataFrame]:
    """doc_from_json analog: returns (valid, invalid) DataFrames.

    Required-for-indexing columns (the fast/timestamp fields + the doc key)
    must be non-null (reference RequiredFastField error,
    default_mapper.rs:375-389); text may be null (field simply absent)."""
    cols = set(df.columns)
    for required in ("conv_id", "turn_idx", "ts"):
        if required not in cols:
            raise ValueError(f"input is missing required column {required}")
    ts_type = dict(df.dtypes)["ts"]
    ts_epoch = (
        F.col("ts").cast("long") if ts_type in ("bigint", "int", "long") else F.unix_timestamp("ts")
    )
    base = df.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.coalesce(F.col("role"), F.lit("")).alias("role") if "role" in cols else F.lit("").alias("role"),
        F.coalesce(F.col("text"), F.lit("")).alias("text") if "text" in cols else F.lit("").alias("text"),
        F.coalesce(F.col("tool"), F.lit("")).alias("tool") if "tool" in cols else F.lit("").alias("tool"),
        F.col("ts").cast("timestamp").alias("ts"),
        ts_epoch.alias("ts_epoch"),
        *[F.col(c) for c in passthrough],
    )
    valid_pred = (
        F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull() & F.col("ts_epoch").isNotNull()
    )
    return base.filter(valid_pred), base.filter(~valid_pred)


def assign_doc_ids(
    valid: DataFrame, n_splits: int, split_ord_expr: F.Column | None = None
) -> DataFrame:
    """Deterministic split + dense per-split docID, no global sort.

    split_ord = pmod(xxhash64(conv_id), n_splits) — a pure function of the
    key, so the same at local[8] and on 1000 executors.  The prefix sum runs
    over *conversation-level* rows (orders of magnitude smaller than turns),
    partitioned by split; per-turn rank is a window per conversation.
    ``split_ord_expr`` overrides the default hash assignment (demux merges
    cluster by tenant bin instead) — it must still be conversation-constant
    so a conversation never straddles splits."""
    if split_ord_expr is None:
        split_ord_expr = F.pmod(F.xxhash64("conv_id"), F.lit(n_splits)).cast("int")
    df = valid.withColumn("split_ord", split_ord_expr)
    conv = df.groupBy("split_ord", "conv_id").agg(F.count("*").alias("n_turns"))
    w = (
        Window.partitionBy("split_ord")
        .orderBy("conv_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    conv = conv.withColumn("conv_base", F.coalesce(F.sum("n_turns").over(w), F.lit(0)))
    wt = Window.partitionBy("conv_id").orderBy("turn_idx")
    return (
        df.join(conv.select("split_ord", "conv_id", "conv_base"), ["split_ord", "conv_id"])
        .withColumn("doc_id", (F.col("conv_base") + F.row_number().over(wt) - 1).cast("long"))
        .drop("conv_base")
    )


def _extract_tags(docs: DataFrame, config: IndexConfig) -> dict[str, list[str]]:
    """Per-split tag sets (packager.rs:210-247): '{field}:{value}' +
    presence marker '{field}!', only if distinct count <= cap."""
    tags: dict[str, list[str]] = {}
    for fname in config.tag_fields:
        rows = (
            docs.filter(F.col(fname) != "")
            .groupBy("split_id")
            .agg(F.collect_set(fname).alias("vals"))
            .collect()
        )
        for r in rows:
            if len(r["vals"]) <= config.max_values_per_tag_field:
                cur = tags.setdefault(r["split_id"], [])
                cur.extend(f"{fname}:{v}" for v in sorted(r["vals"]))
                cur.append(f"{fname}!")
    return tags


def build_index(
    spark: SparkSession,
    source_df: DataFrame,
    config: IndexConfig,
    index_dir: str,
    build_id: str = "b0",
    n_splits: int | None = None,
    wave_size: int | None = None,
    failpoint: Callable[[int], None] | None = None,
    split_ord_expr: F.Column | None = None,
    publish: bool = True,
    passthrough_cols: tuple[str, ...] = (),
) -> BuildReport:
    """Build (or resume) an index from a transcript-shaped DataFrame.

    Resumable: split membership is a pure function of (data, build_id,
    n_splits); already-published splits (checkpoint entries) are skipped and
    their input rows are filtered out before any heavy work (FIXTURES.md F6).
    ``failpoint`` is invoked after each wave publish — the test-injection
    analog of the reference's fail_point!() sites
    (quickwit-indexing/failpoints/mod.rs:20-49).
    """
    cat = Catalog.create(index_dir, config.to_dict())
    paths = _paths(index_dir)
    tm = _Timer()

    valid, invalid = project_and_validate(source_df, config, passthrough_cols)
    # error taxonomy analog (doc_mapper errors NotJson/RequiredFastField…,
    # default_mapper.rs:375-389 + indexer counters indexer.rs:38-62):
    # one aggregate classifies every dropped row by its first failing field
    inv_row = invalid.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("conv_id").isNull(), 1).otherwise(0)).alias("missing_conv_id"),
        F.sum(
            F.when(F.col("conv_id").isNotNull() & F.col("turn_idx").isNull(), 1).otherwise(0)
        ).alias("missing_turn_idx"),
        F.sum(
            F.when(
                F.col("conv_id").isNotNull()
                & F.col("turn_idx").isNotNull()
                & F.col("ts_epoch").isNull(),
                1,
            ).otherwise(0)
        ).alias("missing_timestamp"),
    ).collect()[0]
    invalid_count = int(inv_row["n"])
    invalid_by_reason = {
        k: int(inv_row[k] or 0)
        for k in ("missing_conv_id", "missing_turn_idx", "missing_timestamp")
    }
    tm.lap("validate:invalid_count")

    builds = cat._state.setdefault("builds", {})
    if build_id in builds:
        n_splits = builds[build_id]["n_splits"]
        total_docs = builds[build_id]["total_docs"]
    else:
        total_docs = valid.count()
        tm.lap("validate:total_count")
        if n_splits is None:
            n_splits = max(1, -(-total_docs // config.split_num_docs_target))
        builds[build_id] = {"n_splits": n_splits, "total_docs": total_docs}
        cat._save()

    checkpoint = cat.checkpoint()
    all_ords = list(range(n_splits))
    done_ords = [o for o in all_ords if _split_id(build_id, o) in checkpoint]
    todo_ords = [o for o in all_ords if o not in set(done_ords)]
    report = BuildReport(
        index_dir, build_id, n_splits, total_docs, invalid_count,
        skipped_splits=[_split_id(build_id, o) for o in done_ords],
    )
    if not todo_ords:
        return report

    assigned = assign_doc_ids(valid, n_splits, split_ord_expr)
    seg_target = config.segment_num_docs_target
    assigned = (
        assigned.withColumn("split_id", F.concat(F.lit(build_id + "-"), F.lpad(F.col("split_ord").cast("string"), 5, "0")))
        .withColumn("seg_id", (F.col("doc_id") / F.lit(seg_target)).cast("long"))
    )
    if len(todo_ords) < n_splits:
        assigned = assigned.filter(F.col("split_ord").isin(todo_ords))

    wave_size = wave_size or len(todo_ords)
    waves = [todo_ords[i : i + wave_size] for i in range(0, len(todo_ords), wave_size)]
    multi_wave = len(waves) > 1
    if multi_wave:
        assigned = assigned.persist()

    build_segment = make_segment_builder(config)
    try:
        for wave_idx, wave in enumerate(waves):
            wave_sids = [_split_id(build_id, o) for o in wave]
            _cleanup_split_dirs(index_dir, wave_sids)  # clear stale staged data
            wdf = assigned.filter(F.col("split_ord").isin(wave)) if multi_wave else assigned

            # 1) materialize the doc store FIRST (one pass through the
            # expensive lineage: validate → docID window/join → doc_len UDF),
            # then read it back so tokenize/fastfields/stats/tags all run off
            # parquet instead of recomputing the lineage per action.
            # (seg_id is a pure function of doc_id — recomputed after read.)
            (
                wdf.select(*DOC_COLS, "split_id")
                .repartition("split_id", "seg_id")
                .sortWithinPartitions("doc_id")
                .write.partitionBy("split_id")
                .mode("append")
                .parquet(paths["docs"])
            )
            tm.lap("write-docs")
            docs = (
                spark.read.parquet(paths["docs"])
                .filter(F.col("split_id").isin(wave_sids))
                .withColumn("seg_id", (F.col("doc_id") / F.lit(seg_target)).cast("long"))
            )

            # 2) phase 1+fastfields in ONE pass (tokenize once), materialized
            # to a temp dir so phase 2 / fastfield extraction / metrics never
            # recompute tokenization.
            segtmp = os.path.join(index_dir, f"_segtmp-{build_id}-{wave_idx}")
            (
                docs.groupBy("split_id", "seg_id")
                .applyInPandas(build_segment, SEG_POSTINGS_SCHEMA)
                .write.mode("overwrite")
                .parquet(segtmp)
            )
            tm.lap("phase1+write")
            seg_all = spark.read.parquet(segtmp)

            # 3) phase-2 reduce keyed on (split, hash-bucket of term): constant
            # invocation count + hot-term rows spread across buckets.  The
            # output keeps its (split, bucket) distribution — parallel sorted
            # writes, no extra shuffle; `bucket` is stored for query pruning.
            final_postings = (
                seg_all.filter(F.col("field") != FF_FIELD)
                .withColumn(
                    "bucket",
                    F.pmod(F.xxhash64("field", "term"), F.lit(config.term_merge_buckets)).cast("int"),
                )
                .groupBy("split_id", "bucket")
                .applyInPandas(lambda pdf: merge_bucket_segments(pdf), POSTINGS_SCHEMA)
            )
            (
                final_postings.sortWithinPartitions("split_id", "bucket", "field", "term")
                .write.partitionBy("split_id")
                .mode("append")
                .parquet(paths["postings"])
            )
            tm.lap("phase2+write")

            # 4) fastfields = the phase-1 pseudo-rows, re-shaped
            ff = seg_all.filter(F.col("field") == FF_FIELD).select(
                "split_id",
                "seg_id",
                F.col("block_last_doc")[0].alias("base_doc"),
                F.col("block_last_doc")[1].alias("num_docs"),
                F.col("blob").alias("doc_lens"),
                F.col("positions").alias("ts"),
                F.col("block_last_doc")[2].alias("ts_min"),
                F.col("block_last_doc")[3].alias("ts_max"),
            )
            ff.sortWithinPartitions("split_id", "seg_id").write.partitionBy(
                "split_id"
            ).mode("append").parquet(paths["fastfields"])
            tm.lap("fastfields")

            # split-level metadata (one row per split — driver-safe)
            stats = (
                docs.groupBy("split_id")
                .agg(
                    F.count("*").alias("num_docs"),
                    F.min("ts_epoch").alias("ts_min"),
                    F.max("ts_epoch").alias("ts_max"),
                )
                .collect()
            )
            tm.lap("stats:docs-agg")
            posted = spark.read.parquet(paths["postings"]).filter(
                F.col("split_id").isin(wave_sids)
            )
            pmetrics = {
                r["split_id"]: r.asDict()
                for r in posted.groupBy("split_id")
                .agg(
                    F.count("*").alias("num_terms"),
                    F.sum(F.length("blob")).alias("postings_bytes"),
                    F.sum("total_tf").alias("total_tokens"),
                )
                .collect()
            }
            # per-field length sums (BM25 avg_len): Σ field length == Σ tf
            flsums: dict[str, dict[str, int]] = {}
            for r in posted.groupBy("split_id", "field").agg(
                F.sum("total_tf").alias("s")
            ).collect():
                flsums.setdefault(r["split_id"], {})[r["field"]] = int(r["s"])
            tm.lap("stats:pmetrics")
            segs = {
                sid: rows
                for sid, rows in pd.DataFrame(
                    spark.read.parquet(paths["fastfields"])
                    .filter(F.col("split_id").isin(wave_sids))
                    .select("split_id", "seg_id", "num_docs")
                    .collect(),
                    columns=["split_id", "seg_id", "num_docs"],
                ).groupby("split_id")
            }
            tm.lap("stats+pmetrics+segs")
            tags = _extract_tags(docs, config)
            tm.lap("tags")

            delta = {}
            for r in stats:
                sid = r["split_id"]
                pm = pmetrics.get(sid, {})
                seg_rows = segs.get(sid)
                meta = SplitMetadata(
                    split_id=sid,
                    num_docs=r["num_docs"],
                    ts_min=r["ts_min"],
                    ts_max=r["ts_max"],
                    tags=tags.get(sid, []),
                    field_len_sums=flsums.get(sid, {}),
                    metrics={
                        "num_terms": int(pm.get("num_terms", 0)),
                        "postings_bytes": int(pm.get("postings_bytes", 0)),
                        "total_tokens": int(pm.get("total_tokens", 0)),
                        "segments": (
                            seg_rows[["seg_id", "num_docs"]].to_dict("records")
                            if seg_rows is not None
                            else []
                        ),
                    },
                )
                cat.stage_split(meta)
                delta[sid] = (None, f"built:{r['num_docs']:012d}")
            # splits hashed to a wave can be empty (no conv landed there):
            # still checkpoint them so resume treats them as done
            for sid in wave_sids:
                if sid not in delta:
                    delta[sid] = (None, "built:empty")
            if publish:
                cat.publish_splits([s for s in delta if s in cat._state["splits"]], delta)
            report.published_splits.extend(sorted(delta))
            shutil.rmtree(segtmp, ignore_errors=True)
            if failpoint is not None:
                failpoint(wave_idx)
    finally:
        if multi_wave:
            assigned.unpersist()

    report.metrics = {
        "splits": {s.split_id: s.metrics for s in cat.splits([PUBLISHED])},
        "invalid_docs": invalid_count,
        "invalid_by_reason": invalid_by_reason,
    }
    return report
