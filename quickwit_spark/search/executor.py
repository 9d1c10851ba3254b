"""Distributed search path — the Spark-native analog of the reference's
root/leaf search (quickwit-search/src/root.rs, leaf.rs, collector.rs).

Plan shape (mirrors SURVEY.md §3.1; as built):

1. **Plan / prune** (list_relevant_splits analog, lib.rs:129-149): the
   split catalog (cached per file state) is filtered driver-side by
   state=Published, time-range overlap and the tag predicate extracted
   from the query AST (tag_pruning.rs:47-51).  Global BM25 stats come
   from the catalog (N, avg_len) and the term-stats LSM (doc_freq —
   O(publish batches), not O(splits)).  No Spark job is launched.

2. **Leaf search** (leaf.rs:237-285 / collector.rs): ONE plain-RDD
   ``sc.parallelize(bins).flatMap`` job over LPT-balanced split bins (see
   ``_leaf_bins``; the SearchJob list of root.rs:280-284).  Each task
   opens its splits with worker-cached pyarrow handles, reads exactly the
   query terms' posting rows (bucket + row-group pruned — the warmup
   analog, leaf.rs:125-193) and the split's fast-field blobs, then runs
   the vectorized numpy scorer: boolean set ops on decoded doc arrays
   (AND = sorted intersect with block skips, OR = union, NOT = setdiff),
   phrase verification via positions, per-doc timestamp filtering with
   whole-segment skips (filters.rs:64-66 analog), BM25 with *global*
   collection stats, block-max WAND for single-term queries, and
   per-split top-(offset+k) selection — the offset rewrite of
   root.rs:286-301.  Leaves return bare (split_id, doc_id, score) hits;
   a split that vanished mid-query fails the query (root.rs:179-188)
   after one re-plan retry.

3. **Root merge** (merge_fruits analog, collector.rs:283-302): the driver
   sorts <= splits*(offset+k) tiny rows with the reference tie-break and
   pages.

4. **Fetch docs** (fetch_docs.rs analog): stored fields are read for ONLY
   the final page via row-group-pruned pyarrow reads of the doc store.

Data-scale work (stream export, every-matching-doc paths) stays on
DataFrames/mapInPandas.  At 100 TB the only data-sized work is step 2,
which reads a few posting rows per split; everything the driver touches
is O(splits + k).
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

HITS_SCHEMA = "split_id string, doc_id long, score double, sort_value long, split_num_hits long"

# topk mode fetches the winners' stored fields inside the leaf task (one job
# per query instead of leaf + fetch): per split only offset+k docs are read,
# pruned to row groups by doc_id min/max stats.  The fetched column set is
# config-derived (generic DocMapper schemas carry their own stored leaves).
_PLUMBING_SPARK = {"doc_id": "long", "conv_id": "string", "turn_idx": "int", "ts_epoch": "long"}


def fetch_cols(config: IndexConfig) -> list[str]:
    """Stored columns returned with every hit: all doc-store columns except
    the raw timestamp (ts_epoch carries it)."""
    return [c for c in config.doc_cols() if c != "ts"]


def _fetch_ddl(config: IndexConfig, include_doc_id: bool) -> str:
    from ..index.builder import spark_field_type

    by_name = config.fields
    parts = []
    for c in fetch_cols(config):
        if c == "doc_id" and not include_doc_id:
            continue
        t = _PLUMBING_SPARK.get(c) or spark_field_type(by_name[c])
        parts.append(f"`{c}` {t}")
    return ", ".join(parts)


def fetched_hits_schema(config: IndexConfig) -> str:
    return HITS_SCHEMA + ", " + _fetch_ddl(config, include_doc_id=False)


def _fetch_doc_fields(
    index_dir: str, split_id: str, doc_ids, cols: list[str]
) -> pd.DataFrame:
    """Doc-store read of a split's winning docs (fetch_docs.rs analog):
    pyarrow dataset over the split dir with a doc_id filter — docs files are
    doc_id-sorted in 8k-row groups, so row-group statistics prune to a
    handful of groups.  Dataset handles are cached per split (immutable)."""
    import pyarrow.dataset as pads

    hc = _cached_hotcache(index_dir, split_id)
    if hc is not None:
        return _hotcache_fetch_docs(hc, storage_for(index_dir), doc_ids, cols)
    dset = _cached_docs_dataset(index_dir, split_id)
    if dset is None:
        return pd.DataFrame(columns=cols)
    try:
        table = dset.to_table(
            columns=cols,
            filter=pads.field("doc_id").isin([int(x) for x in doc_ids]),
        )
    except FileNotFoundError as e:
        # the dataset handle was built from a file listing that a
        # concurrent merge-replace + GC has since deleted — surface the
        # vanished-split protocol so the root re-plans (root.rs:179-188)
        raise SplitVanishedError(
            f"split vanished during doc fetch: {split_id}"
        ) from e
    return table.to_pandas()


def _hotcache_fetch_docs(hc, st, doc_ids, cols: list[str]) -> pd.DataFrame:
    """Doc-store fetch through the hotcache's cached footers: doc_id
    row-group stats prune (files are doc_id-sorted in 8k-row groups), the
    selected groups are ranged-read with column projection — zero LISTs
    and zero footer GETs."""
    import pyarrow as pa
    import pyarrow.compute as pc

    ids = sorted({int(x) for x in doc_ids})
    read_cols = cols if "doc_id" in cols else [*cols, "doc_id"]
    parts = []
    for name, _size in hc.files("docs"):
        try:
            pf = hc.parquet_file(st, "docs", name)
            md = pf.metadata
            idx = {md.schema.column(j).name: j for j in range(md.num_columns)}
            groups = []
            for g in range(md.num_row_groups):
                mm = _stat_minmax(md.row_group(g).column(idx["doc_id"]).statistics)
                if mm is not None and not any(mm[0] <= i <= mm[1] for i in ids):
                    continue
                groups.append(g)
            if not groups:
                continue
            tbl = pf.read_row_groups(groups, columns=read_cols)
        except (FileNotFoundError, OSError) as e:
            raise SplitVanishedError(
                f"split vanished during doc fetch: {hc.split_id}"
            ) from e
        tbl = tbl.filter(pc.is_in(tbl.column("doc_id"), value_set=pa.array(ids)))
        parts.append(tbl.select(cols).to_pandas())
    if not parts:
        return pd.DataFrame(columns=cols)
    return parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)


@dataclass
class SearchResponse:
    num_hits: int
    hits: list[dict]
    elapsed_time_micros: int


class SplitVanishedError(RuntimeError):
    """A split planned for this query disappeared before its leaf read —
    a concurrent merge replace + GC raced the query.  The reference FAILS a
    query on any failed split rather than silently dropping its hits
    (root.rs:179-188); the root here re-plans once against the fresh
    catalog (the retry-on-other-node analog, retry/search.rs) and
    propagates if the retry fails too."""


_CATALOG_CACHE: dict = {}


def open_index(spark: SparkSession, index_dir: str) -> tuple[Catalog, IndexConfig]:
    """Catalog + config, cached per catalog-file state: at 10^4 splits the
    catalog JSON is megabytes, and re-parsing it (plus re-validating the
    config) on EVERY query would eat ~tens of ms of driver time.  The
    backend state token (file mtime/size, or the sqlite revision) makes
    publish/merge/GC invalidate naturally — the same trick as the
    scan/gstats caches."""
    state = Catalog.state_token(index_dir)
    if state is None:
        raise FileNotFoundError(f"no index at {index_dir} (missing catalog)")
    key = (index_dir, state)
    hit = _CATALOG_CACHE.get(key)
    if hit is None:
        cat = Catalog(index_dir)
        if cat.config_dict is None:
            raise FileNotFoundError(f"no index at {index_dir} (missing catalog)")
        hit = (cat, IndexConfig.from_dict(cat.config_dict))
        for k in [k for k in _CATALOG_CACHE if k[0] == index_dir]:
            _CATALOG_CACHE.pop(k)  # drop older states of this index
        _CATALOG_CACHE[key] = hit
        while len(_CATALOG_CACHE) > 256:
            _CATALOG_CACHE.pop(next(iter(_CATALOG_CACHE)))
    return hit


def resolve_sort(request: SearchRequest, config: IndexConfig) -> SearchRequest:
    """Index-level default sort (doc_mapper.rs:61-63): a request without an
    explicit sort uses the index's declared sort_by field; absent both, BM25
    relevance (north rule — the reference's DocId order is the tiebreak)."""
    if request.sort_by_field is None and config.sort_by_field is not None:
        request = _dc_replace(
            request,
            sort_by_field=config.sort_by_field,
            sort_asc=config.sort_by_order == "asc",
        )
    # the timestamp field's fast values live in the ts plumbing column
    # (epoch seconds) rather than a ff_<name> column
    if (
        request.sort_by_field is not None
        and request.sort_by_field == config.timestamp_field
    ):
        request = _dc_replace(request, sort_by_field="ts")
    # the sort contract is integer-class fast fields (reference u64,
    # collector.rs:47-64) — f64 would be silently truncated downstream
    # f64 fast fields sort through the monotonic int64 key (f64_sort_keys
    # — tantivy's f64↔u64 mapping); cursors would need the raw key on the
    # wire, so search_after is rejected there rather than mis-compared
    if (
        request.sort_by_field in config.extra_fast_float_fields
        and request.search_after is not None
    ):
        raise ValueError(
            f"search_after is not supported on f64 sort field "
            f"{request.sort_by_field!r} (cursor values are integer sort keys)"
        )
    # reject unknown names driver-side: an unvalidated field would fail
    # executor-side with an opaque Py4J traceback (and a dropped REST
    # connection) instead of a 400
    if (
        request.sort_by_field is not None
        and request.sort_by_field not in ("ts", "doc_len")
        and request.sort_by_field not in config.extra_fast_fields
        and request.sort_by_field not in config.extra_fast_float_fields
    ):
        raise ValueError(
            f"unknown sort fast field {request.sort_by_field!r}: declared "
            f"fast fields are {sorted(('doc_len', config.timestamp_field or 'ts') + config.extra_fast_fields + config.extra_fast_float_fields)}"
        )
    return request


def _resolve_numeric_filters(config: IndexConfig, request: SearchRequest):
    """Validate request.numeric_filters and convert them to the leaf's
    int64-key space: i64/u64/date fast fields take integer bounds as-is;
    f64 fast fields take numeric bounds mapped through f64_sort_keys (the
    strictly monotonic mapping makes [key(lo), key(hi)) select exactly
    v ∈ [lo, hi)).  Returns ((field, lo_key, hi_key), ...) or ()."""
    if not request.numeric_filters:
        return ()
    out = []
    for f_, lo, hi in request.numeric_filters:
        if f_ == config.timestamp_field or f_ == "ts":
            raise ValueError(
                "filter the timestamp via startTimestamp/endTimestamp, not "
                f"numericFilter ({f_!r})"
            )
        if f_ in config.extra_fast_float_fields:
            lo_k = int(f64_sort_keys(np.array([float(lo)]))[0]) if lo is not None else None
            hi_k = int(f64_sort_keys(np.array([float(hi)]))[0]) if hi is not None else None
        elif f_ in config.extra_fast_fields or f_ == "doc_len":
            for b in (lo, hi):
                if b is not None and not isinstance(b, int):
                    raise ValueError(
                        f"numericFilter bounds for integer fast field {f_!r} "
                        f"must be integers (got {b!r})"
                    )
            lo_k, hi_k = lo, hi
        else:
            raise ValueError(
                f"numericFilter field {f_!r} is not a declared fast field "
                f"(fast fields: {sorted(('doc_len',) + config.extra_fast_fields + config.extra_fast_float_fields)})"
            )
        out.append((f_, lo_k, hi_k))
    return tuple(out)


def _apply_numeric_filters(
    docs: np.ndarray, ff_pdf: pd.DataFrame, lens: np.ndarray, filters
) -> np.ndarray:
    """Exact per-doc mask over the split's fast-field columns (the generic
    twin of _ts_filter's per-doc path; bounds are already in key space)."""
    for f_, lo, hi in filters:
        if len(docs) == 0:
            break
        vals = _fast_field_values(f_, ff_pdf, lens, docs)
        m = np.ones(len(docs), bool)
        if lo is not None:
            m &= vals >= lo
        if hi is not None:
            m &= vals < hi
        docs = docs[m]
    return docs


def prune_splits(
    cat: Catalog, config: IndexConfig, ast, request: SearchRequest
) -> list[SplitMetadata]:
    """Driver-side split pruning: time-range overlap (lib.rs:100-119) + tag
    predicate (tag_pruning.rs) + numeric-filter field_ranges stats over the
    published-split catalog."""
    splits = cat.splits()
    lo, hi = request.start_timestamp, request.end_timestamp
    if lo is not None:
        splits = [s for s in splits if s.ts_max is None or s.ts_max >= lo]
    if hi is not None:
        splits = [s for s in splits if s.ts_min is None or s.ts_min < hi]
    for f_, f_lo, f_hi in request.numeric_filters or ():
        # RAW-value comparison against the per-split [min, max] stats;
        # splits without recorded stats (legacy) cannot be pruned
        splits = [
            s
            for s in splits
            if f_ not in s.field_ranges
            or (
                (f_lo is None or s.field_ranges[f_][1] >= f_lo)
                and (f_hi is None or s.field_ranges[f_][0] < f_hi)
            )
        ]
    pred = extract_tag_predicate(ast, config.tag_fields)
    return [s for s in splits if pred(set(s.tags), bool(s.tags))]


_BUCKET_CACHE: dict = {}
_GSTATS_CACHE: dict = {}


def term_buckets(
    spark: SparkSession, terms: set[tuple[str, str]], n_buckets: int
) -> list[int]:
    """Stored-bucket values of the query terms (computed locally with the
    same ``term_bucket`` hash the build task used — no JVM round trip).
    Lets the postings scan prune row groups via parquet min/max stats on the
    `bucket` column — the warmup/'read exactly what the query needs' analog
    (leaf.rs:125-193) at the storage layer."""
    from ..functions.codec import term_bucket

    return sorted({term_bucket(f_, t_, n_buckets) for f_, t_ in terms})


_SCAN_DF_CACHE: dict = {}


def _table_scan(spark: SparkSession, index_dir: str, table: str):
    """Cached parquet scan per (index_dir, table, catalog state) — the
    split-footer-cache analog (leaf.rs:47-55): ``spark.read.parquet`` lists
    every split dir and reads footers eagerly (~1s on a few hundred
    splits), which would otherwise be paid on every use.  Only data-scale
    DataFrame paths use this (export_stream's partition-by join); the leaf
    search reads split files directly with worker-side pyarrow.
    Invalidated whenever the catalog changes (publish/merge/GC add or
    drop split dirs)."""
    st = storage_for(index_dir)
    state = Catalog.state_token(index_dir)
    key = (index_dir, table, state)
    if key not in _SCAN_DF_CACHE:
        for k in [k for k in _SCAN_DF_CACHE if k[:2] == (index_dir, table)]:
            _SCAN_DF_CACHE.pop(k)  # drop scans of older catalog states
        _SCAN_DF_CACHE[key] = spark.read.parquet(
            st.spark_url(os.path.join(index_dir, table))
        )
        if len(_SCAN_DF_CACHE) > 256:
            _SCAN_DF_CACHE.pop(next(iter(_SCAN_DF_CACHE)))
    return _SCAN_DF_CACHE[key]


def _stats_files(index_dir: str, cat: Catalog) -> list[str]:
    """Global term-dictionary source files: the term-stats LSM deltas
    (O(publish batches since the last merge), independent of split count)
    or, for indexes published without deltas, every split's postings files
    (O(splits), column/row-group-pruned).  Retries once against a fresh
    catalog when a concurrent compaction swapped the delta list between
    the catalog read and the file read; a SECOND miss is real corruption
    and raises."""
    from ..index.builder import _expand_parquet_paths

    delta_files = cat.termstats_files()
    if delta_files is not None:
        try:
            return _expand_parquet_paths(delta_files, strict=True)
        except FileNotFoundError:
            cat = Catalog(index_dir)
            delta_files = cat.termstats_files()
            if delta_files is not None:
                return _expand_parquet_paths(delta_files, strict=True)
    return [
        f
        for s in cat.splits()
        for f in _split_files(index_dir, "postings", s.split_id)
    ]


def _stats_table(index_dir: str, cat: Catalog, columns: list[str], cond) -> pd.DataFrame:
    """Filtered read over the term-dictionary stats files with ONE retry
    against a fresh catalog: a merge round compacts the LSM deltas (the
    file list changes and old delta files are deleted), so a read racing
    that compaction can hit FileNotFoundError between the listing and the
    parquet open — re-resolving the list once always lands on a committed
    state (delta lists commit atomically with the catalog)."""
    for attempt in (0, 1):
        files = _stats_files(index_dir, cat)
        if not files:
            return pd.DataFrame(columns=columns)
        dkey = ("gstats-dset", tuple(files))
        dset = _GSTATS_CACHE.get(dkey)
        if dset is None:
            dset = storage_for(index_dir).dataset(files)
            _GSTATS_CACHE[dkey] = dset
        use_cond = cond
        if "chunk_ord" in dset.schema.names:
            # postings-file fallback: positions-chunk rows are not
            # dictionary entries
            import pyarrow.dataset as pads

            cc = (pads.field("chunk_ord") == 0) | pads.field("chunk_ord").is_null()
            use_cond = cc if cond is None else (cond & cc)
        try:
            return dset.to_table(columns=columns, filter=use_cond).to_pandas()
        except FileNotFoundError:
            _GSTATS_CACHE.pop(dkey, None)
            if attempt:
                raise
            cat = Catalog(index_dir)
    raise AssertionError("unreachable")


def global_term_stats(
    spark: SparkSession,
    index_dir: str,
    cat: Catalog,
    terms: set[tuple[str, str]],
    buckets: list[int] | None = None,
) -> dict:
    """Whole-index collection stats for BM25: N, per-field avg_len (from the
    catalog) and global doc_freq per (field, term) — one tiny aggregate over
    the term-dictionary rows of all published splits.  df is cached per
    (index state, term) — the split-footer/fast-field cache analog
    (leaf.rs:47-55), invalidated whenever the catalog changes."""
    cat_state = Catalog.state_token(index_dir)
    stats = cat.global_stats()
    # per-TERM cache (not per-query): "deploy" then "deploy AND failure"
    # reads only the new term's df; invalidated with the catalog state
    df_map: dict[tuple[str, str], int] = {}
    missing: set[tuple[str, str]] = set()
    for t in terms:
        hit = _GSTATS_CACHE.get((index_dir, cat_state, t))
        if hit is None:
            missing.add(t)
            df_map[t] = 0
        else:
            df_map[t] = hit
    terms = missing
    if terms:
        # Driver-side pyarrow read, NOT a Spark job: the global doc_freq of a
        # handful of query terms is metadata-scale, and launching a Spark
        # stage for it costs ~300-500 ms — the dominant first-query cost.
        # Primary source: the term-stats LSM deltas (O(publish batches since
        # the last merge) bucket-pruned files — independent of split count,
        # which is what keeps this driver-cheap at 10^4 splits / 100 TB).
        # Fallback for indexes published without deltas: the per-split
        # posting-dictionary rows, O(splits) but column/row-group-pruned.
        import pyarrow.dataset as pads

        cond = None
        for f_, t_ in terms:
            c = (pads.field("field") == f_) & (pads.field("term") == t_)
            cond = c if cond is None else (cond | c)
        if buckets:
            cond = pads.field("bucket").isin(buckets) & cond
        if cond is not None:
            pdf = _stats_table(index_dir, cat, ["field", "term", "doc_freq"], cond)
            if len(pdf):
                for (f_, t_), df_sum in pdf.groupby(["field", "term"])["doc_freq"].sum().items():
                    if (f_, t_) in df_map:
                        df_map[(f_, t_)] = int(df_sum)
    for t in terms:
        _GSTATS_CACHE[(index_dir, cat_state, t)] = df_map[t]
    while len(_GSTATS_CACHE) > 4096:
        _GSTATS_CACHE.pop(next(iter(_GSTATS_CACHE)))
    return {"num_docs": stats["num_docs"], "avg_len": stats["avg_len"], "df": df_map}


def _lev_within(a: str, b: str, d: int) -> bool:
    """Classic Levenshtein distance(a, b) <= d, with length prefilter and
    row-minimum early exit — runs on the (anchored) candidate term set of a
    fuzzy expansion, never the whole corpus."""
    if abs(len(a) - len(b)) > d:
        return False
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i] + [0] * len(b)
        mn = cur[0]
        for j, cb in enumerate(b, 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            if cur[j] < mn:
                mn = cur[j]
        if mn > d:
            return False
        prev = cur
    return prev[-1] <= d


def _prefix_upper(p: str) -> str | None:
    """Smallest string > every string with prefix ``p`` (for a dictionary
    range read [p, upper)), or None when the last char is the maximum code
    point (then the scan is unbounded above and the startswith re-check
    below does the filtering)."""
    for i in range(len(p) - 1, -1, -1):
        if ord(p[i]) < 0x10FFFF:
            return p[:i] + chr(ord(p[i]) + 1)
    return None


def expand_prefixes(spark: SparkSession, index_dir: str, cat: Catalog, ast):
    """Rewrite every PrefixQuery into a scored disjunction of the index's
    matching dictionary terms — Lucene's ``scoring_boolean`` multi-term
    rewrite (each expanded term keeps the prefix clause's boost and is
    BM25-scored normally, so a pure prefix query runs MaxScore like any
    other term disjunction and every downstream stage — warmup, pruning,
    oracle comparison — sees only ordinary Term/Bool nodes).

    Expansion reads the global term dictionary (the term-stats LSM deltas,
    O(publish batches) driver-side pyarrow — the same source global doc_freq
    comes from) with a [prefix, prefix+1) range condition, and the summed
    doc_freq of each matched term seeds the df cache so planning costs ONE
    stats read, not two.  More than QW_PREFIX_MAX_EXPANSIONS (default 1024)
    distinct terms is a loud error — Lucene's too_many_clauses analog;
    predictable failure beats silently truncated results.  A prefix that
    matches nothing becomes a match-nothing clause."""
    # ("p", field, prefix) | ("f", field, term, dist)
    # | ("w", field, pattern) | ("r", field, pattern)
    wanted: list[tuple] = []

    def find(n):
        if isinstance(n, (PrefixQuery, PhrasePrefixQuery)):
            wanted.append(("p", n.field, n.prefix))
        elif isinstance(n, FuzzyQuery):
            wanted.append(("f", n.field, n.term, n.distance))
        elif isinstance(n, WildcardQuery):
            wanted.append(("w", n.field, n.pattern))
        elif isinstance(n, RegexQuery):
            wanted.append(("r", n.field, n.pattern))
        elif isinstance(n, BoolQuery):
            for c in (*n.must, *n.should, *n.must_not):
                find(c)

    find(ast)
    if not wanted:
        return ast
    import pyarrow.dataset as pads

    cap = int(os.environ.get("QW_PREFIX_MAX_EXPANSIONS", "1024"))
    plen = max(0, int(os.environ.get("QW_FUZZY_PREFIX_LEN", "1")))
    state = Catalog.state_token(index_dir)
    expansions: dict[tuple, tuple[str, ...]] = {}
    missing: list[tuple] = []
    for key in sorted(set(wanted)):
        hit = _GSTATS_CACHE.get((index_dir, state, "expand", key))
        if hit is not None:
            expansions[key] = hit
        else:
            missing.append(key)

    def _anchor(spec) -> str:
        """Dictionary-scan range anchor: the whole prefix for 'p' specs,
        the first QW_FUZZY_PREFIX_LEN chars for 'f' specs, the pattern's
        extractable literal prefix for 'w'/'r' specs ('' = full
        field-vocabulary scan)."""
        if spec[0] == "p":
            return spec[2]
        if spec[0] == "w":
            return wildcard_literal_prefix(spec[2])
        if spec[0] == "r":
            return regex_literal_prefix(spec[2])
        return spec[2][: min(plen, len(spec[2]))]

    if missing:
        cond = None
        for spec in missing:
            c = pads.field("field") == spec[1]
            a = _anchor(spec)
            if a:
                c = c & (pads.field("term") >= a)
                hi = _prefix_upper(a)
                if hi is not None:
                    c = c & (pads.field("term") < hi)
            cond = c if cond is None else (cond | c)
        pdf = _stats_table(index_dir, cat, ["field", "term", "doc_freq"], cond)
        for spec in missing:
            f_ = spec[1]
            if len(pdf):
                sub = pdf[(pdf["field"] == f_) & pdf["term"].str.startswith(_anchor(spec))]
            else:
                sub = pdf
            if spec[0] == "f" and len(sub):
                t_, d_ = spec[2], spec[3]
                keep = sub["term"].map(lambda x: _lev_within(x, t_, d_))
                sub = sub[keep]
            elif spec[0] == "w" and len(sub):
                rx = wildcard_regex(spec[2])
                sub = sub[sub["term"].map(lambda x: rx.fullmatch(x) is not None)]
            elif spec[0] == "r" and len(sub):
                rx = re.compile(spec[2])
                sub = sub[sub["term"].map(lambda x: rx.fullmatch(x) is not None)]
            if len(sub):
                agg = sub.groupby("term")["doc_freq"].sum()
                terms = tuple(sorted(t for t, d in agg.items() if int(d) > 0))
            else:
                agg, terms = {}, ()
            if len(terms) > cap:
                what = {
                    "p": f"prefix '{f_}:{spec[2]}*'",
                    "w": f"wildcard '{f_}:{spec[2]}'",
                    "r": f"regex '{f_}:/{spec[2]}/'",
                }.get(spec[0], f"fuzzy '{f_}:{spec[2]}~{spec[-1]}'")
                raise ValueError(
                    f"{what} expands to {len(terms)} dictionary "
                    f"terms (max {cap}; raise QW_PREFIX_MAX_EXPANSIONS to "
                    "allow more)"
                )
            expansions[spec] = terms
            _GSTATS_CACHE[(index_dir, state, "expand", spec)] = terms
            for t in terms:  # the LSM sums ARE the global doc_freqs
                _GSTATS_CACHE[(index_dir, state, (f_, t))] = int(agg[t])

    def rw(n):
        if isinstance(n, (PrefixQuery, FuzzyQuery, WildcardQuery, RegexQuery)):
            if isinstance(n, PrefixQuery):
                key = ("p", n.field, n.prefix)
            elif isinstance(n, FuzzyQuery):
                key = ("f", n.field, n.term, n.distance)
            elif isinstance(n, WildcardQuery):
                key = ("w", n.field, n.pattern)
            else:
                key = ("r", n.field, n.pattern)
            terms = expansions[key]
            if not terms:
                return BoolQuery()  # matches no documents
            if len(terms) == 1:
                return TermQuery(n.field, terms[0], boost=n.boost)
            return BoolQuery(
                should=[TermQuery(n.field, t, boost=n.boost) for t in terms]
            )
        if isinstance(n, PhrasePrefixQuery):
            # match_phrase_prefix → OR of full phrases, one per expansion;
            # each runs the ordinary rarest-first position verification
            terms = expansions[("p", n.field, n.prefix)]
            if not terms:
                return BoolQuery()
            alts = [
                PhraseQuery(n.field, (*n.terms, t), boost=n.boost) for t in terms
            ]
            return alts[0] if len(alts) == 1 else BoolQuery(should=alts)
        if isinstance(n, BoolQuery):
            return BoolQuery(
                must=[rw(c) for c in n.must],
                should=[rw(c) for c in n.should],
                must_not=[rw(c) for c in n.must_not],
            )
        return n

    return rw(ast)


def term_dictionary(
    spark: SparkSession,
    index_dir: str,
    field: str,
    prefix: str | None = None,
    limit: int = 100,
) -> list[dict]:
    """Global term-dictionary range scan — the tantivy FST range-scan /
    termdict API analog, surfaced to users (autocomplete backends, index
    introspection): terms of ``field``, optionally restricted to a prefix
    range, with their GLOBAL doc_freq, ascending by term, capped at
    ``limit``.  Driver-side pyarrow over the term-stats LSM (O(publish
    batches) files, independent of split count) — no Spark job."""
    cat, config = open_index(spark, index_dir)
    fm = config.fields.get(field)
    if fm is None:
        raise ValueError(f"field does not exist in schema: {field}")
    if not fm.is_indexed:
        raise ValueError(f"field is not indexed: {field}")
    if limit < 1:
        raise ValueError("limit must be >= 1")
    import pyarrow.dataset as pads

    cond = pads.field("field") == field
    if prefix:
        cond = cond & (pads.field("term") >= prefix)
        hi = _prefix_upper(prefix)
        if hi is not None:
            cond = cond & (pads.field("term") < hi)
    pdf = _stats_table(index_dir, cat, ["field", "term", "doc_freq"], cond)
    if prefix and len(pdf):
        pdf = pdf[pdf["term"].str.startswith(prefix)]
    if not len(pdf):
        return []
    agg = pdf.groupby("term")["doc_freq"].sum().sort_index()
    out = [
        {"term": str(t), "doc_freq": int(d)} for t, d in agg.items() if int(d) > 0
    ]
    return out[: int(limit)]


# ---------------------------------------------------------------------------
# the per-split scorer (runs inside applyInPandas — pure numpy)
# ---------------------------------------------------------------------------


# Per-worker phrase-path observability counters (judge-visible via the
# __counters__ leaf records -> take_phrase_counters(), surfaced in bench
# JSON): which verification path each phrase term took (index-time bitmap
# vs position decode) and how many chunk rows were actually fetched.  The
# leaf task snapshots before/after, so the deltas attribute to ONE query
# even though the dict is process-global.
_PHRASE_CTR = {
    "phrase_terms_bitmap": 0,   # terms verified via shift-AND bitmaps
    "phrase_terms_decode": 0,   # terms verified via position decode
    "bitmap_rows_inline": 0,    # bitmap reads served from the inline cell
    "bitmap_rows_chunked": 0,   # bitmap reads served from chunk rows
    "bm_chunk_fetches": 0,      # bitmap chunk rows fetched (cache misses)
    "pos_chunk_fetches": 0,     # positions chunk rows fetched (cache misses)
}

# root-side aggregate of the last _leaf_hit_rows job's counter records
LAST_PHRASE_COUNTERS: dict = {}


def take_phrase_counters() -> dict:
    """Aggregated phrase-path counters of the most recent top-k leaf job
    (driver-side; bench reads this after each phrase query to assert
    bitmap coverage instead of inferring it from latency)."""
    return dict(LAST_PHRASE_COUNTERS)


def _phrase_ctr() -> dict:
    """The LIVE counter dict, resolved through the module.  Leaf-task
    closures must use this accessor, not the global directly: cloudpickle
    captures plain globals BY VALUE into a nested function's pickled
    namespace, so a closure reading ``_PHRASE_CTR`` would diff its own
    frozen copy while the (by-reference) module functions increment the
    real one — measured as permanently-zero counters on the RDD leaf."""
    return _PHRASE_CTR


class _SplitPostings:
    """Decoded-on-demand posting lists of one split for the query terms.

    An optional ``[lo, hi)`` docID range restricts every consumer-visible
    doc list to that slice — the sub-split leaf unit (tantivy searches
    segments of one index in parallel; our analog is doc ranges of one
    split, planned by _leaf_bins for heavy queries on big merged splits).
    Decodes stay whole-row (vectorized, cheap); the SCORING work above
    this layer — BM25, top-k, phrase positions — sees only the slice."""

    def __init__(
        self,
        pdf: pd.DataFrame,
        lo: int | None = None,
        hi: int | None = None,
        source: tuple[str, str] | None = None,
    ):
        self.rows = {}
        for r in pdf.itertuples(index=False):
            self.rows[(r.field, r.term)] = r
        self.lo, self.hi = lo, hi
        # (index_dir, split_id) — lets positions_at lazily fetch CHUNKED
        # position payloads (big terms store positions as separate chunk
        # rows; see builder._split_chunked_positions)
        self.source = source
        self._raw_cache: dict[tuple[str, str], tuple[np.ndarray, np.ndarray]] = {}
        self._cache: dict[tuple[str, str], tuple[np.ndarray, np.ndarray]] = {}
        self._off: dict[tuple[str, str], int] = {}

    @staticmethod
    def _chunk_blocks(r) -> list | None:
        """The row's positions-chunk start blocks, or None (inline/absent).
        Guards the pandas NaN an absent column reads as."""
        cb = getattr(r, "pos_chunk_blocks", None)
        if cb is None or isinstance(cb, float):
            return None
        return list(cb)

    def has_positions(self, key) -> bool:
        r = self.rows.get(key)
        if r is None:
            return False
        return r.positions is not None or self._chunk_blocks(r) is not None

    @staticmethod
    def _bm_span(r) -> int | None:
        """Blocks per bitmap chunk of a chunked-bitmap row, else None."""
        s = getattr(r, "bm_chunk_span", None)
        if s is None or (isinstance(s, float) and np.isnan(s)):
            return None
        return int(s)

    def has_bitmap(self, key) -> bool:
        """Can ``bitmap_words`` serve this term — inline pos_bm cell of
        the right fixed-stride size, or chunked bitmaps with a fetchable
        source?  (False -> the phrase falls back to position decode.)"""
        r = self.rows.get(key)
        if r is None:
            return False
        bm = getattr(r, "pos_bm", None)
        if bm is not None and not isinstance(bm, float):
            return len(bm) == 16 * int(r.doc_freq)
        return self._bm_span(r) is not None and self.source is not None

    def bitmap_words(self, key, ranks: np.ndarray):
        """(lo, hi) uint64 position-bitmap word arrays of ``key`` at the
        given GLOBAL posting ranks — served from the inline pos_bm cell,
        or gathered from the bitmap CHUNK rows (chunk_ord <= -1; only the
        chunks the ranks fall in are fetched, so a candidate-gated phrase
        on a df-5M stopword reads KBs, not the 80 MB whole-list cell the
        retired df ceiling used to forbid).  None -> no usable bitmap;
        the caller takes the decode path, which is always authoritative."""
        r = self.rows.get(key)
        if r is None:
            return None
        bm = getattr(r, "pos_bm", None)
        if bm is not None and not isinstance(bm, float):
            if len(bm) != 16 * int(r.doc_freq):
                return None
            w = np.frombuffer(bm, "<u8").reshape(-1, 2)
            _PHRASE_CTR["bitmap_rows_inline"] += 1
            return w[ranks, 0], w[ranks, 1]
        span = self._bm_span(r)
        if span is None or self.source is None:
            return None
        docs_per_chunk = span * BLOCK
        cidx = ranks // docs_per_chunk
        need = np.unique(cidx)
        if len(need) == 0:
            return np.empty(0, np.uint64), np.empty(0, np.uint64)
        blobs = _read_split_postings_chunks(
            self.source[0], self.source[1], key[0], key[1],
            [-(int(c) + 1) for c in need],
            bucket=int(r.bucket) if hasattr(r, "bucket") else None,
            col="pos_bm",
        )
        lo = np.empty(len(ranks), np.uint64)
        hi = np.empty(len(ranks), np.uint64)
        for c, blob in zip(need, blobs):
            w = np.frombuffer(blob, "<u8").reshape(-1, 2)
            m = cidx == c
            local = ranks[m] - c * docs_per_chunk
            if len(w) <= int(local.max()):
                return None  # short chunk: decode path is authoritative
            lo[m] = w[local, 0]
            hi[m] = w[local, 1]
        _PHRASE_CTR["bitmap_rows_chunked"] += 1
        return lo, hi

    def has(self, key) -> bool:
        return key in self.rows

    def _raw(self, key) -> tuple[np.ndarray, np.ndarray]:
        """Whole-row decode (positions-run offsets must be computed against
        the full tf array regardless of any doc-range slice)."""
        if key not in self._raw_cache:
            r = self.rows.get(key)
            if r is None:
                self._raw_cache[key] = (np.empty(0, np.uint32), np.empty(0, np.uint32))
            else:
                self._raw_cache[key] = decode_postings(r.blob)
        return self._raw_cache[key]

    def full(self, key) -> tuple[np.ndarray, np.ndarray]:
        if key not in self._cache:
            d, t = self._raw(key)
            if self.lo is not None:
                s = int(np.searchsorted(d, self.lo))
                e = int(np.searchsorted(d, self.hi))
                self._off[key] = s
                self._cache[key] = (d[s:e], t[s:e])
            else:
                self._cache[key] = (d, t)
        return self._cache[key]

    def candidates_only(self, key, cand: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Decode only the blocks that can contain candidate docs — the
        skip-pointer path (tantivy skip list analog, SURVEY.md §2.7)."""
        if key in self._cache:
            return self._cache[key]
        r = self.rows.get(key)
        if r is None or len(cand) == 0:
            return np.empty(0, np.uint32), np.empty(0, np.uint32)
        last_doc = np.asarray(r.block_last_doc, np.int64)
        blocks = np.unique(np.searchsorted(last_doc, cand))
        blocks = blocks[blocks < len(last_doc)]
        if len(blocks) * 2 >= len(last_doc):
            return self.full(key)
        return decode_blocks(r.blob, last_doc.astype(np.uint32), blocks)

    def phrase_view(
        self, key
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(docs, tfs, position-run starts, GLOBAL doc ranks) of the docs
        visible to this view — the phrase path's input.  Ranks are each
        doc's index in the term's FULL posting list, which is what the
        per-doc pos_bm bitmap rows are addressed by — a doc-range unit
        can then take the bitmap fast path without decoding the full doc
        list.  With a [lo, hi) doc range AND the row's ``block_tf_cum``
        skip data, ONLY the range's blocks decode: run starts come from
        the block's stored position offset plus an intra-block tf cumsum,
        so a doc-range leaf unit of a 10M-doc merged split touches
        O(range) work instead of O(df) per unit (tantivy's positions skip
        info analog).  Rows written before the skip data existed fall
        back to the whole-row decode."""
        r = self.rows.get(key)
        empty = (
            np.empty(0, np.uint32), np.empty(0, np.uint32),
            np.empty(0, np.int64), np.empty(0, np.int64),
        )
        if r is None or not self.has_positions(key):
            return empty
        tfc = getattr(r, "block_tf_cum", None)
        if tfc is None or isinstance(tfc, float):  # absent column → NaN row
            tfc = None
        if self.lo is None or tfc is None:
            d, t = self.full(key)
            _, t_all = self._raw(key)
            t64 = t_all.astype(np.int64)
            starts_all = np.cumsum(t64) - t64
            s = self._off.get(key, 0)
            return d, t, starts_all[s : s + len(d)], np.arange(
                s, s + len(d), dtype=np.int64
            )
        last_doc = np.asarray(r.block_last_doc, np.int64)
        b0 = int(np.searchsorted(last_doc, self.lo))
        b1 = min(int(np.searchsorted(last_doc, self.hi - 1)) + 1, len(last_doc))
        if b0 >= b1:
            return empty
        blocks = np.arange(b0, b1)
        d, t = decode_blocks(r.blob, last_doc.astype(np.uint32), blocks)
        nblk, df = len(last_doc), int(r.doc_freq)
        sizes = np.full(len(blocks), BLOCK, np.int64)
        if b1 == nblk:
            sizes[-1] = df - BLOCK * (nblk - 1)
        t64 = t.astype(np.int64)
        ex = np.cumsum(t64) - t64  # exclusive cumsum within the slice
        bstart = np.concatenate(([0], np.cumsum(sizes)[:-1]))
        vstarts = (
            ex
            - np.repeat(ex[bstart], sizes)
            + np.repeat(np.asarray(tfc, np.int64)[blocks], sizes)
        )
        # whole blocks decode, so slice index j IS full-list row b0*128+j
        ranks = b0 * BLOCK + np.arange(len(d), dtype=np.int64)
        mask = (d.astype(np.int64) >= self.lo) & (d.astype(np.int64) < self.hi)
        return d[mask], t[mask], vstarts[mask], ranks[mask]

    def positions_at(self, key, vstarts: np.ndarray, counts: np.ndarray) -> np.ndarray:
        """Positions of the runs at explicit flat value offsets (from
        phrase_view) — never touches the row's tf array.  Rows whose
        payload was CHUNKED at write time fetch only the chunks the
        requested runs fall in (one pruned read per cold chunk; chunks
        are cut at block boundaries so no run straddles)."""
        r = self.rows.get(key)
        if r is None:
            return np.empty(0, np.uint32)
        if r.positions is not None:
            return decode_positions_at(r.positions, vstarts, counts)
        cb = self._chunk_blocks(r)
        if cb is None:
            return np.empty(0, np.uint32)
        if len(vstarts) == 0:
            return np.empty(0, np.uint32)
        if self.source is None:
            raise RuntimeError(
                f"posting row {key} has chunked positions but this view has "
                "no (index_dir, split_id) source to fetch them from"
            )
        vstarts = np.asarray(vstarts, np.int64)
        counts = np.asarray(counts, np.int64)
        tfc = np.asarray(r.block_tf_cum, np.int64)
        chunk_vidx = tfc[np.asarray(cb, np.int64)]  # first value idx per chunk
        # runs arrive vstart-sorted, so per-chunk selections are contiguous
        owner = np.searchsorted(chunk_vidx, vstarts, side="right") - 1
        need = np.unique(owner)
        blobs = _read_split_postings_chunks(
            self.source[0], self.source[1], key[0], key[1],
            [int(c) + 1 for c in need],  # chunk_ord is 1-based
            bucket=int(r.bucket) if hasattr(r, "bucket") else None,
        )
        parts = []
        for c, blob in zip(need, blobs):
            m = owner == c
            parts.append(
                decode_positions_at(blob, vstarts[m] - chunk_vidx[c], counts[m])
            )
        return parts[0] if len(parts) == 1 else np.concatenate(parts)


def _sorted_member(a: np.ndarray, d: np.ndarray) -> np.ndarray:
    """Mask of which elements of sorted-unique ``a`` appear in sorted ``d``:
    one searchsorted instead of isin's internal concat+sort."""
    if len(d) == 0:
        return np.zeros(len(a), bool)
    pos = np.searchsorted(d, a)
    return d[np.minimum(pos, len(d) - 1)] == a


def _intersect_with_tfs(base: np.ndarray, postings: _SplitPostings, key) -> np.ndarray:
    d, _ = postings.candidates_only(key, base)
    return base[_sorted_member(base, d.astype(np.int64))]


def _eval_node(node, postings: _SplitPostings, lens_fn=None) -> np.ndarray:
    """Boolean evaluation → sorted unique doc_id array.  ``lens_fn``
    (field → per-doc length array) backs ExistsQuery — the fieldnorm
    store IS the exists bitmap (length > 0), zero postings work."""
    if isinstance(node, TermQuery):
        return postings.full((node.field, node.term))[0].astype(np.int64)
    if isinstance(node, PhraseQuery):
        return _eval_phrase(node, postings)
    if isinstance(node, ExistsQuery):
        if lens_fn is None:
            raise ValueError("exists query reached an evaluator without field lengths")
        fl = lens_fn(node.field)
        if fl is None:
            raise ValueError(
                f"exists query needs the per-field length blob for "
                f"{node.field!r} (index predates doc_lens_<field> columns)"
            )
        docs = np.flatnonzero(fl > 0).astype(np.int64)
        if postings.lo is not None:
            docs = docs[(docs >= postings.lo) & (docs < postings.hi)]
        return docs
    assert isinstance(node, BoolQuery)
    acc: np.ndarray | None = None
    if node.must:
        # smallest doc_freq first (cheapest driver of the intersection)
        def est(c):
            if isinstance(c, TermQuery) and postings.has((c.field, c.term)):
                return postings.rows[(c.field, c.term)].doc_freq
            return 1 << 60

        for c in sorted(node.must, key=est):
            if acc is None:
                acc = _eval_node(c, postings, lens_fn)
            elif len(acc) == 0:
                return acc
            elif isinstance(c, TermQuery):
                # skip-aware: decode only blocks overlapping current candidates
                d, _ = postings.candidates_only((c.field, c.term), acc)
                acc = acc[_sorted_member(acc, d.astype(np.int64))]
            else:
                acc = np.intersect1d(
                    acc, _eval_node(c, postings, lens_fn), assume_unique=True
                )
    if node.should:
        u = np.unique(
            np.concatenate([_eval_node(c, postings, lens_fn) for c in node.should])
        )
        acc = u if acc is None else np.intersect1d(acc, u, assume_unique=True)
    if acc is None:
        acc = np.empty(0, np.int64)
    for c in node.must_not:
        if len(acc) == 0:
            break
        if isinstance(c, TermQuery):
            # skip-aware NOT: only blocks overlapping the surviving
            # candidates need decoding (same skip-pointer path as AND)
            d, _ = postings.candidates_only((c.field, c.term), acc)
            acc = acc[~_sorted_member(acc, d.astype(np.int64))]
        else:
            acc = np.setdiff1d(acc, _eval_node(c, postings, lens_fn), assume_unique=True)
    return acc


def _validate_msm(ast, request: SearchRequest) -> None:
    """minShouldMatch > 1 only makes sense against a user-written top-level
    disjunction — validated PRE-expansion, so a pure expanding leaf
    ('depl*', which rewrites to an internal term disjunction) rejects
    instead of silently counting its dictionary expansions as clauses.
    (An expanding clause INSIDE a user OR stays one clause: expansion
    nests it as a group.)"""
    if request.min_should_match <= 1:
        return
    if not (isinstance(ast, BoolQuery) and ast.should):
        raise ValueError(
            "minShouldMatch > 1 requires a top-level OR query "
            "(e.g. 'a OR b OR c' with minShouldMatch=2)"
        )


def _eval_root(ast, postings: _SplitPostings, msm: int = 1, lens_fn=None) -> np.ndarray:
    """Top-level boolean evaluation with ES ``minimum_should_match``
    semantics: with ``msm > 1`` a doc needs >= msm of the TOP-LEVEL should
    clauses (each clause evaluated normally, membership counted via one
    np.unique over the concatenated per-clause doc arrays — every clause
    yields sorted-unique docs, so the count is exact); must/must_not
    compose as usual.  msm above the clause count matches nothing
    (Lucene).  msm <= 1 is the plain _eval_node path."""
    if msm <= 1 or not isinstance(ast, BoolQuery) or not ast.should:
        return _eval_node(ast, postings, lens_fn)
    if msm > len(ast.should):
        return np.empty(0, np.int64)
    arrs = [_eval_node(c, postings, lens_fn) for c in ast.should]
    vals, counts = np.unique(np.concatenate(arrs), return_counts=True)
    acc = vals[counts >= msm].astype(np.int64)
    if len(acc) and ast.must:
        acc = acc[
            _sorted_member(acc, _eval_node(BoolQuery(must=ast.must), postings, lens_fn))
        ]
    for c in ast.must_not:
        if len(acc) == 0:
            break
        acc = np.setdiff1d(acc, _eval_node(c, postings, lens_fn), assume_unique=True)
    return acc


def _eval_phrase(node: PhraseQuery, postings: _SplitPostings) -> np.ndarray:
    """Exact phrase match via position adjacency, no per-doc Python loop:
    an occurrence of term 0 at (doc, p) survives iff (doc, p+i) is an
    occurrence of term i for every i — set-membership on packed uint64
    (doc, pos) keys (reference: tantivy phrase scorer semantics,
    record=position fields, field_mapping_entry.rs:595-623).

    ``slop > 0`` (ordered sloppy phrase, '"a b"~2') switches adjacency to a
    vectorized GREEDY CHAIN over the same packed keys: from every
    occurrence of term 0, each later term takes its smallest same-doc
    position strictly after the chain's current end (one searchsorted per
    term).  Greedy minimizes the chain's end position for a given start, so
    span(start) = p_n - p_1 is minimal and the doc matches iff any start's
    span <= slop + n - 1 — exactly the documented ordered-slop semantics
    (PhraseQuery docstring).

    Doc lists are intersected FIRST (rarest term leading), and only the
    surviving candidates' position runs are decoded (``positions_at``): a
    phrase led by a stopword ("the error") would otherwise unpack the
    stopword's entire position payload to verify a candidate set the rare
    term already shrank.  On a doc-range leaf unit the doc lists
    themselves are block-sliced via the block_tf_cum skip data
    (``phrase_view``), so a unit of a 10M-doc merged split does O(range)
    decode work, not O(df)."""
    keys = [(node.field, t) for t in node.terms]
    if any(not postings.has_positions(k) for k in keys):
        return np.empty(0, np.int64)
    doclists = [postings.phrase_view(k) for k in keys]
    if any(len(d) == 0 for d, *_ in doclists):
        return np.empty(0, np.int64)
    order = sorted(range(len(keys)), key=lambda i: len(doclists[i][0]))
    cand = doclists[order[0]][0].astype(np.int64)
    for oi in order[1:]:
        # both sides sorted unique: one searchsorted membership beats
        # isin's internal concat+sort (the dominant cost on hot terms)
        cand = cand[_sorted_member(cand, doclists[oi][0].astype(np.int64))]
        if len(cand) == 0:
            return cand
    cand_u32 = cand.astype(np.uint32)
    if node.slop:
        start: np.ndarray | None = None
        cur: np.ndarray | None = None
        for i, k in enumerate(keys):
            d, t, vs, _ = doclists[i]
            idx = np.searchsorted(d, cand_u32)
            psub = postings.positions_at(k, vs[idx], t[idx])
            doc_rep = np.repeat(cand.astype(np.uint64), t[idx].astype(np.int64))
            keys_i = (doc_rep << np.uint64(32)) | psub.astype(np.uint64)
            if cur is None:
                start = cur = keys_i
                continue
            if len(keys_i) == 0:
                return np.empty(0, np.int64)
            # smallest occurrence of term i with key strictly > chain end:
            # same packed ordering (doc-major, position-minor), so the
            # next same-doc position is the next key overall iff it shares
            # the doc bits
            nxt = np.searchsorted(keys_i, cur, side="right")
            alive = nxt < len(keys_i)
            nk = keys_i[np.minimum(nxt, len(keys_i) - 1)]
            keep = alive & ((nk >> np.uint64(32)) == (cur >> np.uint64(32)))
            start, cur = start[keep], nk[keep]
            if len(cur) == 0:
                return np.empty(0, np.int64)
        span = (cur & np.uint64(0xFFFFFFFF)) - (start & np.uint64(0xFFFFFFFF))
        hit = span <= np.uint64(node.slop + len(keys) - 1)
        return np.unique((cur[hit] >> np.uint64(32)).astype(np.int64))
    if len(keys) < 64 and all(postings.has_bitmap(k) for k in keys):
        # bit-parallel shift-AND over the INDEX-TIME per-doc 128-bit
        # position bitsets (pos_bm column, codec.encode_position_bitmaps —
        # stored for high-tf terms at build/merge): a start p survives iff
        # every term i has bit p+i, i.e. AND over i of (bm_i >> i) is
        # nonzero.  Zero position decode; doc-range units address the
        # full-list bitmap rows via phrase_view's GLOBAL doc ranks, and
        # big lists' bitmaps are CHUNK rows fetched candidate-gated
        # (bitmap_words), so no task ever reads a hot term's whole cell.
        # (A query-time bitmap cache was prototyped first and reverted:
        # local-mode python workers have no task stickiness, so building
        # bitmaps per worker re-missed forever — storing them in the index
        # is the principled form.)
        gathered: list | None = []
        for i, k in enumerate(keys):
            d_i, _t, _v, ranks_i = doclists[i]
            rows_i = ranks_i[np.searchsorted(d_i, cand_u32)]
            w = postings.bitmap_words(k, rows_i)
            if w is None:
                gathered = None
                break
            gathered.append(w)
        if gathered is not None:
            _PHRASE_CTR["phrase_terms_bitmap"] += len(keys)
            acc_lo = np.full(len(cand), ~np.uint64(0), np.uint64)
            acc_hi = np.full(len(cand), ~np.uint64(0), np.uint64)
            for i, (blo, bhi) in enumerate(gathered):
                if i:
                    s = np.uint64(i)
                    blo = (blo >> s) | (bhi << np.uint64(64 - i))
                    bhi = bhi >> s
                acc_lo &= blo
                acc_hi &= bhi
            return cand[(acc_lo | acc_hi) != 0]
    _PHRASE_CTR["phrase_terms_decode"] += len(keys)
    # Exact phrase, ANCHORED on the term with the fewest candidate
    # positions: a stopword-heavy phrase ("the error") otherwise probes
    # with the STOPWORD's millions of packed keys at every step.  The
    # anchor's occurrences become candidate phrase STARTS (key - i), and
    # every other term — processed rarest-first — is checked by probing
    # ITS keys with the (shrinking) start set: probe cost is O(|starts|)
    # per term instead of O(|hot term|), and each term's positions are
    # decoded/fetched only for docs still alive (candidate-gated chunk
    # fetch extends into the verify loop; 3+-term phrases decode strictly
    # less of their later terms).  Semantics identical: a start p
    # survives iff (doc, p+i) is an occurrence of term i for every i.
    tf_cand = []
    for i in range(len(keys)):
        d, t, _, _ = doclists[i]
        tf_cand.append(int(t[np.searchsorted(d, cand_u32)].sum()))
    order2 = sorted(range(len(keys)), key=lambda i: tf_cand[i])
    a = order2[0]
    d, t, vs, _ = doclists[a]
    idx = np.searchsorted(d, cand_u32)
    psub = postings.positions_at(keys[a], vs[idx], t[idx])
    doc_rep = np.repeat(cand.astype(np.uint64), t[idx].astype(np.int64))
    akeys = (doc_rep << np.uint64(32)) | psub.astype(np.uint64)
    if a:
        # a start needs p_anchor >= a (term a sits at start + a)
        akeys = akeys[psub >= a]
    starts = akeys - np.uint64(a)
    for i in order2[1:]:
        if len(starts) == 0:
            return np.empty(0, np.int64)
        alive = np.unique((starts >> np.uint64(32)).astype(np.int64))
        alive_u32 = alive.astype(np.uint32)
        d, t, vs, _ = doclists[i]
        idx = np.searchsorted(d, alive_u32)
        psub = postings.positions_at(keys[i], vs[idx], t[idx])
        doc_rep = np.repeat(alive.astype(np.uint64), t[idx].astype(np.int64))
        keys_i = (doc_rep << np.uint64(32)) | psub.astype(np.uint64)
        if len(keys_i) == 0:
            return np.empty(0, np.int64)
        # keys_i ascends (docs ascend; positions ascend within a doc) and
        # starts+i ascends, so sorted membership applies; keys_i may
        # repeat a value only across docs, never within, so the
        # searchsorted probe stays exact
        probe = starts + np.uint64(i)
        pos = np.searchsorted(keys_i, probe)
        ok = np.minimum(pos, len(keys_i) - 1)
        starts = starts[keys_i[ok] == probe]
    if len(starts) == 0:
        return np.empty(0, np.int64)
    return np.unique((starts >> np.uint64(32)).astype(np.int64))


def _block_range(last_doc: np.ndarray, lo: int, hi: int) -> tuple[int, int]:
    """Indices [b0, b1) of the posting blocks that can intersect docID range
    [lo, hi) given the block_last_doc skip array (may over-include the two
    boundary blocks; callers mask decoded docs to the range)."""
    b0 = int(np.searchsorted(last_doc, lo))
    b1 = min(int(np.searchsorted(last_doc, hi - 1)) + 1, len(last_doc))
    return b0, b1


def _term_count_in_range(row, lo: int, hi: int) -> int:
    """Exact count of one term's docs inside [lo, hi): full blocks strictly
    between the boundaries contribute their known sizes; only the (<= 2)
    boundary blocks decode (the skip-data analog of tantivy's doc-count
    metadata)."""
    last_doc = np.asarray(row.block_last_doc, np.int64)
    n, df = len(last_doc), int(row.doc_freq)
    b0, b1 = _block_range(last_doc, lo, hi)
    if b0 >= b1:
        return 0
    size = lambda i: BLOCK if i < n - 1 else df - BLOCK * (n - 1)  # noqa: E731
    total = sum(size(i) for i in range(b0 + 1, b1 - 1))
    edges = sorted({b0, b1 - 1})
    d, _ = decode_blocks(row.blob, last_doc.astype(np.uint32), np.asarray(edges))
    d = d.astype(np.int64)
    total += int(((d >= lo) & (d < hi)).sum())
    return total


def _wand_single_term(
    row, gstats, field, term, lens, n_top, lo=None, hi=None
) -> tuple[np.ndarray, np.ndarray]:
    # ``lens`` is the field's exact per-doc length array for tokenized text
    # fields, or None for raw/typed fields (fieldnorm 1)
    """Block-max WAND for a single-term query: decode blocks in descending
    score-upper-bound order, stop once the running k-th best score beats the
    next block's bound (SURVEY.md §2.7 block-max WAND; here the bound is
    idf * tf_norm(block_max_tf, block_min_len), exact because tf_norm is
    increasing in tf and decreasing in doc length).  With a [lo, hi) doc
    range only the intersecting blocks compete, and decoded boundary docs
    are masked to the range before scoring."""
    last_doc = np.asarray(row.block_last_doc, np.int64)
    bmax_tf = np.asarray(row.block_max_tf, np.int64)
    bmin_len = np.maximum(np.asarray(row.block_min_len, np.int64), 1)
    avg = gstats["avg_len"].get(field, 1.0) or 1.0
    term_idf = bm25_idf(gstats["df"].get((field, term), row.doc_freq), gstats["num_docs"])
    bounds = term_idf * tf_norm(bmax_tf.astype(np.float64), bmin_len, avg)
    if lo is not None:
        b0, b1 = _block_range(last_doc, lo, hi)
        cand_blocks = np.arange(b0, b1)
        order = cand_blocks[np.argsort(-bounds[cand_blocks], kind="stable")]
        if len(order) == 0:
            return np.empty(0, np.int64), np.empty(0, np.float64)
    else:
        order = np.argsort(-bounds, kind="stable")
    last_doc_u32 = last_doc.astype(np.uint32)
    if n_top <= 0:  # count-only: the caller derives num_hits from doc_freq
        return np.empty(0, np.int64), np.empty(0, np.float64)
    flat = (len(bmax_tf) == 0 or int(bmax_tf.max()) <= 1) and (
        # all tfs 1 AND all doc lens 1 → every doc scores exactly idf.
        # Raw/typed scalar fields always satisfy this (their fieldnorm
        # store counts one value per doc); the lens.max() probe is a few
        # ms even at 10M-doc splits and only runs when the tf check (free,
        # from block metadata) already passed
        lens is None
        or int(lens.max(initial=1)) <= 1
    )
    if flat:
        # Flat-score fast path: every doc scores exactly idf, so the top-k
        # under (score desc, doc_id asc) is simply the n_top LOWEST doc
        # ids.  Decode blocks in doc order and stop once enough in-range
        # docs are collected — keeping ties correct without the general
        # path's equal-bound decode-everything worst case (with all bounds
        # equal, the strict-< prune below can never fire).
        blocks = np.sort(order)
        got, n_got = [], 0
        i = 0
        while i < len(blocks) and n_got < n_top:
            j = min(i + 8, len(blocks))
            d, _t = decode_blocks(row.blob, last_doc_u32, blocks[i:j])
            if lo is not None:
                d = d[(d >= lo) & (d < hi)]
            got.append(d.astype(np.int64))
            n_got += len(d)
            i = j
        docs = np.concatenate(got) if got else np.empty(0, np.int64)
        flat = float(tf_norm(np.ones(1), np.ones(1, np.int64), avg)[0])
        return docs, np.full(len(docs), term_idf * flat)
    got_docs, got_scores = [], []
    topk = np.empty(0, np.float64)  # running best-k scores (unsorted)
    threshold = -np.inf
    i, group = 0, 8
    while i < len(order):
        # strict <: a block whose bound EQUALS the running k-th best may hold
        # docs that tie on score and win the (score desc, doc_id asc)
        # tie-break — same reasoning as _maxscore_union's strict prune test
        if len(topk) >= n_top and bounds[order[i]] < threshold:
            break
        # geometric batching: decode whole groups of blocks per call (one
        # header parse, one threshold update), doubling so the degenerate
        # no-prune case costs O(log blocks) calls instead of one per block
        j = min(i + group, len(order))
        if len(topk) >= n_top:
            alive = np.flatnonzero(bounds[order[i:j]] >= threshold)
            j = i + (int(alive[-1]) + 1 if len(alive) else 0)
            if j == i:
                break
        d, t = decode_blocks(row.blob, last_doc_u32, np.sort(order[i:j]))
        if lo is not None:
            m = (d >= lo) & (d < hi)
            d, t = d[m], t[m]
            if len(d) == 0:
                i, group = j, min(group * 2, 1024)
                continue
        # raw-tokenizer fields hold one term per doc: fieldnorm is 1, not the
        # text length (block_min_len already stores 1 for these postings)
        dl = lens[d.astype(np.int64)] if lens is not None else np.ones(len(d), np.int64)
        sc = term_idf * tf_norm(t, dl, avg)
        got_docs.append(d.astype(np.int64))
        got_scores.append(sc)
        merged = np.concatenate((topk, sc))
        if len(merged) >= n_top:
            if len(merged) > n_top:
                merged = np.partition(merged, len(merged) - n_top)[len(merged) - n_top :]
            topk = merged
            threshold = topk.min()
        else:
            topk = merged
        i, group = j, min(group * 2, 1024)
    if not got_docs:  # every block masked out by the doc range
        return np.empty(0, np.int64), np.empty(0, np.float64)
    return np.concatenate(got_docs), np.concatenate(got_scores)


def _maxscore_union(
    postings: _SplitPostings, gstats, keys, field_lens, n_top, weights=None
) -> tuple[np.ndarray, np.ndarray, int]:
    """MaxScore over a pure disjunction of term queries (the block-max
    family's term-at-a-time variant; reference semantics SURVEY §2.7 /
    collector.rs:146-167): terms are processed in descending
    score-upper-bound order, and a doc appearing ONLY in terms whose
    remaining combined upper bound is strictly below the running k-th best
    exact score is counted but never scored.

    num_hits stays EXACT — every doc list is decoded once for the union
    count (the engine reports true hit totals, ft_count contract) — the
    saving is the BM25 + top-k work on the pruned tail, which for a
    stopword OR ("the OR error") is most of the union.  Strict `<` in the
    prune test keeps score-ties eligible, so tie-breaks (doc order) are
    unaffected.  Returns (docs, exact_scores, num_hits) for the scored
    subset; every doc that can appear in the top-k is in it.

    ``weights`` (optional per-key boost multipliers, positive_term_weights)
    scale a term's block upper bound AND its exact per-doc score by the
    same factor — so boosted disjunctions (``error^2 OR warn``) prune with
    sound bounds and score byte-identically to the full-eval path (same
    float association: (idf·tf_norm)·w)."""
    present = []
    for k in sorted(set(keys)):
        r = postings.rows.get(k)
        if r is None:
            continue
        avg = gstats["avg_len"].get(k[0], 1.0) or 1.0
        idf = bm25_idf(gstats["df"].get(k, r.doc_freq), gstats["num_docs"])
        w = weights.get(k, 1.0) if weights else 1.0
        bmax_tf = np.asarray(r.block_max_tf, np.float64)
        bmin_len = np.maximum(np.asarray(r.block_min_len, np.int64), 1)
        ub = float((idf * tf_norm(bmax_tf, bmin_len, avg)).max()) if len(bmax_tf) else 0.0
        if w != 1.0:
            ub *= w
        present.append((ub, k, idf, avg, w))
    if not present:
        return np.empty(0, np.int64), np.empty(0, np.float64), 0
    present.sort(key=lambda x: (-x[0], x[1]))
    ubs = np.array([p[0] for p in present])
    rem = np.concatenate([np.cumsum(ubs[::-1])[::-1], [0.0]])  # rem[i] = Σ ubs[i:]
    doclists = [postings.full(p[1]) for p in present]
    lens_list = [field_lens(p[1][0]) for p in present]

    seen: np.ndarray | None = None  # sorted union of doc ids so far
    out_docs, out_scores = [], []
    topk = np.empty(0, np.float64)
    # n_top=0 (count-only): +inf threshold makes every phase counted-but-
    # unscored; the exact union count still accumulates below
    threshold = -np.inf if n_top > 0 else np.inf
    num_hits = 0
    for i, (ub, key, idf, avg, w) in enumerate(present):
        d_i = doclists[i][0].astype(np.int64)
        t_i = doclists[i][1]
        last = i == len(present) - 1
        if seen is None:
            new_docs, new_tf = d_i, t_i
            seen = d_i
        else:
            fresh = ~_sorted_member(d_i, seen)
            new_docs, new_tf = d_i[fresh], t_i[fresh]
            if len(new_docs) and not last:  # nothing consumes seen after the last phase
                seen = np.concatenate((seen, new_docs))
                seen.sort()
        num_hits += len(new_docs)
        if len(new_docs) == 0:
            continue
        if len(topk) >= n_top and rem[i] < threshold:
            continue  # counted, not scored: bounded strictly below k-th best
        # exact totals: phase i's own term plus every LATER term's
        # contribution (docs new at phase i contain none of the earlier
        # terms by construction) — added in SORTED (field, term) order,
        # the same float-addition order as the full-eval scorer, so a
        # search_after cursor minted from a MaxScore page compares
        # bit-exactly against the cursor page's full-eval recomputation
        sc = np.zeros(len(new_docs), np.float64)
        for j in sorted(range(i, len(present)), key=lambda x: present[x][1]):
            _, _, idf_j, avg_j, w_j = present[j]
            flj = lens_list[j]
            if j == i:
                dlj = (
                    flj[new_docs] if flj is not None else np.ones(len(new_docs), np.int64)
                )
                base_j = idf_j * tf_norm(new_tf.astype(np.float64), dlj, avg_j)
                sc += base_j * w_j if w_j != 1.0 else base_j
                continue
            d_j, t_j = doclists[j]
            if len(d_j) == 0:
                continue
            dj = d_j.astype(np.int64)
            pos = np.searchsorted(dj, new_docs)
            valid = dj[np.minimum(pos, len(dj) - 1)] == new_docs
            if not valid.any():
                continue
            dv = new_docs[valid]
            dlj = flj[dv] if flj is not None else np.ones(len(dv), np.int64)
            base_j = idf_j * tf_norm(t_j[pos[valid]].astype(np.float64), dlj, avg_j)
            sc[valid] += base_j * w_j if w_j != 1.0 else base_j
        out_docs.append(new_docs)
        out_scores.append(sc)
        merged = np.concatenate((topk, sc))
        if len(merged) > n_top:
            merged = np.partition(merged, len(merged) - n_top)[len(merged) - n_top :]
        topk = merged
        if len(topk) >= n_top:
            threshold = topk.min()
    if not out_docs:  # count-only (n_top=0): every phase counted, none scored
        return np.empty(0, np.int64), np.empty(0, np.float64), num_hits
    return np.concatenate(out_docs), np.concatenate(out_scores), num_hits


def _topk_take(values: np.ndarray, docs: np.ndarray, n_top: int) -> np.ndarray:
    """Indices of the top-n_top rows by (value desc, doc asc).  A partition
    prefilter keeps the O(n log n) lexsort to the boundary candidates only —
    at 10M-doc splits this is ~10x cheaper than sorting every candidate."""
    if n_top <= 0:  # count-only request: np.partition(v, len(v)) would raise
        return np.empty(0, np.int64)
    if len(values) > 4 * n_top:
        kth = np.partition(values, len(values) - n_top)[len(values) - n_top]
        idx = np.flatnonzero(values >= kth)
        sub = np.lexsort((docs[idx], -values[idx]))[:n_top]
        return idx[sub]
    return np.lexsort((docs, -values))[:n_top]


def _count_only_row(split_id: str, num_hits: int) -> pd.DataFrame:
    """One sentinel hit row carrying only split_num_hits, for count-only
    requests (max_hits=0).  The RDD leaf consumes dict records, and a page
    slice of width 0 can never surface doc_id=-1 to a caller."""
    return pd.DataFrame(
        {
            "split_id": [split_id],
            "doc_id": np.array([-1], np.int64),
            "score": np.array([0.0], np.float64),
            "sort_value": np.array([0], np.int64),
            "split_num_hits": np.array([int(num_hits)], np.int64),
        }
    )


def select_strategy(ast, request: SearchRequest, mode: str = "topk") -> str:
    """The ONE place that picks the leaf scoring strategy — shared by
    make_split_scorer (which executes it) and explain (which reports it),
    so introspection can never drift from what the leaf actually runs.

    * ``match_all_scan`` — '*' (constant score, zero postings decode)
    * ``block_max_wand`` — single unfiltered term (block skipping)
    * ``maxscore_union`` — pure term disjunction, boosted or not
      (counted-but-unscored pruning; per-clause boosts scale each term's
      block upper bound and its exact score by the same multiplier, so
      the prune test stays sound)
    * ``full_eval`` — everything else (boolean eval + BM25 over matches)

    Time-filtered queries select ``full_eval`` here, but the leaf upgrades
    them per split via ts_elidable_strategy when every segment of a split
    lies wholly inside the requested range (see score_split).
    """
    unfiltered_topk = (
        mode == "topk"
        and request.sort_by_field is None
        and request.start_timestamp is None
        and request.end_timestamp is None
        and request.numeric_filters is None
        # a cursor needs the docs BELOW the pruned paths' thresholds —
        # WAND/MaxScore would re-return the already-seen top-k
        and request.search_after is None
        # minimum_should_match changes MATCHING (>= m clauses), which the
        # counted-but-unscored MaxScore walk cannot express — full eval
        and request.min_should_match <= 1
    )
    if isinstance(ast, AllQuery):
        return "match_all_scan"
    if unfiltered_topk and isinstance(ast, TermQuery):
        return "block_max_wand"
    if (
        unfiltered_topk
        and isinstance(ast, BoolQuery)
        and not ast.must
        and not ast.must_not
        and len(ast.should) >= 2
        and all(isinstance(c, TermQuery) for c in ast.should)
    ):
        return "maxscore_union"
    return "full_eval"


def ts_elidable_strategy(ast, request: SearchRequest, mode: str = "topk") -> str | None:
    """The pruned strategy this query would run WITHOUT its time filter,
    or None.  The reference drops the timestamp filter for a segment whose
    whole ts range lies inside the request range (filters.rs:64-66,92-97);
    lifting that skip to strategy selection means a split wholly inside
    the range runs block-max WAND / MaxScore instead of full evaluation —
    the filter is provably a no-op there, so scores, tie-breaks, and the
    exact num_hits are unchanged.  Splits straddling a range boundary keep
    full_eval (their per-doc filter needs every candidate decoded anyway)."""
    if request.start_timestamp is None and request.end_timestamp is None:
        return None
    unfiltered = _dc_replace(request, start_timestamp=None, end_timestamp=None)
    base = select_strategy(ast, unfiltered, mode)
    return base if base in ("block_max_wand", "maxscore_union") else None


def _split_inside_ts(ff_pdf: pd.DataFrame, lo, hi) -> bool:
    """True iff every segment's [ts_min, ts_max] lies inside [lo, hi) —
    the whole-split form of _ts_filter's whole-segment skip."""
    if lo is not None and not bool((ff_pdf["ts_min"] >= lo).all()):
        return False
    if hi is not None and not bool((ff_pdf["ts_max"] < hi).all()):
        return False
    return True


def make_split_scorer(
    config: IndexConfig,
    gstats: dict,
    ast,
    request: SearchRequest,
    mode: str = "topk",
    index_dir: str | None = None,
    stream_fields: tuple[str, ...] | None = None,
    stream_scored: bool = False,
    source_dir: str | None = None,
):
    """Build the cogrouped scorer function.  mode: 'topk' (per-split top
    offset+max_hits, winners' stored fields fetched in-task) or 'stream'
    (emit every matching doc, no fetch — the search-stream fast-field export
    path, search_stream/leaf.rs analog).  stream_fields (stream mode only)
    adds one int64 column per resolved fast field (``mf_<i>``) so several
    aggregations share a single match-evaluation pass.  stream_scored
    additionally BM25-scores every streamed match (full evaluation, no
    pruning — a downstream group-by needs every group's best score, so
    top-k shortcuts cannot apply): the field-collapse vehicle."""
    n_top = request.start_offset + request.max_hits
    num_filters = _resolve_numeric_filters(config, request)
    pos_terms = sorted(positive_terms(ast))
    # per-term boost multipliers ('term^2'); all 1.0 for unboosted queries
    pos_weights = positive_term_weights(ast)
    # positive exists clauses: constant boost per matching doc (field → w)
    pos_exists = positive_exists_weights(ast)
    ts_lo, ts_hi = request.start_timestamp, request.end_timestamp
    sort_field = request.sort_by_field
    fetch = mode == "topk" and index_dir is not None
    strategy = select_strategy(ast, request, mode)
    single_term_wand = strategy == "block_max_wand"
    disjunction_maxscore = strategy == "maxscore_union"
    # time-filtered term/disjunction queries upgrade per split: a split
    # wholly inside [ts_lo, ts_hi) runs the pruned strategy (the filter is
    # a no-op there); boundary-straddling splits keep full evaluation
    elide_strategy = ts_elidable_strategy(ast, request, mode)

    lens_tracked = set(config.lens_tracked_fields) | {"text"}
    f_cols = fetch_cols(config)
    _EMPTY_DTYPES = {"turn_idx": np.int32, "ts_epoch": np.int64}
    mf_fields = tuple(stream_fields) if (mode == "stream" and stream_fields) else ()
    mf_names = [f"mf_{i}" for i in range(len(mf_fields))]

    def score_split(
        key,
        postings_pdf: pd.DataFrame,
        ff_pdf: pd.DataFrame,
        lo: int | None = None,
        hi: int | None = None,
    ) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                "split_id": pd.Series(dtype=object),
                "doc_id": pd.Series(dtype=np.int64),
                "score": pd.Series(dtype=np.float64),
                "sort_value": pd.Series(dtype=np.int64),
                "split_num_hits": pd.Series(dtype=np.int64),
                **{c: pd.Series(dtype=np.int64) for c in mf_names},
                **(
                    {
                        c: pd.Series(dtype=_EMPTY_DTYPES.get(c, object))
                        for c in f_cols
                        if c != "doc_id"
                    }
                    if fetch
                    else {}
                ),
            }
        )
        if len(ff_pdf) == 0:
            return empty
        split_id = key[0]
        # Decoded-lens memo: parked on the CACHED fastfields DataFrame's
        # attrs, so its lifetime (and invalidation) is exactly the worker
        # FF cache entry's — no separate epoch bookkeeping.  Decoding the
        # whole doc_lens column measured 113 ms on a 5.1M-doc split and
        # was paid per scorer invocation: every doc-range UNIT of every
        # query re-decoded it, the single largest per-unit fixed cost at
        # the few-huge-splits shape (and a real slice of the per-split
        # constant at high split counts).
        lens_cache: dict = ff_pdf.attrs.setdefault("_qw_decoded_lens", {})
        ff_pdf = ff_pdf.sort_values("seg_id")
        # fast fields: exact doc lengths (fieldnorm analog) + timestamps
        lens = lens_cache.get("text")
        if lens is None:
            lens = np.concatenate(
                [decode_u32_column(b) for b in ff_pdf["doc_lens"]]
            ).astype(np.int64)
            lens_cache["text"] = lens

        def field_lens(field: str) -> np.ndarray | None:
            """Exact per-doc field lengths (the fieldnorm store): token
            counts for tokenized fields, value counts for raw/typed fields
            (tantivy counts a raw value as one token, so scalars are 1 and
            arrays n).  None → fieldnorm 1 (indexes built before the
            per-field blobs existed)."""
            if field not in lens_tracked:
                return None
            if field == "text":
                return lens
            if field not in lens_cache:
                col = f"doc_lens_{field}"
                lens_cache[field] = (
                    np.concatenate(
                        [decode_u32_column(b) for b in ff_pdf[col]]
                    ).astype(np.int64)
                    if col in ff_pdf.columns
                    else None
                )
            return lens_cache[field]

        src = source_dir or index_dir
        postings = _SplitPostings(
            postings_pdf, lo, hi,
            source=(src, split_id) if src is not None else None,
        )

        eff_wand, eff_maxscore = single_term_wand, disjunction_maxscore
        if elide_strategy is not None and _split_inside_ts(ff_pdf, ts_lo, ts_hi):
            eff_wand = elide_strategy == "block_max_wand"
            eff_maxscore = elide_strategy == "maxscore_union"

        if eff_wand and postings.has((ast.field, ast.term)):
            row = postings.rows[(ast.field, ast.term)]
            docs, scores = _wand_single_term(
                row, gstats, ast.field, ast.term, field_lens(ast.field), n_top, lo, hi
            )
            if ast.boost != 1.0:
                # a uniform multiplier never reorders, so WAND's internal
                # threshold math stays valid — scale the exact scores after
                scores = scores * ast.boost
            num_hits = (
                int(row.doc_freq) if lo is None else _term_count_in_range(row, lo, hi)
            )
        elif eff_maxscore:
            docs, scores, num_hits = _maxscore_union(
                postings,
                gstats,
                [(c.field, c.term) for c in ast.should],
                field_lens,
                n_top,
                pos_weights,
            )
        elif isinstance(ast, AllQuery):
            # '*': every doc in the split matches with constant score 1.0
            # (tantivy AllQuery scorer) — zero postings decode; num_docs
            # comes off the already-loaded doc_lens fast-field column.
            # Doc-range slices (lo/hi) keep sub-split leaf units exact.
            docs = np.arange(
                lo or 0, len(lens) if hi is None else min(hi, len(lens)), dtype=np.int64
            )
            if len(docs) and (ts_lo is not None or ts_hi is not None):
                docs = _ts_filter(docs, ff_pdf, ts_lo, ts_hi)
            if len(docs) and num_filters:
                docs = _apply_numeric_filters(docs, ff_pdf, lens, num_filters)
            num_hits = len(docs)
            if num_hits == 0:
                return empty
            scores = np.ones(len(docs), np.float64)
        else:
            docs = _eval_root(ast, postings, request.min_should_match, field_lens)
            if len(docs) and (ts_lo is not None or ts_hi is not None):
                docs = _ts_filter(docs, ff_pdf, ts_lo, ts_hi)
            if len(docs) and num_filters:
                docs = _apply_numeric_filters(docs, ff_pdf, lens, num_filters)
            num_hits = len(docs)
            if num_hits == 0:
                return empty
            scores = np.zeros(len(docs), np.float64)
            # stream mode exports every matching doc's fast-field value — no
            # ranking, so skip BM25 entirely (the reference stream collector
            # never scores either, search_stream/collector.rs:32-116) unless
            # the caller asked for a scored stream (field collapse)
            score_stream = mode != "stream" or stream_scored
            for field, term in pos_terms if score_stream else []:
                d, t = postings.candidates_only((field, term), docs)
                if len(d) == 0:
                    continue
                d = d.astype(np.int64)
                # docs and d are both sorted unique: one searchsorted maps
                # each posting to its candidate slot (no isin, no re-sort)
                pos = np.searchsorted(docs, d)
                valid = docs[np.minimum(pos, len(docs) - 1)] == d
                pv = pos[valid]
                tf = t[valid].astype(np.float64)
                fl = field_lens(field)
                if fl is not None:
                    dl = fl[d[valid]]
                else:
                    dl = np.ones(len(pv), np.int64)  # raw/typed fields: len 1
                avg = gstats["avg_len"].get(field, 1.0) or 1.0
                term_idf = bm25_idf(gstats["df"].get((field, term), 0), gstats["num_docs"])
                w = pos_weights.get((field, term), 1.0)
                # (idf·tf_norm)·w, NOT w·idf·tf_norm: float association
                # must match the WAND path's post-scale exactly, or a
                # boosted term's score differs in the last ulp between
                # strategies and exact-score search_after cursors break.
                # _attach_score_explain mirrors this body — change both
                base = term_idf * tf_norm(tf, dl, avg)
                scores[pv] += base * w if w != 1.0 else base
            # exists clauses score a constant boost per matching doc (ES
            # query-context exists), ADDED AFTER the term sums — the same
            # order score_explain reconstructs
            for fname in sorted(pos_exists) if score_stream else []:
                flx = field_lens(fname)
                if flx is not None:
                    scores[flx[docs] > 0] += pos_exists[fname]

        if len(docs) == 0:
            if num_hits > 0:
                # count-only request (max_hits=0, so n_top==0): the pruned
                # paths return no candidate docs but an exact num_hits; the
                # root still needs this split's count, so emit one sentinel
                # row.  doc_id=-1 can never reach a page: every page slice
                # is rows[offset:offset+0] == [] when max_hits is 0.
                return _count_only_row(split_id, num_hits)
            return empty

        if sort_field is not None:
            sv = _fast_field_values(sort_field, ff_pdf, lens, docs, lens_cache)
        else:
            sv = np.zeros(len(docs), np.int64)

        if request.search_after is not None and mode == "topk":
            # cursor pagination: drop rows at-or-before the cursor in
            # result order, BEFORE the top-k — num_hits (computed above)
            # stays the full count.  Equal primary values break by the
            # reference (split_id, doc_id) order; within one split the
            # split_id comparison is a scalar.
            c_v, c_split, c_doc = request.search_after
            if sort_field is not None and isinstance(c_v, float):
                # int64 discipline: comparing an int64 sort array against
                # a float cursor upcasts to float64 and collapses distinct
                # values above 2^53 (parse_search_after normalizes
                # integral floats; anything left is a user error)
                raise ValueError(
                    f"sort-field search_after value must be an integer (got {c_v!r})"
                )
            prim = sv if sort_field is not None else scores
            asc = request.sort_asc if sort_field is not None else False
            after_prim = (prim > c_v) if asc else (prim < c_v)
            if split_id > c_split:
                key_after = np.ones(len(docs), bool)
            elif split_id == c_split:
                key_after = docs > c_doc
            else:
                key_after = np.zeros(len(docs), bool)
            keep = after_prim | ((prim == c_v) & key_after)
            docs, scores, sv = docs[keep], scores[keep], sv[keep]

        if mode == "stream":
            take = np.arange(len(docs))
        elif sort_field is not None:
            # stay in int64: a float64 cast collapses distinct sort values
            # above 2^53 (e.g. nanosecond-epoch fast fields) and returns a
            # wrong page boundary (_fast_field_values rejects f64 for the
            # same reason); _topk_take is dtype-agnostic
            sgn = -1 if request.sort_asc else 1
            take = _topk_take(sgn * sv.astype(np.int64), docs, n_top)
        else:
            take = _topk_take(scores, docs, n_top)
        if len(take) == 0 and num_hits > 0:
            # count-only via the full-eval path: candidates exist but
            # n_top==0 pages nothing; a scalar num_hits broadcast against
            # empty arrays would vanish (0-row frame), losing the count
            return _count_only_row(split_id, num_hits)
        out = pd.DataFrame(
            {
                "split_id": split_id,
                "doc_id": docs[take],
                "score": scores[take],
                "sort_value": sv[take],
                "split_num_hits": num_hits,
            }
        )
        for name, f in zip(mf_names, mf_fields):
            # stream mode: take is the identity, so this is vals-by-doc
            out[name] = _fast_field_values(f, ff_pdf, lens, docs, lens_cache)[take]
        if fetch:
            fields = _fetch_doc_fields(index_dir, split_id, docs[take], f_cols)
            out = out.merge(fields, on="doc_id", how="left")
        return out

    return score_split


def _ts_filter(docs: np.ndarray, ff_pdf: pd.DataFrame, lo, hi) -> np.ndarray:
    """Per-doc timestamp filter with whole-segment skip (filters.rs:64-66,
    92-97 analog): a segment fully inside the range is accepted without
    decoding its ts column; fully outside is rejected wholesale."""
    keep_parts = []
    for r in ff_pdf.itertuples(index=False):
        base, n = int(r.base_doc), int(r.num_docs)
        seg_docs = docs[(docs >= base) & (docs < base + n)]
        if len(seg_docs) == 0:
            continue
        inside_lo = lo is None or r.ts_min >= lo
        inside_hi = hi is None or r.ts_max < hi
        if inside_lo and inside_hi:
            keep_parts.append(seg_docs)
            continue
        outside = (lo is not None and r.ts_max < lo) or (hi is not None and r.ts_min >= hi)
        if outside:
            continue
        ts = decode_u32_column(r.ts).astype(np.int64)
        vals = ts[seg_docs - base]
        m = np.ones(len(seg_docs), bool)
        if lo is not None:
            m &= vals >= lo
        if hi is not None:
            m &= vals < hi
        keep_parts.append(seg_docs[m])
    if not keep_parts:
        return np.empty(0, np.int64)
    return np.concatenate(keep_parts)


def f64_sort_keys(vals: np.ndarray) -> np.ndarray:
    """Monotonic f64 → int64 mapping — the tantivy-common f64↔u64 trick
    recast into signed space so the existing int64 sort/merge machinery
    (leaf heap, root merge, cursor comparisons) carries doubles unchanged:
    non-negative doubles keep their raw bit pattern (already ascending as
    int64), negatives map to the bit complement re-signed (ascending with
    the double, and below every non-negative key).  NaNs are unsupported
    (fast f64 columns are built from finite non-null values)."""
    bits = np.ascontiguousarray(vals, dtype=np.float64).view(np.int64)
    u = bits.view(np.uint64)
    u = np.where(bits >= 0, u | np.uint64(1 << 63), ~u)
    return (u ^ np.uint64(1 << 63)).view(np.int64)


def sort_key_to_f64(key: int) -> float:
    """Inverse of f64_sort_keys for one key (display conversion: hits show
    the double, the wire carries the int64 key)."""
    if key >= 0:
        return float(np.array(key, np.int64).view(np.float64)[()])
    u0 = ~(np.uint64(np.int64(key)) ^ np.uint64(1 << 63))
    return float(np.array(u0, np.uint64).view(np.float64)[()])


def _fast_field_values(
    field: str,
    ff_pdf: pd.DataFrame,
    lens: np.ndarray,
    docs: np.ndarray,
    memo: dict | None = None,
) -> np.ndarray:
    """``memo`` (the split's decoded-lens attrs dict, score_split) keeps
    the whole-column decode one-per-worker instead of one-per-unit — a
    sort-by-ts unit on a 5.1M-doc split otherwise re-decodes 5.1M values
    per invocation, same economics as the doc_lens memo."""
    if field == "doc_len":
        return lens[docs]
    mkey = f"ffv_{field}"
    if memo is not None and mkey in memo:
        return memo[mkey][docs]
    if field == "ts":
        vals = np.concatenate([decode_u32_column(b) for b in ff_pdf["ts"]]).astype(np.int64)
    else:
        col = f"ff_{field}"  # generic fast i64/u64/f64 columns
        if col not in ff_pdf.columns:
            raise ValueError(f"unsupported sort fast field: {field}")
        vals_raw = [np.asarray(v) for v in ff_pdf[col]]
        if any(v.dtype.kind == "f" for v in vals_raw):
            # f64 fast fields sort via the monotonic int64 key (tantivy
            # stores f64 fast fields as monotonic u64 the same way); the
            # root converts keys back to doubles for display
            vals = f64_sort_keys(np.concatenate([v.astype(np.float64) for v in vals_raw]))
        else:
            vals = np.concatenate([v.astype(np.int64) for v in vals_raw])
    if memo is not None:
        memo[mkey] = vals
    return vals[docs]


# ---------------------------------------------------------------------------
# root search
# ---------------------------------------------------------------------------


def _leaf_hits_df(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    stream_fields: tuple[str, ...] | None = None,
    stream_scored: bool = False,
) -> tuple[DataFrame, list[SplitMetadata], object, IndexConfig]:
    """Stream-mode leaf as a DataFrame (every matching doc, no top-k) —
    the data-scale path behind search_stream/export_stream.  Top-k search
    deliberately does NOT come through here: it is the separate RDD
    _leaf_hit_rows job (see its docstring for why).  stream_fields adds
    one ``mf_<i> long`` column per resolved fast field; stream_scored
    fills the score column with full BM25 (field collapse)."""
    cat, config, ast, splits, terms, buckets, scorer, _gstats = _plan_leaf(
        spark,
        index_dir,
        request,
        "stream",
        stream_fields=stream_fields,
        stream_scored=stream_scored,
    )
    schema = HITS_SCHEMA
    if stream_fields:
        schema += "".join(f", mf_{i} long" for i in range(len(stream_fields)))
    if not splits:
        empty = spark.createDataFrame([], schema)
        return empty, splits, ast, config

    sids = [s.split_id for s in splits]
    runner = _make_leaf_runner(
        scorer, index_dir, terms, buckets, need_positions=_contains_phrase(ast)
    )
    # ZERO-shuffle, zero-scan leaf: ONE mapInPandas stage over a tiny
    # in-memory DataFrame of split ids (the SearchJob list, root.rs:280-284);
    # each task opens its splits' fastfields + needed postings itself with
    # pyarrow, exactly like a reference leaf opens a split (leaf.rs:94-114).
    # No cogroup, no exchange, no driver-side file listing — a query is one
    # Spark stage + a driver merge.
    sid_df = spark.createDataFrame([(s,) for s in sids], "split_id string")
    hits = sid_df.mapInPandas(runner, schema)
    return hits, splits, ast, config


def _split_files(index_dir: str, table: str, split_id: str) -> list[str]:
    d = os.path.join(index_dir, table, f"split_id={split_id}")
    _count_read("list")
    return storage_for(index_dir).list_files(d)


def _limit_arrow_threads():
    """Inside a Spark python worker: cap pyarrow's internal CPU pool.  Each
    of the N worker processes would otherwise spawn an N-thread Arrow pool
    (N^2 runnable threads per host); leaf reads are tiny, one thread each is
    faster in aggregate."""
    try:
        import pyarrow as pa

        if pa.cpu_count() > 1:
            pa.set_cpu_count(1)
    except Exception:
        pass


# Worker-side caches, safe because split dirs are IMMUTABLE once published
# (merge/demux create new split ids; GC only deletes dirs that are never
# queried again).  Python workers are reused across Spark jobs, so these
# persist across queries — the executor-local storage/fast-field cache
# analog (quickwit-storage/src/cache, docs/design/querying.md:42-43).
_WORKER_FF_CACHE: dict = {}
_WORKER_DSET_CACHE: dict = {}

# -- split-open storage-read accounting --------------------------------------
# Counts the storage round trips a split open performs BEFORE the first
# postings data byte (HEAD/GET/LIST/parquet-footer reads).  The hotcache
# path costs exactly 2 per cold split (1 HEAD epoch probe + 1 hotcache
# GET); the legacy listing path costs 2 LISTs + a footer GET per postings
# part.  Tests and the BASELINE.md cold-open evidence read these.
_OPEN_READS = {"head": 0, "get": 0, "list": 0, "footer": 0}


def _count_read(kind: str, n: int = 1) -> None:
    _OPEN_READS[kind] = _OPEN_READS.get(kind, 0) + n


def split_open_read_counts(reset: bool = False) -> dict:
    out = dict(_OPEN_READS)
    if reset:
        for k in _OPEN_READS:
            _OPEN_READS[k] = 0
    return out


def _hotcache_enabled(st) -> bool:
    """Hotcache serves the read path on object stores (where round trips
    dominate a cold open); local filesystems keep mmap'd pyarrow datasets.
    QW_FORCE_HOTCACHE=1 forces it on local paths (tests / A-B timing)."""
    return (not st.is_local) or os.environ.get("QW_FORCE_HOTCACHE") == "1"


_WORKER_HOTCACHE_CACHE: dict = {}
_HOTCACHE_CACHE_BYTES = [0]
# (index_dir, split_id) → (probe_deadline, hc_or_None): within the TTL the
# epoch HEAD is skipped entirely, so the fastfields and postings opens of
# ONE query share a single probe (and a split with no sidecar — pre-
# hotcache build — doesn't pay a HEAD per table).  2 s bounds staleness:
# published splits are immutable, so only a delete-and-rebuild at the same
# path could change the object, and the driver re-plans from the catalog
# token on that event anyway.
_HOTCACHE_PROBE_MEMO: dict = {}
_HOTCACHE_PROBE_TTL = 2.0


def _cached_hotcache(index_dir: str, split_id: str):
    """The split's parsed hotcache sidecar, or None (local storage, or a
    split written before hotcache existed → caller falls back to the
    listing path).  Cold cost: ONE HEAD (the epoch token — rebuilds at the
    same path must invalidate worker caches) + ONE GET."""
    import time as _time

    import pyarrow.fs as pafs

    from ..index.hotcache import Hotcache, hotcache_path

    st = storage_for(index_dir)
    if not _hotcache_enabled(st):
        return None
    memo_key = (index_dir, split_id)
    memo = _HOTCACHE_PROBE_MEMO.get(memo_key)
    now = _time.monotonic()
    if memo is not None and now < memo[0]:
        return memo[1]
    path = hotcache_path(index_dir, split_id)
    _count_read("head")
    info = st.info(path)
    if info.type != pafs.FileType.File:
        _lru_put(_HOTCACHE_PROBE_MEMO, memo_key, (now + _HOTCACHE_PROBE_TTL, None), 4096)
        return None
    token = (info.mtime_ns, info.size)
    key = (index_dir, split_id, token)
    hc = _WORKER_HOTCACHE_CACHE.get(key)
    if hc is not None:
        _lru_put(_HOTCACHE_PROBE_MEMO, memo_key, (now + _HOTCACHE_PROBE_TTL, hc), 4096)
        return hc
    _count_read("get")
    try:
        hc = Hotcache(index_dir, split_id, st.read_bytes(path), token)
    except (FileNotFoundError, OSError, ValueError):
        return None  # vanished/foreign-version sidecar → listing fallback
    cap = int(os.environ.get("QW_HOTCACHE_CACHE_MB", "512")) << 20
    # charge 3x the raw sidecar bytes: a cached entry also pins the
    # lazily-parsed fastfields DataFrame (typically 2-4x the snappy bytes)
    # and per-part ParquetFile handles — raw-size accounting let real
    # worker memory exceed the knob severalfold
    charge = 3 * hc.nbytes
    if charge <= cap:
        old = _WORKER_HOTCACHE_CACHE.pop(key, None)
        if old is not None:
            _HOTCACHE_CACHE_BYTES[0] -= 3 * old.nbytes
            old.close()
        _WORKER_HOTCACHE_CACHE[key] = hc
        _HOTCACHE_CACHE_BYTES[0] += charge
        while _HOTCACHE_CACHE_BYTES[0] > cap and _WORKER_HOTCACHE_CACHE:
            oldest = next(iter(_WORKER_HOTCACHE_CACHE))
            gone = _WORKER_HOTCACHE_CACHE.pop(oldest)
            _HOTCACHE_CACHE_BYTES[0] -= 3 * gone.nbytes
            gone.close()  # release fds + parsed fastfields
    _lru_put(_HOTCACHE_PROBE_MEMO, memo_key, (now + _HOTCACHE_PROBE_TTL, hc), 4096)
    return hc


def _lru_put(cache: dict, key, value, cap: int):
    cache[key] = value
    while len(cache) > cap:
        cache.pop(next(iter(cache)))


def _split_epoch(index_dir: str, table: str, split_id: str) -> float:
    """Change-detection token folded into every worker cache key.
    Published split DIRS never mutate, but deterministic build ids mean a
    delete-and-rebuild at the same path REUSES split ids.  Local disk: one
    dir-mtime stat (~µs).  Object stores have no directory mtime, so hash
    the file listing (name/size/mtime) instead — one LIST per probe (~ms),
    the price of not serving stale postings from a long-lived server after
    an index is rebuilt in place."""
    st = storage_for(index_dir)
    path = os.path.join(index_dir, table, f"split_id={split_id}")
    if st.is_local:
        _count_read("head")
        return st.mtime(path)
    _count_read("list")
    return st.listing_fingerprint(path)


def _cached_fastfields(index_dir: str, split_id: str) -> pd.DataFrame | None:
    hc = _cached_hotcache(index_dir, split_id)
    if hc is not None:
        # embedded in the hotcache sidecar: zero further storage reads
        return hc.fastfields_pdf()
    key = (index_dir, split_id, _split_epoch(index_dir, "fastfields", split_id))
    if key in _WORKER_FF_CACHE:
        return _WORKER_FF_CACHE[key]
    st = storage_for(index_dir)
    files = _split_files(index_dir, "fastfields", split_id)
    try:
        pdf = st.dataset(files).to_table().to_pandas() if files else None
    except FileNotFoundError:
        # listed files deleted by a concurrent merge+GC before the read:
        # same contract as an already-gone split (caller yields vanished);
        # never cached — the next call sees the post-GC state
        return None
    _lru_put(_WORKER_FF_CACHE, key, pdf, 256)
    return pdf


def _cached_docs_dataset(index_dir: str, split_id: str):
    key = (index_dir, "docs", split_id, _split_epoch(index_dir, "docs", split_id))
    if key in _WORKER_DSET_CACHE:
        return _WORKER_DSET_CACHE[key]
    st = storage_for(index_dir)
    files = _split_files(index_dir, "docs", split_id)
    dset = st.dataset(files) if files else None
    _lru_put(_WORKER_DSET_CACHE, key, dset, 256)
    return dset


def _cached_postings_dataset(index_dir: str, split_id: str):
    """pyarrow dataset handle per split (file listing + parquet footers are
    parsed once per worker, the split-footer-cache analog, leaf.rs:47-55)."""
    key = (index_dir, split_id, _split_epoch(index_dir, "postings", split_id))
    if key in _WORKER_DSET_CACHE:
        return _WORKER_DSET_CACHE[key]
    st = storage_for(index_dir)
    files = _split_files(index_dir, "postings", split_id)
    _count_read("footer", len(files))  # dataset open parses each part's footer
    dset = st.dataset(files) if files else None
    _lru_put(_WORKER_DSET_CACHE, key, dset, 256)
    return dset


def _stat_minmax(col_stats):
    if col_stats is None or not col_stats.has_min_max:
        return None
    return col_stats.min, col_stats.max


def _read_split_postings_chunks(
    index_dir: str, split_id: str, field: str, term: str, ords: list[int],
    bucket: int | None = None,
    col: str = "positions",
) -> list[bytes]:
    """Fetch specific CHUNK rows of one term — positions chunks
    (chunk_ord >= 1, ``col='positions'``) or position-bitmap chunks
    (chunk_ord <= -1, ``col='pos_bm'``) — worker-cached like posting
    rows; row-group pruning on (bucket, field, term, chunk_ord) keeps the
    read to the asked chunks, and the column projection keeps it to the
    asked PAYLOAD (bitmap fetches never drag positions bytes).
    ``bucket`` is the primary row's stored bucket value (saves the
    config/catalog round trip a recompute would cost in a worker)."""
    import pyarrow.dataset as pads

    cap = _postings_cache_cap()
    hc = _cached_hotcache(index_dir, split_id)
    epoch = (
        hc.token if hc is not None
        else (_split_epoch(index_dir, "postings", split_id) if cap else 0.0)
    )
    out: dict[int, bytes] = {}
    missing = []
    for o in ords:
        ck = (index_dir, split_id, epoch, field, term, "__pchunk__", o)
        hit = _WORKER_POSTINGS_CACHE.get(ck) if cap else None
        if hit is not None:
            out[o] = hit[col].iloc[0]
        else:
            missing.append(o)
    if missing:
        _PHRASE_CTR["bm_chunk_fetches" if col == "pos_bm" else "pos_chunk_fetches"] += len(missing)
        if bucket is not None:
            bkt = int(bucket)
        else:
            from ..functions.codec import term_bucket

            _, config = open_index(None, index_dir)
            bkt = term_bucket(field, term, config.term_merge_buckets)
        if hc is not None:
            pdf = _hotcache_read_postings(
                hc, storage_for(index_dir), [bkt], [(field, term)],
                chunk_ords=missing, chunk_col=col,
            )
        else:
            dset = _cached_postings_dataset(index_dir, split_id)
            cond = (
                (pads.field("field") == field)
                & (pads.field("term") == term)
                & pads.field("chunk_ord").isin(missing)
                & pads.field("bucket").isin([bkt])
            )
            cols = [
                c for c in ("field", "term", "chunk_ord", col)
                if c in dset.schema.names
            ]
            try:
                pdf = dset.to_table(filter=cond, columns=cols).to_pandas()
            except FileNotFoundError as e:
                raise SplitVanishedError(
                    f"split vanished during positions-chunk read: {split_id}"
                ) from e
        for o in missing:
            sub = pdf[pdf["chunk_ord"] == o]
            if len(sub) != 1:
                raise SplitVanishedError(
                    f"{col} chunk {field}:{term}#{o} missing in {split_id}"
                )
            out[o] = sub[col].iloc[0]
            if cap:
                _postings_cache_put(
                    (index_dir, split_id, epoch, field, term, "__pchunk__", o),
                    sub[[col, "chunk_ord"]],
                    cap,
                )
    return [out[o] for o in ords]


def _hotcache_read_postings(
    hc, st, buckets: list[int], terms: list[tuple[str, str]],
    chunk_ords: list[int] | None = None,
    need_positions: bool = True,
    chunk_col: str = "positions",
) -> pd.DataFrame:
    """Postings rows for ``terms`` via the hotcache: row groups are pruned
    with the FOOTER-CACHED statistics (bucket ∧ field ∧ term min/max — the
    same superset the dataset filter path prunes with), selected groups are
    fetched as coalesced ranged reads, and rows are filtered exactly.
    Zero LISTs, zero footer GETs.  ``need_positions=False`` skips the
    positions AND pos_bm COLUMN chunks entirely (column projection on the
    ranged reads — the object-store byte saving is the point at scale: a
    term query never pays for phrase-only payloads).  Chunk-row fetches
    (``chunk_ords``) project down to ``chunk_col`` — positions chunks
    (ords > 0) never drag neighboring bitmap-chunk bytes and vice versa."""
    import pyarrow as pa
    import pyarrow.compute as pc

    want_fields = sorted({f_ for f_, _ in terms})
    want_terms = sorted({t_ for _, t_ in terms})
    bucket_set = set(buckets or [])
    parts: list[pd.DataFrame] = []
    for name, _size in hc.files("postings"):
        try:
            pf = hc.parquet_file(st, "postings", name)
            md = pf.metadata
            idx = {md.schema.column(j).name: j for j in range(md.num_columns)}
            has_chunk_col = "chunk_ord" in idx
            if chunk_ords and not has_chunk_col:
                continue  # pre-chunking file: no chunk rows to find
            groups = []
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                bk = _stat_minmax(rg.column(idx["bucket"]).statistics)
                if bucket_set and bk is not None and not any(
                    bk[0] <= b <= bk[1] for b in bucket_set
                ):
                    continue
                fd = _stat_minmax(rg.column(idx["field"]).statistics)
                if fd is not None and not any(fd[0] <= f_ <= fd[1] for f_ in want_fields):
                    continue
                tm = _stat_minmax(rg.column(idx["term"]).statistics)
                if tm is not None and not any(tm[0] <= t_ <= tm[1] for t_ in want_terms):
                    continue
                if has_chunk_col:
                    co = _stat_minmax(rg.column(idx["chunk_ord"]).statistics)
                    if co is not None:
                        if chunk_ords is None:
                            # pure chunk-row group: all-positive (positions
                            # chunks) or all-negative (bitmap chunks)
                            if co[0] > 0 or co[1] < 0:
                                continue
                        elif co[1] < min(chunk_ords) or co[0] > max(chunk_ords):
                            continue
                groups.append(g)
            if not groups:
                continue
            # TOP-LEVEL arrow names — md.schema flattens list columns
            # into leaf paths, which read_row_groups would not match
            names = pf.schema_arrow.names
            read_cols = None
            if chunk_ords is not None:
                read_cols = [
                    c for c in ("field", "term", "chunk_ord", chunk_col)
                    if c in names
                ]
            elif not need_positions:
                read_cols = [
                    c for c in names if c not in ("positions", "pos_bm")
                ] or None
            tbl = pf.read_row_groups(groups, columns=read_cols)
        except (FileNotFoundError, OSError) as e:
            raise SplitVanishedError(
                f"split vanished during postings read: {hc.split_id}"
            ) from e
        mask = None
        for f_, t_ in terms:
            c = pc.and_(
                pc.equal(tbl.column("field"), pa.scalar(f_)),
                pc.equal(tbl.column("term"), pa.scalar(t_)),
            )
            mask = c if mask is None else pc.or_(mask, c)
        if has_chunk_col:
            co_col = tbl.column("chunk_ord")
            if chunk_ords is None:
                cm = pc.or_kleene(
                    pc.equal(co_col, pa.scalar(0, co_col.type)), pc.is_null(co_col)
                )
                cm = pc.fill_null(cm, True)
            else:
                cm = pc.fill_null(
                    pc.is_in(co_col, value_set=pa.array(chunk_ords, co_col.type)),
                    False,
                )
            mask = pc.and_(mask, cm)
        parts.append(tbl.filter(mask).to_pandas())
    if not parts:
        return pd.DataFrame(columns=["field", "term"])
    return parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)


# Posting-row cache: (index_dir, split_id, field, term) → 0..n-row pdf.
# The byte-range/hotcache analog (quickwit-storage/src/cache,
# CachingDirectory): hot terms' posting blobs are read from parquet once per
# worker, then served from memory across queries.  Bounded by payload bytes
# (QW_POSTINGS_CACHE_MB per python worker, 0 disables); absent terms are
# negatively cached as empty frames so they never re-scan.
_WORKER_POSTINGS_CACHE: dict = {}
_POSTINGS_CACHE_BYTES = [0]


def _postings_cache_cap() -> int:
    return int(os.environ.get("QW_POSTINGS_CACHE_MB", "128")) << 20


def _postings_nbytes(pdf: pd.DataFrame) -> int:
    n = 256 * max(1, len(pdf))  # per-row metadata floor
    for col in ("blob", "positions", "pos_bm"):
        if col in pdf.columns:
            n += int(
                sum(
                    len(v)
                    for v in pdf[col]
                    if v is not None and not isinstance(v, float)
                )
            )
    return n


def _postings_cache_put(key, pdf: pd.DataFrame, cap: int) -> None:
    nb = _postings_nbytes(pdf)
    if nb > cap:  # a single oversized entry would just thrash
        return
    old = _WORKER_POSTINGS_CACHE.pop(key, None)
    if old is not None:
        _POSTINGS_CACHE_BYTES[0] -= _postings_nbytes(old)
    _WORKER_POSTINGS_CACHE[key] = pdf
    _POSTINGS_CACHE_BYTES[0] += nb
    while _POSTINGS_CACHE_BYTES[0] > cap and _WORKER_POSTINGS_CACHE:
        oldest = next(iter(_WORKER_POSTINGS_CACHE))
        _POSTINGS_CACHE_BYTES[0] -= _postings_nbytes(_WORKER_POSTINGS_CACHE.pop(oldest))


def _read_split_postings(
    index_dir: str,
    split_id: str,
    terms: list[tuple[str, str]],
    buckets: list[int],
    need_positions: bool = True,
) -> pd.DataFrame:
    """In-task warmup read (leaf.rs:125-193 analog): exactly the query
    terms' posting rows of one split, row-group pruned by the bucket column
    (files are bucket-sorted in 4k-row groups); per-term rows are cached
    worker-side (see _WORKER_POSTINGS_CACHE).

    ``need_positions=False`` (no phrase in the query) drops the
    ``positions`` AND ``pos_bm`` COLUMNS from the scan — 'read exactly
    what the query needs' at the column level: a term query otherwise
    decompresses every matched row group's position payloads just to
    ignore them (measured 21 -> 5 ms per merged 200k-doc split; hot
    terms' inline bitmap cells are the same class of dead weight).  A
    cached positions-less row is upgraded (re-fetched in full, replaced)
    the first time a phrase query needs the same term."""
    import pyarrow.dataset as pads

    cap = _postings_cache_cap()
    hc = _cached_hotcache(index_dir, split_id)
    if cap:
        epoch = (
            hc.token if hc is not None
            else _split_epoch(index_dir, "postings", split_id)
        )
    else:
        epoch = 0.0
    parts: list[pd.DataFrame] = []
    missing: list[tuple[str, str]] = []
    for key in terms:
        hit = _WORKER_POSTINGS_CACHE.get((index_dir, split_id, epoch, *key)) if cap else None
        if hit is not None and (not need_positions or "positions" in hit.columns):
            parts.append(hit)
        else:
            missing.append(key)
    if missing:
        if hc is not None:
            pdf = _hotcache_read_postings(
                hc, storage_for(index_dir), buckets, missing,
                need_positions=need_positions,
            )
        else:
            dset = _cached_postings_dataset(index_dir, split_id)
            cond = None
            for f_, t_ in missing:
                c = (pads.field("field") == f_) & (pads.field("term") == t_)
                cond = c if cond is None else (cond | c)
            if dset is None:
                pdf = pd.DataFrame(columns=["field", "term"])
            else:
                if buckets:
                    # superset of the missing terms' buckets — pruning only
                    cond = pads.field("bucket").isin(buckets) & cond
                if "chunk_ord" in dset.schema.names:
                    # positions-CHUNK rows are fetched separately on demand
                    # (_read_split_postings_chunks), never in the term scan
                    cond = cond & (
                        (pads.field("chunk_ord") == 0)
                        | pads.field("chunk_ord").is_null()
                    )
                cols = None
                if not need_positions:
                    cols = [
                        c for c in dset.schema.names
                        if c not in ("positions", "pos_bm")
                    ]
                try:
                    pdf = dset.to_table(filter=cond, columns=cols).to_pandas()
                except FileNotFoundError as e:
                    # listing→read race with a concurrent merge+GC: vanished-
                    # split protocol (the leaf runner yields __vanished__)
                    raise SplitVanishedError(
                        f"split vanished during postings read: {split_id}"
                    ) from e
        for key in missing:
            sub = pdf[(pdf["field"] == key[0]) & (pdf["term"] == key[1])] if len(pdf) else pdf
            if cap:
                _postings_cache_put((index_dir, split_id, epoch, *key), sub, cap)
            parts.append(sub)
    if not parts:
        return pd.DataFrame(columns=["field", "term"])
    return parts[0] if len(parts) == 1 else pd.concat(parts, ignore_index=True)


# -- per-split term-presence pruning (termbloom.py sidecars) -----------------
# The reference pays ~one FST probe per split to learn a term is absent;
# our per-split miss is a whole Spark task, so the root drops splits that
# provably lack a required term BEFORE the leaf job is scheduled.  Blooms
# are loaded once per split (immutable; byte-capped LRU keyed on the
# split's update_ts) and probed in memory — a rare-term query over 10^4
# splits schedules O(matching splits) tasks, not O(splits).

_TERMBLOOM_CACHE: dict = {}
_TERMBLOOM_CACHE_BYTES = [0]


def _ast_may_match(node, probe) -> bool:
    """Conservative may-match: False ONLY when the probe proves no doc of
    the split can satisfy the node.  probe((field, term)) answers 'may the
    split contain this term'.  must_not is ignored (it only shrinks);
    minimum_should_match is relaxed to 1 (ties the predicate to what a
    presence probe can actually prove)."""
    if isinstance(node, TermQuery):
        return probe((node.field, node.term))
    if isinstance(node, PhraseQuery):
        return all(probe((node.field, t)) for t in node.terms)
    if isinstance(node, BoolQuery):
        if not all(_ast_may_match(c, probe) for c in node.must):
            return False
        if not node.must and node.should:
            return any(_ast_may_match(c, probe) for c in node.should)
        return True
    return True  # Exists / All: probe-less, never prunable by terms


def _term_prunable(node, df_map, nd: int, frac: float) -> bool:
    """Is bloom probing worth the loads?  Only when some REQUIRED atom is
    rare (df <= frac*num_docs) — a must term / any phrase term — or the
    query is a pure disjunction of rare atoms (then 'lacks them all'
    prunes).  Hot-term queries match almost every split; probing them
    would load blooms for nothing."""
    if isinstance(node, TermQuery):
        return df_map.get((node.field, node.term), 0) <= frac * nd
    if isinstance(node, PhraseQuery):
        return any(df_map.get((node.field, t), 0) <= frac * nd for t in node.terms)
    if isinstance(node, BoolQuery):
        if node.must:
            return any(_term_prunable(c, df_map, nd, frac) for c in node.must)
        if node.should:
            return all(_term_prunable(c, df_map, nd, frac) for c in node.should)
    return False


def _load_termblooms(index_dir: str, splits: list[SplitMetadata]) -> dict:
    """split_id → TermBloom (or None: sidecar absent / unreadable).  Cold
    loads fan out over a small thread pool (one small GET each); hits are
    in-memory.  Missing sidecars negative-cache so pre-bloom indexes pay
    one exists() per split per process, not per query."""
    from concurrent.futures import ThreadPoolExecutor

    from ..index.termbloom import TermBloom, bloom_path

    st = storage_for(index_dir)
    cap = int(os.environ.get("QW_TERMBLOOM_CACHE_MB", "256")) << 20
    out: dict = {}
    missing = []
    for s in splits:
        key = (index_dir, s.split_id, s.update_ts)
        try:
            hit = _TERMBLOOM_CACHE.pop(key)  # pop+reinsert = LRU touch
            _TERMBLOOM_CACHE[key] = hit
            out[s.split_id] = hit
        except KeyError:  # absent, or a racing client evicted it
            missing.append(s)

    def load(s):
        try:
            return s, TermBloom(st.read_bytes(bloom_path(index_dir, s.split_id)))
        except (FileNotFoundError, OSError, ValueError):
            return s, None

    if missing:
        if len(missing) > 1:
            with ThreadPoolExecutor(max_workers=min(32, len(missing))) as pool:
                loaded = list(pool.map(load, missing))
        else:
            loaded = [load(missing[0])]
        for s, tb in loaded:
            out[s.split_id] = tb
            _TERMBLOOM_CACHE[(index_dir, s.split_id, s.update_ts)] = tb
            _TERMBLOOM_CACHE_BYTES[0] += tb.nbytes if tb is not None else 64
        while _TERMBLOOM_CACHE_BYTES[0] > cap and _TERMBLOOM_CACHE:
            try:  # concurrent clients share this cache; a racing pop is fine
                gone = _TERMBLOOM_CACHE.pop(next(iter(_TERMBLOOM_CACHE)))
            except (KeyError, StopIteration, RuntimeError):
                continue
            _TERMBLOOM_CACHE_BYTES[0] -= gone.nbytes if gone is not None else 64
    return out


def prune_splits_by_terms(
    index_dir: str, splits: list[SplitMetadata], ast, gstats
) -> tuple[list[SplitMetadata], int]:
    """Drop splits that provably lack a required term.  Returns (kept,
    n_pruned).  Three gates before any sidecar read: the kill switch, a
    global-df zero check (a required term absent from the WHOLE index
    answers the query with no splits at all), and the min-splits /
    selectivity gates (below a handful of splits the leaf is in-process
    and pruning can't pay; hot-term queries match everywhere)."""
    if not splits or os.environ.get("QW_TERMPRUNE", "1") != "1":
        return splits, 0
    df_map = gstats["df"]
    if not _ast_may_match(ast, lambda key: df_map.get(key, 0) > 0):
        return [], len(splits)
    if len(splits) < int(os.environ.get("QW_TERMPRUNE_MIN_SPLITS", "9")):
        return splits, 0
    nd = max(int(gstats["num_docs"]), 1)
    frac = float(os.environ.get("QW_TERMPRUNE_MAX_DF_FRAC", "0.05"))
    if not _term_prunable(ast, df_map, nd, frac):
        return splits, 0
    blooms = _load_termblooms(index_dir, splits)
    kept = []
    for s in splits:
        tb = blooms.get(s.split_id)
        if tb is None:
            kept.append(s)  # probe-less split: never pruned
            continue
        probe = lambda key, _tb=tb: (  # noqa: E731
            df_map.get(key, 0) > 0 and _tb.may_contain(*key)
        )
        if _ast_may_match(ast, probe):
            kept.append(s)
    return kept, len(splits) - len(kept)


def _plan_leaf(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    mode: str,
    fetch_in_leaf: bool = True,
    stream_fields: tuple[str, ...] | None = None,
    stream_scored: bool = False,
):
    """Shared driver-side planning: parse, prune, stats, scorer."""
    cat, config = open_index(spark, index_dir)
    ast = parse_query(request.query, config, request.search_fields)
    _validate_msm(ast, request)
    ast = expand_prefixes(spark, index_dir, cat, ast)
    splits = prune_splits(cat, config, ast, request)
    terms = collect_terms(ast)
    buckets = term_buckets(spark, terms, config.term_merge_buckets)
    gstats = global_term_stats(spark, index_dir, cat, terms, buckets)
    splits, n_term_pruned = prune_splits_by_terms(index_dir, splits, ast, gstats)
    gstats["splits_pruned_terms"] = n_term_pruned
    scorer = make_split_scorer(
        config,
        gstats,
        ast,
        request,
        mode,
        index_dir if fetch_in_leaf else None,
        stream_fields=stream_fields,
        stream_scored=stream_scored,
        source_dir=index_dir,  # chunked position payloads resolve their split
    )
    return cat, config, ast, splits, sorted(terms), buckets, scorer, gstats


def _leaf_hit_rows(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    only_split_ids: set[str] | None = None,
) -> list[dict]:
    """Top-k leaf search as ONE plain-RDD mapPartitions job.

    Deliberately an RDD, not a DataFrame: the job's input is the SearchJob
    list (root.rs:280-284) — a few hundred split ids — and its output is at
    most splits*(offset+k) already-top-k'd rows, both metadata-scale.  The
    per-partition work is genuinely imperative (open split, decode postings,
    run the collector), and the DataFrame/mapInPandas machinery adds a
    measured ~300 ms of fixed per-query cost (Catalyst analysis + Arrow
    python-runner setup) over `sc.parallelize(...).mapPartitions` at the
    same slice count.  Data-scale paths (stream export) stay on DataFrames.
    Slices are contiguous ranges of the split list — no hash partitioning,
    so no balls-in-bins task skew.

    Stored-field fetch happens DRIVER-side afterwards, for only the global
    page (offset..offset+k): leaves fetching their local top-k would read
    ~splits× more doc rows than the answer needs (the dominant per-split
    cost at high split counts).  Exception: the 'global_key' tiebreak sorts
    on doc fields, so those must come back from the leaves."""
    fetch_in_leaf = request.tiebreak == "global_key"
    _, _, ast, splits, terms, buckets, scorer, gstats = _plan_leaf(
        spark, index_dir, request, "topk", fetch_in_leaf
    )
    if only_split_ids is not None:
        # the caller already answered the other splits from metadata
        # (match-all count fast path) — the leaf touches only these
        splits = [s for s in splits if s.split_id in only_split_ids]
    if not splits:
        return []
    sids = [s.split_id for s in splits]
    need_pos = _contains_phrase(ast)  # column-pruned postings scan otherwise

    def run(it):
        _limit_arrow_threads()
        ctr = _phrase_ctr()  # live module dict (see _phrase_ctr docstring)
        base = dict(ctr)
        for sid, u_lo, u_hi in it:
            try:
                ff_pdf = _cached_fastfields(index_dir, sid)
                if ff_pdf is None:  # GC raced us — root re-plans (see below)
                    yield {"split_id": sid, "__vanished__": True}
                    continue
                postings_pdf = _read_split_postings(
                    index_dir, sid, terms, buckets, need_positions=need_pos
                )
                out = scorer((sid,), postings_pdf, ff_pdf, u_lo, u_hi)
            except (FileNotFoundError, SplitVanishedError):
                # mid-read race (listed files deleted by a concurrent
                # merge+GC): same protocol as a pre-read vanish
                yield {"split_id": sid, "__vanished__": True}
                continue
            for rec in out.to_dict("records"):
                rec["__lo"] = u_lo or 0  # root sums hits per disjoint range
                yield rec
        # phrase-path observability: one tiny record per task with the
        # counter DELTAS this task produced (zero for term queries — no
        # record, no cost); the root aggregates them
        delta = {k: ctr[k] - base[k] for k in ctr}
        if any(delta.values()):
            yield {"__counters__": delta}

    est = _est_split_rows(ast, gstats, len(splits))
    # Tiny indexes + light queries: run the leaf in-process — the
    # single-node-search analog (lib.rs:153-198).  A Spark job costs a
    # ~0.2-0.4 s scheduling floor on this class of host; below the
    # thresholds the per-split work (~5-10 ms warm) is cheaper done inline.
    # The row gate keeps a few-big-splits post-merge index (where one
    # split's heavy-query work alone is ~100 ms) on the parallel path.
    if len(sids) <= int(os.environ.get("QW_DRIVER_LEAF_MAX_SPLITS", "8")) and est * len(
        sids
    ) <= float(os.environ.get("QW_DRIVER_LEAF_MAX_ROWS", "50000")):
        rows = list(run([(s, None, None) for s in sids]))
    else:
        sc = spark.sparkContext
        bins = _leaf_bins(splits, sc.defaultParallelism, est, _ranged_ok(ast, request))
        rows = sc.parallelize(bins, len(bins)).flatMap(run).collect()
    agg: dict = {}
    for r in rows:
        if "__counters__" in r:
            for k, v in r["__counters__"].items():
                agg[k] = agg.get(k, 0) + v
    LAST_PHRASE_COUNTERS.clear()
    LAST_PHRASE_COUNTERS.update(agg)
    rows = [r for r in rows if "__counters__" not in r]
    gone = [r["split_id"] for r in rows if r.get("__vanished__")]
    if gone:
        raise SplitVanishedError(f"splits vanished during query: {sorted(gone)}")
    return rows


def _est_split_rows(asts, gstats, n_splits: int) -> float:
    """Expected decoded posting rows per split — the leaf cost model that
    picks the task fan-out.  Phrase terms count 3x (their position payloads
    decode alongside docs+tfs); accepts one AST or a list (multi_search)."""
    df_map = gstats["df"]
    total = 0.0

    def walk(node):
        nonlocal total
        if isinstance(node, TermQuery):
            total += df_map.get((node.field, node.term), 0)
        elif isinstance(node, PhraseQuery):
            for t in node.terms:
                total += 3.0 * df_map.get((node.field, t), 0)
        elif isinstance(node, (AllQuery, ExistsQuery)):
            total += gstats["num_docs"]  # matches many docs, zero decode
        else:
            for c in (*node.must, *node.should, *node.must_not):
                walk(c)

    for ast in asts if isinstance(asts, list) else [asts]:
        walk(ast)
    return total / max(n_splits, 1)


def _ranged_ok(asts, reqs) -> bool:
    """May the planner carve doc-range units for this batch?  Yes for
    position-verifying queries (phrase work parallelizes; positions are
    chunk-fetched per unit) and for batches whose every query runs a
    BLOCK-SLICED strategy (WAND / MaxScore decode only their range's
    blocks, so a unit re-reads just the small doc blob) — full-eval
    queries would duplicate an O(df) whole-row decode per unit instead
    (measured: AND 1.2 s -> 1.7 s when carved at 1M-doc splits).  The
    adaptive rule in _leaf_bins still carves ONLY to fill idle cores, so
    this matters exactly at the few-huge-splits shape (e.g. 2x5M docs on
    32 cores: single-term p50 2.75 s uncarved)."""
    reqs = reqs if isinstance(reqs, list) else [reqs]
    asts_l = asts if isinstance(asts, list) else [asts]
    if _contains_phrase(asts_l):
        return True
    return all(
        select_strategy(a, r) in ("block_max_wand", "maxscore_union")
        for a, r in zip(asts_l, reqs)
    )


def _contains_phrase(asts) -> bool:
    """Does any query of the batch verify positions?  Doc-range units pay
    off exactly there: position decode + adjacency verification dominates
    and parallelizes, while term-only queries are decode-bound and ranges
    would just duplicate the whole-row decode per range (measured: phrase
    p50 6.9 s -> 2.3 s on 1M-doc merged splits, AND 1.2 s -> 1.7 s)."""

    def walk(node) -> bool:
        if isinstance(node, PhraseQuery):
            return True
        if isinstance(node, BoolQuery):
            return any(walk(c) for c in (*node.must, *node.should, *node.must_not))
        return False

    return any(walk(a) for a in (asts if isinstance(asts, list) else [asts]))


def _leaf_bins(
    splits: list[SplitMetadata],
    default_parallelism: int,
    est_rows_per_split: float,
    ranged_ok: bool = False,
) -> list[list[tuple[str, int | None, int | None]]]:
    """Leaf task bins of (split_id, doc_lo, doc_hi) units — (sid, None,
    None) is a whole split.  Pack QW_LEAF_SPLITS_PER_TASK splits per task
    (default 4) for LIGHT queries, one bin per core for HEAVY ones; bins
    fill by longest-processing-time greedy on unit doc counts so big
    (merged) splits never stack into one task.

    HEAVY queries with ``ranged_ok`` (position-verifying, see
    _contains_phrase) additionally carve splits above QW_LEAF_RANGE_DOCS
    (default 512k; a 256k..1M sweep at the 2x5.1M-doc shape measured
    512k best for BOTH phrase and single-term — smaller units duplicate
    per-unit fixed work (whole-column memo warm-up, bitmap-chunk fetch)
    faster than they buy parallelism) into contiguous doc ranges — the sub-split parallelism
    analog of tantivy's segment-parallel search: a post-merge index of a
    few 1M-doc splits would otherwise cap a query at num_splits tasks no
    matter how many cores the cluster has.  Every query class slices its
    doc lists to the range before the expensive work (BM25/top-k/positions)
    and exact num_hits sums over disjoint ranges at the root.

    The reference plans 1 cost-unit per split but BATCHES all of a node's
    jobs into one gRPC leaf request (root.rs:280-284, cluster_client.rs) —
    the analog here is several splits per Spark task.  Measured on this
    box: the per-task floor is ~15 ms while one split's light leaf work is
    ~5-10 ms, so 1-split tasks make small-k queries floor-bound (p50 0.66 s
    at 52 tasks vs 0.45 s at 13 tasks).  A heavy query inverts it — a
    phrase over 32 post-merge 32k-doc splits packed 4/task ran 1.76 s where
    single-split tasks run it at ~2x less — so above QW_LEAF_HEAVY_ROWS
    estimated decoded rows per split, parallelism wins.  The default
    (100k rows ~ 70-100 ms of per-split work at the measured ~0.7 us/row)
    is deliberately high: the RDD job dispatch floor grows with slice
    count (~0.29 s at 32 slices on this box), so unpacking pays only when
    per-split work clearly dominates it."""
    per = int(os.environ.get("QW_LEAF_SPLITS_PER_TASK", "4"))
    heavy_rows = float(os.environ.get("QW_LEAF_HEAVY_ROWS", "100000"))
    range_docs = int(os.environ.get("QW_LEAF_RANGE_DOCS", "524288"))
    heavy = est_rows_per_split > heavy_rows
    # Adaptive carving: a doc-range unit pays the split's posting-ROW fetch
    # again (a hot phrase term's positions cell is MBs — every unit of the
    # split re-reads it), so carving only pays when it fills otherwise-IDLE
    # cores.  Spread the big splits' docs over the idle slots and never
    # carve finer than range_docs; with splits >= cores, don't carve at all
    # (measured on the 10M-turn soak's 29x390k merged layout: unconditional
    # 262k carving p50 2.9 s vs whole-split tasks 1.3 s — the carves only
    # duplicated 5 MB positions reads).
    eff_range = None
    if heavy and ranged_ok and range_docs > 0:
        big = [s for s in splits if s.num_docs > range_docs * 3 // 2]
        slots = default_parallelism - (len(splits) - len(big))
        if big and len(big) < slots:
            # carve FINER than one unit per idle core: with exactly
            # slots units any straggler (worker cold caches, CPU steal)
            # doubles the query's wall time, while the marginal cost of
            # extra units is now small — chunked positions made the
            # per-unit payload fetch candidate-gated, and the primary
            # posting rows are worker-cached.  Measured on the 2x5.1M
            # layout: factor sweep 1/2/3/4 → phrase min 4.16/3.32/3.15/
            # 2.90 s (best-of-5 each) — finer units keep winning until
            # the range_docs floor stops them.  The factor applies ONLY
            # when big splits fill at most half the cores (the genuinely
            # few-huge-splits shape): at 29 merged splits on 32 cores the
            # factor-4 carve re-fetched every unit's (now bitmap-laden)
            # primary rows for nothing — measured 2.03 vs 0.84 s uncarved
            # on the 10M soak's merged layout
            factor = (
                max(1, int(os.environ.get("QW_LEAF_CARVE_FACTOR", "4")))
                if len(big) * 2 <= slots
                else 1
            )
            eff_range = max(
                range_docs,
                -(-sum(s.num_docs for s in big) // (slots * factor)),
            )
    units: list[tuple[str, int | None, int | None, int]] = []
    for s in splits:
        if eff_range is not None and s.num_docs > eff_range * 3 // 2:
            n_ranges = -(-s.num_docs // eff_range)
            step = -(-s.num_docs // n_ranges)
            for r in range(n_ranges):
                u_lo, u_hi = r * step, min((r + 1) * step, s.num_docs)
                units.append((s.split_id, u_lo, u_hi, u_hi - u_lo))
        else:
            units.append((s.split_id, None, None, max(s.num_docs, 1)))
    n = len(units)
    if per > 0 and not heavy:
        n_bins = max(1, min(default_parallelism, -(-n // per)))
    else:
        n_bins = max(1, min(n, default_parallelism))
    bins: list[list[tuple[str, int | None, int | None]]] = [[] for _ in range(n_bins)]
    load = [0] * n_bins
    for sid, u_lo, u_hi, w in sorted(units, key=lambda u: (-u[3], u[0], u[1] or 0)):
        i = min(range(n_bins), key=load.__getitem__)
        bins[i].append((sid, u_lo, u_hi))
        load[i] += w
    return [b for b in bins if b]


def multi_search(
    spark: SparkSession,
    index_dir: str,
    requests: list[SearchRequest],
    _retry: bool = False,
) -> list[SearchResponse]:
    """Batched root search: Q queries in ONE leaf job.

    The per-query fixed cost of a Spark job (~0.3 s of task scheduling at
    32 slices) dominates small-k search latency, so a query *stream* should
    amortize it: each leaf task opens a split once, reads the UNION of all
    queries' posting rows in one pruned pyarrow scan, and runs every
    query's scorer against it; rows come back tagged with the query index.
    Throughput therefore approaches Q/(floor + sum(work)) instead of
    Q/(Q*floor + sum(work)).  Results are identical to Q independent
    ``search`` calls (verified by test); the reference has no batched
    endpoint — this is the Spark-native throughput path."""
    t0 = time.monotonic()
    if any(r.tiebreak == "global_key" for r in requests):
        raise ValueError("multi_search supports only the 'reference' tiebreak")
    if any(r.score_explain for r in requests):
        raise ValueError(
            "score_explain is not supported in batched search — use search()"
        )
    cat, config = open_index(spark, index_dir)
    live_sids = {s.split_id for s in cat.splits()}
    for r in requests:
        # same user-input contract as the single-query path (_search_rows)
        if r.search_after is not None:
            if len(r.search_after) == 4:
                raise ValueError(
                    "index-qualified search_after cursors are for "
                    "multi_index_search, not batched single-index search"
                )
            if r.start_offset:
                raise ValueError(
                    "search_after and start_offset are mutually exclusive"
                )
            if r.search_after[1] not in live_sids:
                raise ValueError(
                    f"stale search_after cursor: split {r.search_after[1]!r} "
                    "no longer exists (replaced by a merge) — restart pagination"
                )
    requests = [resolve_sort(r, config) for r in requests]
    for r in requests:
        _validate_stored_fields(config, r)
    plans = []
    pre_plans = []
    all_terms: set[tuple[str, str]] = set()
    all_sids: dict[str, SplitMetadata] = {}
    for req in requests:
        ast = parse_query(req.query, config, req.search_fields)
        _validate_msm(ast, req)
        ast = expand_prefixes(spark, index_dir, cat, ast)
        splits = prune_splits(cat, config, ast, req)
        all_terms |= collect_terms(ast)
        pre_plans.append((req, ast, splits))
    buckets = term_buckets(spark, all_terms, config.term_merge_buckets)
    gstats = global_term_stats(spark, index_dir, cat, all_terms, buckets)
    for req, ast, splits in pre_plans:
        # per-query term-presence pruning — one query's rare term must not
        # drag every split of the batch into its scorer
        splits, _ = prune_splits_by_terms(index_dir, splits, ast, gstats)
        for s in splits:
            all_sids.setdefault(s.split_id, s)
        plans.append((req, ast, {s.split_id for s in splits}))
    scorers = [
        # index_dir=None keeps the in-task stored-field fetch OFF (the
        # batched leaf returns ids only); source_dir still lets chunked
        # position payloads resolve their split
        make_split_scorer(config, gstats, ast, req, "topk", None, source_dir=index_dir)
        for req, ast, _ in plans
    ]
    wanted = [sid_set for _, _, sid_set in plans]
    sids = list(all_sids)
    terms_sorted = sorted(all_terms)
    need_pos = _contains_phrase([ast for _, ast, _ in plans])

    def run(it):
        _limit_arrow_threads()
        for sid, u_lo, u_hi in it:
            try:
                ff_pdf = _cached_fastfields(index_dir, sid)
                if ff_pdf is None:  # GC raced us — root re-plans (SplitVanishedError)
                    yield {"split_id": sid, "__vanished__": True}
                    continue
                postings_pdf = _read_split_postings(
                    index_dir, sid, terms_sorted, buckets, need_positions=need_pos
                )
                outs = []
                for qi, scorer in enumerate(scorers):
                    if sid not in wanted[qi]:
                        continue
                    outs.append((qi, scorer((sid,), postings_pdf, ff_pdf, u_lo, u_hi)))
            except (FileNotFoundError, SplitVanishedError):
                yield {"split_id": sid, "__vanished__": True}
                continue
            for qi, out in outs:
                for rec in out.to_dict("records"):
                    rec["__qi"] = qi
                    rec["__lo"] = u_lo or 0
                    yield rec

    # per-split work here is the SUM over the batch's queries
    est = _est_split_rows([ast for _, ast, _ in plans], gstats, max(len(sids), 1))
    if not sids:
        rows = []
    elif len(sids) <= int(os.environ.get("QW_DRIVER_LEAF_MAX_SPLITS", "8")) and est * len(
        sids
    ) <= float(os.environ.get("QW_DRIVER_LEAF_MAX_ROWS", "50000")):
        rows = list(run([(s, None, None) for s in sids]))  # in-process leaf
    else:
        sc = spark.sparkContext
        bins = _leaf_bins(
            list(all_sids.values()),
            sc.defaultParallelism,
            est,
            _ranged_ok([ast for _, ast, _ in plans], [req for req, _, _ in plans]),
        )
        rows = sc.parallelize(bins, len(bins)).flatMap(run).collect()
    if any(r.get("__vanished__") for r in rows):
        # concurrent merge+GC replaced splits mid-batch: re-plan the whole
        # batch once against the fresh catalog (retry/search.rs analog)
        gone = sorted({r["split_id"] for r in rows if r.get("__vanished__")})
        if _retry:
            raise SplitVanishedError(f"splits vanished during query: {gone}")
        return multi_search(spark, index_dir, requests, _retry=True)

    # page + count per query first, then ONE grouped stored-field fetch
    # for the whole batch: queries share splits (and under load, hot
    # docs), so a per-query fetch re-decompresses the same row groups Q
    # times — the measured dominant serial driver cost of a batch
    pages: list[tuple[list[dict], int]] = []
    for qi, (req, _, _) in enumerate(plans):
        hit_rows = [r for r in rows if r["__qi"] == qi]
        per_unit_hits = {
            (r["split_id"], r.get("__lo", 0)): int(r["split_num_hits"]) for r in hit_rows
        }
        num_hits = sum(per_unit_hits.values())
        # drop count-only sentinels (doc_id=-1): under a search_after
        # cursor a split can contribute its count but no page rows
        hit_rows = [r for r in hit_rows if r["doc_id"] >= 0]
        hit_rows.sort(key=_sort_key(req))
        pages.append(
            (hit_rows[req.start_offset : req.start_offset + req.max_hits], num_hits)
        )
    by_fields: dict[tuple | None, list[dict]] = {}
    for (req, _, _), (page, _n) in zip(plans, pages):
        if page and "conv_id" not in page[0]:
            by_fields.setdefault(req.stored_fields, []).extend(page)
    for only, union_page in by_fields.items():
        _fetch_page_fields(index_dir, union_page, only)
    responses = []
    for (req, _, _), (page, num_hits) in zip(plans, pages):
        hits = [_hit_dict(config, r, req.stored_fields) for r in page]
        if req.sort_by_field in config.extra_fast_float_fields:
            for h in hits:  # int64 sort keys → doubles for display
                h["sort_value"] = sort_key_to_f64(h["sort_value"])
        _maybe_add_source(index_dir, hits, page)
        responses.append(
            SearchResponse(num_hits, hits, int((time.monotonic() - t0) * 1e6))
        )
    return responses


def _make_leaf_runner(
    scorer,
    index_dir: str,
    terms: list[tuple[str, str]],
    buckets: list[int],
    need_positions: bool = True,
):
    """mapInPandas wrapper: split-id batches → per-split scorer invocations
    with in-task fastfield + postings reads (hot splits stay in the OS page
    cache — the storage-cache analog, quickwit-storage/src/cache)."""

    def run(batches):
        _limit_arrow_threads()
        for pdf in batches:
            for sid in pdf["split_id"]:
                ff_pdf = _cached_fastfields(index_dir, sid)
                if ff_pdf is None:
                    # no silent data loss on a GC race: fail the export job
                    # (the reference fails queries on failed splits,
                    # root.rs:179-188); the caller can rerun it
                    raise SplitVanishedError(f"split vanished during export: {sid}")
                postings_pdf = _read_split_postings(
                    index_dir, sid, terms, buckets, need_positions=need_positions
                )
                out = scorer((sid,), postings_pdf, ff_pdf)
                if len(out):
                    yield out

    return run


def _df_cols_and_schema(config: IndexConfig) -> tuple[list[str], str]:
    """search_df's output columns: the fetched stored fields + hit identity
    and score, config-derived so generic schemas flow through."""
    cols = [c for c in fetch_cols(config) if c != "doc_id"]
    ddl = _fetch_ddl(config, include_doc_id=False)
    cols += ["split_id", "doc_id", "score"]
    ddl += ", split_id string, doc_id long, score double"
    return cols, ddl


def _json_safe(v):
    """JSON-representable value for hit dicts / _source: bytes → base64,
    timestamps → RFC-3339, numpy scalars/arrays → python."""
    import base64

    from ..functions.typed_terms import canonical_date

    if v is None:
        return None
    if isinstance(v, (bytes, bytearray)):
        return base64.b64encode(bytes(v)).decode("ascii")
    if isinstance(v, np.ndarray):
        return [_json_safe(x) for x in v.tolist()]
    if isinstance(v, (list, tuple)):
        return [_json_safe(x) for x in v]
    if isinstance(v, pd.Timestamp):
        return canonical_date(v.to_pydatetime())
    if hasattr(v, "item"):
        v = v.item()
    from datetime import datetime

    if isinstance(v, datetime):
        return canonical_date(v)
    if isinstance(v, float) and v != v:  # fetched-missing NaN
        return None
    return v


def _hit_dict(config: IndexConfig, r: dict, only: tuple | None = None) -> dict:
    """One hit's JSON shape: identity + score + the stored fields —
    every one by default, or only the request's stored_fields subset."""
    if only is not None:
        h = {
            "split_id": r["split_id"],
            "doc_id": _json_safe(r["doc_id"]),
            "score": _json_safe(r["score"]),
            "sort_value": _json_safe(r.get("sort_value")),
        }
        for c in fetch_cols(config):
            if c != "doc_id" and c in only:
                h[c] = _json_safe(r.get(c))
        return h
    h = {
        "conv_id": r.get("conv_id"),
        "turn_idx": _json_safe(r.get("turn_idx")),
        "split_id": r["split_id"],
        "doc_id": _json_safe(r["doc_id"]),
        "score": _json_safe(r["score"]),
        "sort_value": _json_safe(r.get("sort_value")),
    }
    for c in fetch_cols(config):
        if c not in ("doc_id", "conv_id", "turn_idx"):
            h[c] = _json_safe(r.get(c))
    return h


def _validate_stored_fields(config: IndexConfig, request: SearchRequest) -> None:
    """stored_fields must name stored columns; snippet fields must ride
    along (snippets read the stored text of the final page)."""
    if request.stored_fields is None:
        return
    cols = set(fetch_cols(config)) - {"doc_id"}
    unknown = sorted(set(request.stored_fields) - cols)
    if unknown:
        raise ValueError(
            f"storedFields not in the doc store: {', '.join(unknown)} "
            f"(stored columns: {', '.join(sorted(cols))})"
        )
    if request.snippet_fields:
        missing = sorted(set(request.snippet_fields) - set(request.stored_fields))
        if missing:
            raise ValueError(
                "snippetFields must be included in storedFields: "
                + ", ".join(missing)
            )


def _maybe_add_source(index_dir: str, hits: list[dict], page: list[dict]) -> None:
    """store_source (reference lib.rs:43-44, default_mapper.rs:428-435):
    attach the reserved `_source` field to every hit — the canonical JSON of
    the doc's stored fields with the timestamp back in RFC-3339 form (the
    NDJSON input shape).  Reconstructed at fetch time from the doc store, so
    it needs no extra storage; unlike the reference's verbatim copy it holds
    only schema-mapped fields (unknown input keys were dropped at projection
    either way, default_mapper.rs:582-595)."""
    import json
    from datetime import datetime, timezone

    try:
        _, config = open_index(None, index_dir)
    except FileNotFoundError:
        return
    if not config.store_source:
        return
    stored = [m.name for m in config.stored_extra_fields]
    for h, r in zip(hits, page):
        ts_epoch = r.get("ts_epoch")
        ts = (
            datetime.fromtimestamp(int(ts_epoch), tz=timezone.utc)
            .isoformat()
            .replace("+00:00", "Z")
            if ts_epoch is not None
            else None
        )
        src = {
            "conv_id": r.get("conv_id"),
            "turn_idx": int(r["turn_idx"]) if r.get("turn_idx") is not None else None,
            "ts": ts,
        }
        for c in stored:
            src[c] = _json_safe(r.get(c))
        h["_source"] = json.dumps(src, sort_keys=True)


def _sort_key(request: SearchRequest):
    """Python-side merge order over fetched rows — merge_fruits analog
    (reference order (Reverse(sort_value), split_id, doc_id), lib.rs:93-98)."""
    if request.sort_by_field is not None:
        sgn = 1 if request.sort_asc else -1
        return lambda r: (sgn * r["sort_value"], r["split_id"], r["doc_id"])
    if request.tiebreak == "global_key":
        return lambda r: (-r["score"], r["conv_id"], r["turn_idx"])
    return lambda r: (-r["score"], r["split_id"], r["doc_id"])


def _search_rows(
    spark: SparkSession, index_dir: str, request: SearchRequest
) -> tuple[list[dict], int]:
    """Shared root-search core: leaf top-k (one job, tiny result), driver
    merge (sort of <= splits*(offset+k) rows), pruned doc fetch (one job).

    The leaf task fetches its winners' stored fields itself (one Spark job
    per query total); the driver merge (merge_fruits analog, root.rs:170-232)
    then just sorts <= splits*(offset+k) fully-materialized rows and pages."""
    if request.search_after is not None:
        if len(request.search_after) == 4:
            raise ValueError(
                "index-qualified search_after cursors (value, index_id, "
                "split_id, doc_id) are for multi-index addressing — use "
                "multi_index_search, or drop the index coordinate"
            )
        if request.start_offset:
            raise ValueError("search_after and start_offset are mutually exclusive")
        if request.tiebreak != "reference":
            raise ValueError(
                "search_after requires tiebreak='reference' (the cursor's "
                "tie order is (split_id, doc_id))"
            )
    for attempt in (0, 1):
        cat, config = open_index(spark, index_dir)
        req = resolve_sort(request, config)
        _validate_stored_fields(config, req)
        if (
            req.search_after is not None
            and req.search_after[1] not in (CURSOR_SPLIT_MIN, CURSOR_SPLIT_MAX)
            and req.search_after[1] not in {s.split_id for s in cat.splits()}
        ):
            # a merge/demux replaced the cursor's split: its tie key is
            # meaningless against the new split ids — comparing anyway
            # would silently duplicate the boundary doc or skip tie-group
            # rows.  Loud failure; the client restarts pagination (ES
            # solves the same problem with point-in-time contexts).
            raise ValueError(
                f"stale search_after cursor: split {req.search_after[1]!r} "
                "no longer exists (replaced by a merge) — restart pagination"
            )
        only_split_ids: set[str] | None = None
        meta_count = 0
        cat_token = None
        if req.max_hits == 0 and req.start_offset == 0 and not req.numeric_filters:
            ast = parse_query(req.query, config, req.search_fields)
            # the metadata-count shortcut must enforce the same user-input
            # contract as the leaf path (_plan_leaf validates there)
            _validate_msm(ast, req)
            if isinstance(ast, AllQuery):
                # match-all count: every doc in a split counts, so any split
                # FULLY inside the time range (or any split at all when no
                # range is given) is answered from catalog metadata — zero
                # Spark jobs, zero split reads.  Only time-range BOUNDARY
                # splits run the leaf (the root-level twin of the reference's
                # whole-segment timestamp skip, filters.rs:64-66).  At 10^4
                # splits / 100 TB a total-count request costs one catalog
                # read.  Recomputed on every retry attempt and cross-checked
                # against the catalog state token after the leaf: the leaf
                # re-reads the catalog itself, so a concurrent merge commit
                # between the two reads would otherwise count a replaced
                # boundary split in neither half.
                lo, hi = req.start_timestamp, req.end_timestamp

                def fully_inside(s) -> bool:
                    if lo is None and hi is None:
                        return True
                    if s.ts_min is None or s.ts_max is None:
                        return False
                    return (lo is None or s.ts_min >= lo) and (
                        hi is None or s.ts_max < hi
                    )

                cat_token = Catalog.state_token(index_dir)
                splits = prune_splits(cat, config, ast, req)
                meta_count = sum(s.num_docs for s in splits if fully_inside(s))
                only_split_ids = {s.split_id for s in splits if not fully_inside(s)}
                if not only_split_ids:
                    # pure-metadata answer from ONE atomic catalog read
                    return [], meta_count
        try:
            hit_rows = _leaf_hit_rows(spark, index_dir, req, only_split_ids)
            if cat_token is not None and Catalog.state_token(index_dir) != cat_token:
                # catalog changed between the metadata count and the leaf
                if attempt:
                    raise SplitVanishedError(
                        "catalog changed twice during a metadata-count query"
                    )
                continue
            # keyed per (split, range): sub-split units report disjoint
            # counts that SUM to the split's exact total
            per_unit_hits: dict[tuple[str, int], int] = {}
            for r in hit_rows:
                per_unit_hits[(r["split_id"], r.get("__lo", 0))] = int(r["split_num_hits"])
            num_hits = meta_count + sum(per_unit_hits.values())
            # count-only sentinel rows (doc_id=-1) carry split_num_hits for
            # splits that contributed no page candidates (max_hits=0, or a
            # search_after cursor past every row of the split) — they are
            # counts, never hits
            hit_rows = [r for r in hit_rows if r["doc_id"] >= 0]
            hit_rows.sort(key=_sort_key(req))
            page = hit_rows[req.start_offset : req.start_offset + req.max_hits]
            if page and "conv_id" not in page[0]:
                _fetch_page_fields(index_dir, page, req.stored_fields)
            return page, num_hits
        except SplitVanishedError:
            # concurrent merge+GC replaced splits mid-query (possibly
            # between the leaf pass and the page fetch): re-plan once
            # against the fresh catalog (retry/search.rs analog)
            if attempt:
                raise
    raise AssertionError("unreachable")


# Driver-side stored-doc row cache (the reference's fetch-docs/doc-store
# cache, quickwit-storage/src/cache + fetch_docs.rs): under load the same
# hot page docs are re-fetched query after query, and each point fetch
# decompresses whole 8k-row groups to extract a handful of rows — the
# dominant serial driver cost of a batch (measured ~50% of a warm
# multi_search batch).  Keyed on a TTL'd split epoch so a delete-and-
# rebuild at the same path (the only way a published split's bytes can
# change) invalidates within the TTL, like the worker-side caches.
_DOC_ROW_CACHE: dict = {}
_DOC_ROW_CACHE_BYTES = [0]
_DOC_EPOCH_MEMO: dict = {}


def _doc_cache_cap() -> int:
    return int(os.environ.get("QW_DOC_CACHE_MB", "64")) << 20


def _doc_epoch(index_dir: str, split_id: str):
    """Change-detection token for the doc-row cache: the hotcache token
    when one exists (object stores), else the docs dir mtime — memoized
    for the same 2 s the hotcache probe uses."""
    import time as _time

    key = (index_dir, split_id)
    memo = _DOC_EPOCH_MEMO.get(key)
    now = _time.monotonic()
    if memo is not None and now < memo[0]:
        return memo[1]
    hc = _cached_hotcache(index_dir, split_id)
    epoch = hc.token if hc is not None else _split_epoch(index_dir, "docs", split_id)
    _lru_put(_DOC_EPOCH_MEMO, key, (now + _HOTCACHE_PROBE_TTL, epoch), 4096)
    return epoch


def _fetch_page_fields(
    index_dir: str, page: list[dict], only: tuple | None = None
) -> None:
    """Driver-side fetch_docs (fetch_docs.rs:97-164 analog): read the
    stored fields of ONLY the final page's rows — at most (offset+k) docs
    across at most that many splits, a few row-group-pruned pyarrow reads
    of metadata-scale size.  Mutates the page rows in place.

    ``only`` (request.stored_fields) prunes the fetched COLUMNS too — for
    wide documents the page fetch reads just the asked-for columns.  A
    store_source index keeps the full fetch (the reserved _source field
    reconstructs from every stored column).

    Hot rows come from the driver doc-row cache; misses are grouped per
    split and fetched CONCURRENTLY (pyarrow releases the GIL, so under
    concurrent clients one query's page fetch overlaps another's driver
    work instead of serializing behind it)."""
    from concurrent.futures import ThreadPoolExecutor

    _, config = open_index(None, index_dir)
    cols = fetch_cols(config)
    if only is not None and not config.store_source:
        cols = ["doc_id"] + [c for c in cols if c != "doc_id" and c in only]
    colkey = tuple(cols)
    cap = _doc_cache_cap()
    fills: dict[tuple[str, int], tuple] = {}
    by_split: dict[str, set[int]] = {}
    epochs: dict[str, object] = {}
    for r in page:
        sid, did = r["split_id"], int(r["doc_id"])
        if (sid, did) in fills:
            continue
        if cap:
            if sid not in epochs:
                epochs[sid] = _doc_epoch(index_dir, sid)
            hit = _DOC_ROW_CACHE.get((index_dir, sid, epochs[sid], did, colkey))
            if hit is not None:
                fills[(sid, did)] = hit
                continue
        by_split.setdefault(sid, set()).add(did)

    def fetch_one(item):
        sid, ids = item
        # hotcache presence doubles as the GC-race liveness probe (its own
        # reads raise SplitVanishedError); only the listing path needs the
        # explicit dataset check
        if _cached_hotcache(index_dir, sid) is None and (
            _cached_docs_dataset(index_dir, sid) is None
        ):  # GC raced us
            raise SplitVanishedError(f"split vanished during fetch: {sid}")
        return sid, _fetch_doc_fields(index_dir, sid, sorted(ids), cols)

    items = list(by_split.items())
    if len(items) > 1:
        with ThreadPoolExecutor(max_workers=min(8, len(items))) as pool:
            fetched = list(pool.map(fetch_one, items))
    else:
        fetched = [fetch_one(i) for i in items]
    did_i = cols.index("doc_id")
    for sid, pdf in fetched:
        for row in pdf.itertuples(index=False, name=None):
            did = int(row[did_i])
            fills[(sid, did)] = row
            if cap:
                nb = 128 + sum(
                    len(v) if isinstance(v, (str, bytes)) else 16 for v in row
                )
                _DOC_ROW_CACHE[(index_dir, sid, epochs.get(sid), did, colkey)] = row
                _DOC_ROW_CACHE_BYTES[0] += nb
        while _DOC_ROW_CACHE_BYTES[0] > cap and _DOC_ROW_CACHE:
            try:  # concurrent clients share this cache; a racing pop is fine
                gone = _DOC_ROW_CACHE.pop(next(iter(_DOC_ROW_CACHE)))
            except (KeyError, StopIteration, RuntimeError):
                continue
            _DOC_ROW_CACHE_BYTES[0] -= 128 + sum(
                len(v) if isinstance(v, (str, bytes)) else 16 for v in gone
            )
    for r in page:
        row = fills.get((r["split_id"], int(r["doc_id"])))
        for i, c in enumerate(cols):
            if c != "doc_id":
                r[c] = row[i] if row is not None else None


def fetch_doc(
    spark: SparkSession | None, index_dir: str, split_id: str, doc_id: int
) -> dict | None:
    """Single-document GET by address (the ES ``GET /index/_doc/{id}``
    analog over our (split_id, doc_id) address space — every hit carries
    both, so clients can re-fetch any result later).  ONE row-group-pruned
    pyarrow read of that split's doc store, no Spark job; returns the
    stored fields (+ reconstructed ``_source`` on store_source indexes) or
    None when the split is not live (merged away / GC'd — addresses are
    valid for a split's lifetime, like ES point-in-time hits) or the
    doc_id is absent."""
    cat, config = open_index(spark, index_dir)
    if split_id not in {s.split_id for s in cat.splits()}:
        return None
    cols = fetch_cols(config)
    try:
        pdf = _fetch_doc_fields(index_dir, split_id, [int(doc_id)], cols)
    except (FileNotFoundError, SplitVanishedError):
        return None
    if not len(pdf):
        return None
    row = dict(zip(cols, next(pdf.itertuples(index=False, name=None))))
    out: dict = {"split_id": split_id, "doc_id": int(doc_id)}
    for c in cols:
        if c != "doc_id":
            out[c] = _json_safe(row[c])
    _maybe_add_source(index_dir, [out], [dict(out)])
    return out


def search_df(spark: SparkSession, index_dir: str, request: SearchRequest) -> DataFrame:
    """Full search as a DataFrame of hits joined back to the doc store:
    the config's stored columns plus (split_id, doc_id, score), globally
    ordered and offset/limited."""
    if request.stored_fields is not None:
        raise ValueError(
            "stored_fields is not supported on search_df (its DataFrame "
            "schema is the full stored-column set) — use search()"
        )
    _, config = open_index(spark, index_dir)
    if resolve_sort(request, config).sort_by_field in config.extra_fast_float_fields:
        raise ValueError(
            "f64 sort fields are not supported on search_df (its sort_value "
            "column is int64) — use search()"
        )
    cols, schema = _df_cols_and_schema(config)
    page, _ = _search_rows(spark, index_dir, request)

    def py(v):
        if isinstance(v, np.ndarray):
            return v.tolist()
        if isinstance(v, pd.Timestamp):
            return v.to_pydatetime()
        return v.item() if hasattr(v, "item") else v

    data = [tuple(py(r[c]) for c in cols) for r in page]
    return spark.createDataFrame(data, schema)


def _attach_score_explain(
    spark: SparkSession, index_dir: str, request: SearchRequest, hits: list[dict]
) -> None:
    """Per-hit BM25 breakdown (the ES per-hit ``explain`` analog, beyond-
    reference): for each page hit, list every matching positive term's
    (tf, doc_freq, idf, doc_len, avg_len, weight, contribution) and the
    reconstructed total.

    Driver-side and page-only — O(k·query_terms) postings probes against
    the worker-style caches, never a Spark job.  The reconstruction sums
    contributions in the SAME sorted-term order and with the SAME float
    association ((idf·tf_norm)·w) as the leaf's full evaluation — which
    WAND (post-scale) and MaxScore (sorted-term summation) also match — so
    ``score_detail["score"]`` equals the hit's reported BM25 score
    BIT-exactly regardless of which strategy produced it (the same
    invariant exact-score search_after cursors rely on).

    NOTE this deliberately mirrors score_split's field_lens decode and
    per-term scoring body (make_split_scorer): any change to the leaf's
    scoring math MUST be replicated here in the same float-op order —
    test_score_explain_bit_exact pins the equality across strategies and
    fails on drift."""
    cat, config = open_index(spark, index_dir)
    ast = parse_query(request.query, config, request.search_fields)
    ast = expand_prefixes(spark, index_dir, cat, ast)
    if isinstance(ast, AllQuery):
        for h in hits:
            h["score_detail"] = {"score": 1.0, "constant": True, "terms": []}
        return
    weights = positive_term_weights(ast)
    exists_w = positive_exists_weights(ast)
    terms_sorted = sorted(positive_terms(ast))
    terms = collect_terms(ast)
    buckets = term_buckets(spark, terms, config.term_merge_buckets)
    gstats = global_term_stats(spark, index_dir, cat, terms, buckets)
    by_split: dict[str, list[dict]] = {}
    for h in hits:
        by_split.setdefault(h["split_id"], []).append(h)
    for sid, split_hits in by_split.items():
        ff_pdf = _cached_fastfields(index_dir, sid)
        if ff_pdf is None:
            raise SplitVanishedError(f"split vanished during explain: {sid}")
        ff_pdf = ff_pdf.sort_values("seg_id")
        # tf/df probes only — score_explain never verifies positions
        postings_pdf = _read_split_postings(
            index_dir, sid, sorted(terms), buckets, need_positions=False
        )
        postings = _SplitPostings(postings_pdf, None, None, source=(index_dir, sid))
        lens_cache: dict[str, np.ndarray | None] = {}

        def field_lens(field: str, _ff=ff_pdf, _c=lens_cache) -> np.ndarray | None:
            if field not in _c:
                col = "doc_lens" if field == "text" else f"doc_lens_{field}"
                _c[field] = (
                    np.concatenate(
                        [decode_u32_column(b) for b in _ff[col]]
                    ).astype(np.int64)
                    if col in _ff.columns
                    else None
                )
            return _c[field]

        docs = np.array(sorted({h["doc_id"] for h in split_hits}), np.int64)
        # per (field, term): tf of each page doc (0 = term absent)
        contribs: dict[int, list] = {int(d): [] for d in docs}
        totals: dict[int, float] = {int(d): 0.0 for d in docs}
        for field, term in terms_sorted:
            d, t = postings.candidates_only((field, term), docs)
            if len(d) == 0:
                continue
            d = d.astype(np.int64)
            # candidates_only returns whole overlapping blocks — restrict
            # to the page docs exactly like the leaf's scoring loop
            pos = np.searchsorted(docs, d)
            valid = docs[np.minimum(pos, len(docs) - 1)] == d
            d, t = d[valid], t[valid]
            if len(d) == 0:
                continue
            fl = field_lens(field)
            dl = fl[d] if fl is not None else np.ones(len(d), np.int64)
            avg = gstats["avg_len"].get(field, 1.0) or 1.0
            df = gstats["df"].get((field, term), 0)
            term_idf = bm25_idf(df, gstats["num_docs"])
            w = weights.get((field, term), 1.0)
            base = term_idf * tf_norm(t.astype(np.float64), dl, avg)
            contrib = base * w if w != 1.0 else base
            for j, doc in enumerate(d):
                doc = int(doc)
                totals[doc] += float(contrib[j])
                contribs[doc].append(
                    {
                        "field": field,
                        "term": term,
                        "tf": int(t[j]),
                        "doc_freq": int(df),
                        "idf": float(term_idf),
                        "doc_len": int(dl[j]),
                        "avg_len": float(avg),
                        "weight": float(w),
                        "contribution": float(contrib[j]),
                    }
                )
        for fname in sorted(exists_w):
            flx = field_lens(fname)
            if flx is None:
                continue
            for doc in (int(d) for d in docs):
                if flx[doc] > 0:
                    totals[doc] += exists_w[fname]
                    contribs[doc].append(
                        {
                            "field": fname,
                            "exists": True,
                            "weight": float(exists_w[fname]),
                            "contribution": float(exists_w[fname]),
                        }
                    )
        for h in split_hits:
            h["score_detail"] = {
                "score": totals[int(h["doc_id"])],
                "terms": contribs[int(h["doc_id"])],
            }


def search(
    spark: SparkSession, index_dir: str, request: SearchRequest, _retry: bool = False
) -> SearchResponse:
    """single_node_search analog (lib.rs:153-198): returns collected hits +
    the total hit count (collector.rs:180-187)."""
    t0 = time.monotonic()
    page, num_hits = _search_rows(spark, index_dir, request)
    cat, config = open_index(spark, index_dir)
    out = [_hit_dict(config, r, request.stored_fields) for r in page]
    if resolve_sort(request, config).sort_by_field in config.extra_fast_float_fields:
        for h in out:  # wire carries monotonic int64 keys; hits show doubles
            h["sort_value"] = sort_key_to_f64(h["sort_value"])
    _maybe_add_source(index_dir, out, page)
    if request.snippet_fields:
        from .snippet import attach_snippets

        ast = parse_query(request.query, config, request.search_fields)
        # expanded terms highlight like typed ones ("depl*" → <b>deploy</b>)
        ast = expand_prefixes(spark, index_dir, cat, ast)
        attach_snippets(
            config,
            ast,
            out,
            tuple(request.snippet_fields),
            max_chars=request.snippet_max_chars,
        )
    if request.score_explain and out:
        try:
            _attach_score_explain(spark, index_dir, request, out)
        except SplitVanishedError:
            # a merge+GC landed between the page read and the explain
            # attach: the page's split addresses are stale, so re-run the
            # WHOLE search once against the fresh catalog (the same
            # retry/search.rs protocol _search_rows applies internally)
            if _retry:
                raise
            return search(spark, index_dir, request, _retry=True)
    return SearchResponse(num_hits, out, int((time.monotonic() - t0) * 1e6))


# Synthetic split-id cursor bounds: "" sorts before every real split id and
# "￿" after every real one (split ids are ASCII hex/uuid strings), so a
# cursor carrying one expresses "all ties of this sort value" / "no tie of
# this sort value" without naming a live split.  multi_index_search mints
# them to project an index-qualified 4-tuple cursor onto the per-index
# 3-tuple leaf comparison; _search_rows skips the cursor-split liveness
# check for them (they never address a real split).
CURSOR_SPLIT_MIN = ""
CURSOR_SPLIT_MAX = "￿"


def multi_index_search(
    spark: SparkSession, index_dirs: list[str], request: SearchRequest
) -> SearchResponse:
    """One request over SEVERAL indexes (the ES ``/a,b/_search`` multi-index
    addressing shape; beyond-reference — quickwit 0.2 is one index per
    request): each index runs its normal root search for the page's top
    offset+k, the driver merges the per-index pages in result order with
    the index id as the outermost tie key (split ids are only unique
    within one index), and num_hits sums the per-index exact counts.

    BM25 scores use each index's OWN collection stats (the ES
    query_then_fetch behavior — cross-index scores are comparable only to
    the extent the collections are); sort-by-fast-field merges on the raw
    values and is exact.  score_explain flows through per index (each
    hit's explanation uses its own index's collection stats — ES parity).

    search_after takes an INDEX-QUALIFIED 4-tuple cursor
    ``(value, index_id, split_id, doc_id)`` — the previous page's last
    hit's sort value (or score) plus its (index, split, doc) identity.
    The merge order is (value, index_id, split_id, doc_id), so the cursor
    projects onto each index as a plain 3-tuple leaf cursor: the cursor's
    own index resumes at (value, split, doc); an index ordered BEFORE the
    cursor's needs strictly-after-value rows only; one ordered AFTER
    needs at-or-after-value rows including every tie.  The two synthetic
    split bounds express those without a per-index re-sort."""
    t0 = time.monotonic()
    if len(set(index_dirs)) != len(index_dirs) or not index_dirs:
        raise ValueError("index_dirs must be a non-empty list of distinct indexes")
    cursor = request.search_after
    if cursor is not None:
        if len(cursor) == 3 and len(index_dirs) > 1:
            raise ValueError(
                "multi-index search_after needs an index-qualified cursor "
                "[value, index_id, split_id, doc_id] — the 3-tuple form has "
                "no index coordinate"
            )
        if request.start_offset:
            raise ValueError("search_after and start_offset are mutually exclusive")
    if len(index_dirs) == 1:
        if cursor is not None and len(cursor) == 4:
            # tolerate the qualified form on a 1-index list (ES does)
            c_v, c_idx, c_split, c_doc = cursor
            if c_idx != os.path.basename(index_dirs[0].rstrip("/")):
                raise ValueError(
                    f"search_after cursor index {c_idx!r} is not in the "
                    "addressed index list"
                )
            request = _dc_replace(request, search_after=(c_v, c_split, int(c_doc)))
        return search(spark, index_dirs[0], request)
    ids = [os.path.basename(d.rstrip("/")) for d in index_dirs]
    if cursor is not None and cursor[1] not in ids:
        raise ValueError(
            f"search_after cursor index {cursor[1]!r} is not in the "
            "addressed index list"
        )
    # offset rewrite (root.rs:286-301 across indexes): every index returns
    # its top offset+k, the GLOBAL offset applies after the merge
    inner = _dc_replace(
        request, start_offset=0, max_hits=request.start_offset + request.max_hits
    )
    total = 0
    merged: list[dict] = []
    float_sort = False
    for d, iid in zip(index_dirs, ids):
        req_d = inner
        if cursor is not None:
            c_v, c_idx, c_split, c_doc = cursor
            if iid == c_idx:
                after = (c_v, c_split, int(c_doc))
            elif iid < c_idx:
                # merge-ordered before the cursor's index: only rows whose
                # value is STRICTLY after the cursor value qualify
                after = (c_v, CURSOR_SPLIT_MAX, 0)
            else:
                # ordered after: rows at the cursor value still qualify
                after = (c_v, CURSOR_SPLIT_MIN, -1)
            req_d = _dc_replace(inner, search_after=after)
        resp = search(spark, d, req_d)
        total += resp.num_hits
        _, cfg = open_index(spark, d)
        float_sort |= (
            resolve_sort(request, cfg).sort_by_field in cfg.extra_fast_float_fields
        )
        for h in resp.hits:
            h["index_id"] = iid
            merged.append(h)
    if request.sort_by_field is not None:
        sgn = 1 if request.sort_asc else -1
        key = lambda h: (sgn * h["sort_value"], h["index_id"], h["split_id"], h["doc_id"])  # noqa: E731
        if float_sort:
            # every index resolved the same field; mixed int/float schemas
            # for one name across indexes would make sort_value types
            # incomparable — fail loudly rather than sort garbage
            if not all(isinstance(h["sort_value"], float) for h in merged):
                raise ValueError(
                    f"sort field {request.sort_by_field!r} is f64 in some "
                    "indexes and integer in others — cannot merge"
                )
    else:
        key = lambda h: (-h["score"], h["index_id"], h["split_id"], h["doc_id"])  # noqa: E731
    merged.sort(key=key)
    page = merged[request.start_offset : request.start_offset + request.max_hits]
    return SearchResponse(total, page, int((time.monotonic() - t0) * 1e6))


def _term_bucket_of(field: str, term: str, n_buckets: int) -> int:
    from ..functions.codec import term_bucket

    return term_bucket(field, term, n_buckets)


def explain(spark: SparkSession, index_dir: str, request: SearchRequest) -> dict:
    """Driver-side query-plan introspection — runs the SAME planning as a
    real search (parse → prune → stats) but never launches the leaf.
    Strategy comes from select_strategy, the same function the scorer
    executes, so the report cannot drift from the actual plan.

    Returns which splits survive time/tag pruning, the scoring strategy
    the leaf would run (metadata-only count / block-max WAND / MaxScore /
    match-all scan / full boolean eval), per-term global doc_freq, the
    leaf cost estimate, and whether the leaf runs in-process or as a
    Spark job — the observability half of the reference's leaf cost model
    (root.rs:280-301) surfaced to users."""
    cat, config = open_index(spark, index_dir)
    request = resolve_sort(request, config)
    ast = parse_query(request.query, config, request.search_fields)
    _validate_msm(ast, request)
    ast = expand_prefixes(spark, index_dir, cat, ast)
    all_splits = cat.splits()
    splits = prune_splits(cat, config, ast, request)
    terms = sorted(collect_terms(ast))
    buckets = term_buckets(spark, set(terms), config.term_merge_buckets)
    gstats = global_term_stats(spark, index_dir, cat, set(terms), buckets)
    n_meta_pruned = len(all_splits) - len(splits)
    splits, n_term_pruned = prune_splits_by_terms(index_dir, splits, ast, gstats)
    count_only = request.max_hits == 0 and request.start_offset == 0
    no_range = request.start_timestamp is None and request.end_timestamp is None
    strategy = select_strategy(ast, request)
    if strategy == "match_all_scan" and count_only and no_range:
        # the root answers this from catalog metadata before any leaf runs
        strategy = "match_all_metadata_count"
    # per-split time-filter elision: splits wholly inside the requested
    # range run the pruned strategy instead of full evaluation
    elide = ts_elidable_strategy(ast, request)
    lo_e, hi_e = request.start_timestamp, request.end_timestamp
    splits_elided = (
        sum(
            1
            for s in splits
            if s.ts_min is not None
            and s.ts_max is not None
            and (lo_e is None or s.ts_min >= lo_e)
            and (hi_e is None or s.ts_max < hi_e)
        )
        if elide is not None
        else 0
    )
    est = _est_split_rows(ast, gstats, len(splits))
    in_process = strategy == "match_all_metadata_count" or (
        len(splits) <= int(os.environ.get("QW_DRIVER_LEAF_MAX_SPLITS", "8"))
        and est * len(splits)
        <= float(os.environ.get("QW_DRIVER_LEAF_MAX_ROWS", "50000"))
    )
    # Phrase observability: probe the FIRST surviving split's posting rows
    # and report which verification path each phrase term would take there
    # (index-time bitmap — inline cell or chunk rows — vs position
    # decode).  One driver-side point read; makes 'hot-term phrases hit
    # the bitmap path' checkable from explain() instead of inferred from
    # latency.  Run-time counts come from take_phrase_counters().
    phrase_storage = []
    pterms: set = set()

    def _collect_phrases(node):
        if isinstance(node, PhraseQuery):
            pterms.update((node.field, t) for t in node.terms)
        elif isinstance(node, BoolQuery):
            for c in (*node.must, *node.should, *node.must_not):
                _collect_phrases(c)

    _collect_phrases(ast)
    if pterms and splits:
        sid = splits[0].split_id
        ppdf = _read_split_postings(
            index_dir, sid, sorted(pterms), buckets, need_positions=True
        )
        for f_, t_ in sorted(pterms):
            sub = ppdf[(ppdf["field"] == f_) & (ppdf["term"] == t_)] if len(ppdf) else ppdf
            if not len(sub):
                path, n_chunks = "absent", 0
            else:
                r = sub.iloc[0]
                span = r.get("bm_chunk_span")
                bm = r.get("pos_bm")
                if span is not None and not (isinstance(span, float) and np.isnan(span)):
                    nblocks = -(-int(r["doc_freq"]) // BLOCK)
                    n_chunks = -(-nblocks // int(span))
                    path = "bitmap_chunked"
                elif bm is not None and not isinstance(bm, float):
                    path, n_chunks = "bitmap_inline", 0
                else:
                    path, n_chunks = "decode", 0
            phrase_storage.append(
                {"field": f_, "term": t_, "path": path,
                 "bm_chunks": n_chunks, "probe_split": sid}
            )
    return {
        "query": request.query,
        "ast": repr(ast),
        "strategy": strategy,
        "ts_elided_strategy": elide,
        "splits_ts_elided": splits_elided,
        "splits_total": len(all_splits),
        "splits_after_pruning": len(splits),
        "splits_pruned": len(all_splits) - len(splits),
        # metadata pruning (time/tags/numeric) vs term-presence pruning
        # (per-split Bloom probes) broken out — the observability hook for
        # 'a rare-term query schedules O(matching splits) tasks'
        "splits_pruned_meta": n_meta_pruned,
        "splits_pruned_terms": n_term_pruned,
        "phrase_term_storage": phrase_storage,
        "terms": [
            {
                "field": f,
                "term": t,
                "doc_freq": int(gstats["df"].get((f, t), 0)),
                "bucket": _term_bucket_of(f, t, config.term_merge_buckets),
            }
            for f, t in terms
        ],
        "num_docs_total": int(gstats["num_docs"]),
        "est_rows_per_split": round(est, 1),
        "leaf": "in_process" if in_process else "spark_job",
        "sort_by_field": request.sort_by_field,
    }


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


_CALENDAR_UNITS = ("minute", "hour", "day", "week", "month", "quarter", "year")


def _calendar_bucket_expr(spark: SparkSession, field: str, calendar: str):
    """Bucket-start epoch seconds for an ES ``calendar_interval``: the
    fast-field epoch is lifted to a timestamp and ``date_trunc``'d — a
    month/quarter/year has no fixed second width, so fixed-interval floor
    division cannot express it.  Truncation happens in the SESSION
    timezone, which must be UTC (the ES date_histogram default; same
    validation discipline as streaming/sessionize.py)."""
    if calendar not in _CALENDAR_UNITS:
        raise ValueError(
            f"calendar must be one of {_CALENDAR_UNITS}, got {calendar!r}"
        )
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz not in ("UTC", "Etc/UTC", "GMT", "Z", "+00:00"):
        raise ValueError(
            "calendar-interval buckets truncate in the session timezone and "
            f"require UTC (spark.sql.session.timeZone={tz!r}) — the ES "
            "date_histogram default"
        )
    return F.unix_timestamp(
        F.date_trunc(calendar, F.timestamp_seconds(F.col(f"`{field}`")))
    ).cast("long")


def search_agg_date_histogram(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    interval_s: int | None = None,
    ts_field: str | None = None,
    calendar: str | None = None,
) -> DataFrame:
    """ES-style date-histogram over EVERY matching doc: bucket = epoch
    floored to ``interval_s`` (fixed_interval), or — with ``calendar`` —
    the bucket-START epoch of the enclosing minute/hour/day/week/month/
    quarter/year (calendar_interval; months have no fixed width, so this
    is date_trunc, not floor division).  The timestamp comes off the
    fast-field store in the stream leaf — the doc store is never
    touched."""
    _, config = open_index(spark, index_dir)
    field = ts_field or config.timestamp_field
    if field is None:
        raise ValueError("index has no timestamp field; pass ts_field")
    if calendar is not None:
        if interval_s is not None:
            raise ValueError("pass either interval_s or calendar, not both")
        bucket = _calendar_bucket_expr(spark, field, calendar)
        hits = search_stream(spark, index_dir, request, field)
        return (
            hits.groupBy(bucket.alias("bucket"))
            .agg(F.count("*").cast("long").alias("doc_count"))
            .orderBy("bucket")
        )
    if interval_s is None or interval_s <= 0:
        raise ValueError(f"interval_s must be positive, got {interval_s}")
    return search_agg_histogram(spark, index_dir, request, field, interval_s)


def search_agg_terms(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    field: str,
    size: int | None = None,
) -> DataFrame:
    """ES-style terms aggregation over every matching doc's ``field``:
    (value, doc_count), ordered by count desc then value.  Fast i64 fields
    aggregate straight off the stream leaf; stored columns join matches to
    the doc store first — split-pruned (Catalyst PartitionFilters on
    split_id) and column-pruned to (split_id, doc_id, field), the same
    fetch_docs shape as export_stream's partition-by join."""
    vals = _agg_values_df(spark, index_dir, request, field)
    out = vals.groupBy(F.col(f"`{field}`").alias("value")).agg(
        F.count("*").cast("long").alias("doc_count")
    )
    out = out.orderBy(F.col("doc_count").desc(), F.col("value").asc())
    return out.limit(int(size)) if size is not None else out


def _agg_values_df(
    spark: SparkSession, index_dir: str, request: SearchRequest, field: str
) -> DataFrame:
    """Per-match values of ``field`` for aggregation: fast i64 fields come
    straight off the stream leaf; stored columns join matches to the doc
    store — split-pruned (Catalyst PartitionFilters on split_id) and
    column-pruned to (split_id, doc_id, field), the same fetch_docs shape
    as export_stream's partition-by join."""
    _, config = open_index(spark, index_dir)
    fast = field == config.timestamp_field or field in config.extra_fast_fields
    if fast:
        return search_stream(spark, index_dir, request, field)
    if field not in config.doc_cols():
        raise ValueError(f"field {field!r} is neither fast nor stored")
    vehicle = _resolve_fast_field(spark, index_dir, config.timestamp_field or "ts")
    req = _dc_replace(request, start_offset=0, sort_by_field=vehicle)
    hits, splits, _ast, _config = _leaf_hits_df(spark, index_dir, req)
    docs = (
        _table_scan(spark, index_dir, "docs")
        .filter(F.col("split_id").isin([s.split_id for s in splits]))
        .select("split_id", "doc_id", f"`{field}`")
    )
    return hits.select("split_id", "doc_id").join(docs, ["split_id", "doc_id"])


def search_agg_terms_stats(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    terms_field: str,
    metric_field: str,
    size: int | None = None,
) -> DataFrame:
    """ES-style sub-aggregation: terms buckets over ``terms_field`` (fast or
    stored), each carrying stats (doc_count/min/max/sum/avg) of the fast i64
    ``metric_field`` — one stream-leaf pass + one hash agg, the
    terms-with-nested-metric shape."""
    _, config = open_index(spark, index_dir)
    t_fast = (
        terms_field == config.timestamp_field
        or terms_field in config.extra_fast_fields
    )
    if t_fast:
        vals = search_stream_multi(
            spark, index_dir, request, [terms_field, metric_field]
        )
    else:
        if terms_field not in config.doc_cols():
            raise ValueError(f"field {terms_field!r} is neither fast nor stored")
        resolved = _resolve_fast_field(spark, index_dir, metric_field)
        req = _dc_replace(request, start_offset=0, sort_by_field=None)
        hits, splits, _ast, _cfg = _leaf_hits_df(
            spark, index_dir, req, stream_fields=(resolved,)
        )
        hits = hits.select(
            "split_id", "doc_id", F.col("mf_0").alias(metric_field)
        )
        docs = (
            _table_scan(spark, index_dir, "docs")
            .filter(F.col("split_id").isin([s.split_id for s in splits]))
            .select("split_id", "doc_id", f"`{terms_field}`")
        )
        vals = hits.join(docs, ["split_id", "doc_id"])
    m = F.col(f"`{metric_field}`")
    out = (
        vals.groupBy(F.col(f"`{terms_field}`").alias("value"))
        .agg(
            F.count("*").cast("long").alias("doc_count"),
            F.min(m).cast("long").alias("min"),
            F.max(m).cast("long").alias("max"),
            F.sum(m).cast("long").alias("sum"),
        )
        .select(
            "value",
            "doc_count",
            "min",
            "max",
            "sum",
            F.round(F.col("sum").cast("double") / F.col("doc_count"), 4).alias("avg"),
        )
        .orderBy(F.col("doc_count").desc(), F.col("value").asc())
    )
    return out.limit(int(size)) if size is not None else out


def search_agg_significant_terms(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    field: str = "text",
    size: int | None = None,
    min_doc_count: int = 3,
) -> DataFrame:
    """ES-style significant_terms over a tokenized text ``field``: the terms
    whose document frequency among the MATCHING docs (foreground) is
    anomalously high versus the whole corpus (background), scored with the
    ES JLH heuristic ``(fg% - bg%) * fg%/bg%`` (absolute lift × relative
    lift); only terms with fg% > bg% and foreground df >= ``min_doc_count``
    qualify.  Returns (term, fg_count, bg_count, score) ordered by score
    desc then term.

    Scale shape (beyond-reference — quickwit v0.2 only counts hits):

    * foreground: one stream-leaf match pass (postings decoded once per
      split), a split+column-pruned doc-store join for ``field``, JVM-side
      tokenization (``filter(split(lower(..)))`` — the same default-tokenizer
      definition the index build uses, whole-stage codegen, zero Python),
      ``explode(array_distinct(..))`` and ONE hash agg keyed on term — work
      is O(matching docs), key cardinality is the foreground vocabulary.
    * background: the term-stats LSM deltas (the same O(publish-batches)
      files that give cold queries their global doc_freq,
      index/builder.py _write_termstats_delta) read as ONE Spark scan and
      summed per term — the corpus is NEVER rescanned.  If the LSM is
      incomplete the corpus text is re-tokenized as a fallback.
    """
    cat, config = open_index(spark, index_dir)
    _check_significant_field(config, field)
    vals = _agg_values_df(spark, index_dir, request, field).persist()
    try:
        fg_total = vals.count()
        out = _significant_terms_df(
            spark, index_dir, cat, vals, fg_total, field, size, min_doc_count
        )
        # the page is tiny (<= size terms) but must materialize before the
        # unpersist below; one Arrow round trip (toPandas -> createDataFrame
        # with the computed schema), not a row-by-row collect
        return spark.createDataFrame(out.toPandas(), schema=out.schema)
    finally:
        vals.unpersist()


def _default_tokens_expr(c):
    """JVM twin of functions/tokenizer.py tokenize_text: split on
    non-alphanumeric runs, lowercase, drop empties and tokens > 40 chars
    (tantivy RemoveLongFilter) — stays in whole-stage codegen."""
    return F.filter(
        F.split(F.lower(c), "[^0-9a-z]+"),
        lambda t: (t != F.lit("")) & (F.length(t) <= 40),
    )


def _check_significant_field(config, field: str) -> None:
    fm = config.fields.get(field)
    if fm is None or fm.scalar_type != "text" or fm.tokenizer != "default":
        raise ValueError(
            f"significant_terms needs a default-tokenized text field, got {field!r}"
        )
    if field not in config.doc_cols():
        raise ValueError(f"field {field!r} is not stored")


def _significant_terms_df(
    spark: SparkSession,
    index_dir: str,
    cat: Catalog,
    vals: DataFrame,
    fg_total: int,
    field: str,
    size: int | None,
    min_doc_count: int,
) -> DataFrame:
    """Core of significant_terms given the per-match ``field`` values:
    foreground df = one tokenize + hash agg over ``vals``; background df =
    the term-stats LSM deltas summed per term (doc-store rescan only if the
    LSM is incomplete); JLH score, ordered desc."""
    fg = (
        vals.select(
            F.explode(
                F.array_distinct(_default_tokens_expr(F.col(f"`{field}`")))
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count("*").cast("long").alias("fg_count"))
        .filter(F.col("fg_count") >= int(min_doc_count))
    )
    bg_total = cat.global_stats()["num_docs"]
    ts_files = cat.termstats_files()
    if ts_files:
        st = storage_for(index_dir)
        bg = (
            spark.read.parquet(*[st.spark_url(p) for p in ts_files])
            .filter(F.col("field") == field)
            .groupBy("term")
            .agg(F.sum("doc_freq").cast("long").alias("bg_count"))
        )
    else:  # LSM incomplete: derive background df from the doc store
        bg = (
            _table_scan(spark, index_dir, "docs")
            .select(
                F.explode(
                    F.array_distinct(_default_tokens_expr(F.col(f"`{field}`")))
                ).alias("term")
            )
            .groupBy("term")
            .agg(F.count("*").cast("long").alias("bg_count"))
        )
    fgp = F.col("fg_count") / F.lit(float(fg_total))
    bgp = F.col("bg_count") / F.lit(float(bg_total))
    out = (
        fg.join(bg, "term")
        .filter(fgp > bgp)
        .select(
            "term",
            "fg_count",
            "bg_count",
            F.round((fgp - bgp) * fgp / bgp, 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("term").asc())
    )
    return out.limit(int(size)) if size is not None else out


def search_agg_histogram(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    field: str,
    interval: int,
) -> DataFrame:
    """ES-style numeric histogram over every matching doc's fast i64
    ``field``: bucket = value floored to ``interval``, value = doc count.
    The date histogram is this with the timestamp field.  One stream-leaf
    pass + one map-side-combined hash agg — bucket cardinality is bounded
    by value range / interval, never by rows."""
    if interval <= 0:
        raise ValueError(f"interval must be positive, got {interval}")
    hits = search_stream(spark, index_dir, request, field)
    iv = int(interval)
    bucket = (F.floor(F.col(f"`{field}`") / F.lit(iv)) * iv).cast("long")
    return (
        hits.groupBy(bucket.alias("bucket"))
        .agg(F.count("*").cast("long").alias("doc_count"))
        .orderBy("bucket")
    )


def search_agg_range(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    field: str,
    edges: list,
) -> DataFrame:
    """ES-style range aggregation over every matching doc's fast i64
    ``field``: sorted ``edges`` [e0, e1, ...] define buckets (-inf, e0),
    [e0, e1), ..., [e_last, +inf) — lo inclusive, hi exclusive, the ES
    range-agg convention.  Returns (lo, hi, doc_count) with NULL for the
    open ends; empty buckets are omitted (count them client-side if the
    ES zero-filled shape is needed).  One stream-leaf pass + one hash agg
    keyed on the bucket ordinal — the reduce is O(len(edges))."""
    es = [int(e) for e in edges]
    if not es or es != sorted(es) or len(set(es)) != len(es):
        raise ValueError(f"edges must be non-empty, strictly increasing: {edges}")
    hits = search_stream(spark, index_dir, request, field)
    v = F.col(f"`{field}`")
    # bucket ordinal = number of edges <= v (0 .. len(es)), a branch-free
    # sum of comparisons — Catalyst folds this into one projection
    ordinal = sum((v >= F.lit(e)).cast("int") for e in es)
    out = (
        hits.groupBy(ordinal.alias("ord"))
        .agg(F.count("*").cast("long").alias("doc_count"))
    )
    # element_at is 1-indexed and raises on index 0, so both ends guard
    edges_lit = F.lit(es)
    lo = F.when(F.col("ord") > 0, F.element_at(edges_lit, F.col("ord")))
    hi = F.when(F.col("ord") < len(es), F.element_at(edges_lit, F.col("ord") + 1))
    return (
        out.select(
            lo.cast("long").alias("lo"),
            hi.cast("long").alias("hi"),
            "doc_count",
        )
        .orderBy(F.col("lo").asc_nulls_first())
    )


def search_agg_top_hits(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    terms_field: str,
    sort_field: str,
    k: int,
    asc: bool = False,
) -> DataFrame:
    """ES-style top_hits sub-aggregation: for each terms bucket over
    ``terms_field`` (fast or stored), the top ``k`` matching docs by the
    fast i64 ``sort_field`` (desc by default), with their rank.  One
    stream-leaf pass, then ONE window shuffle keyed on the bucket value —
    per-bucket state is the top-k heap, so skewed buckets stream, they
    don't accumulate.  Ties break on (split_id, doc_id) for determinism."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    _, config = open_index(spark, index_dir)
    t_fast = (
        terms_field == config.timestamp_field
        or terms_field in config.extra_fast_fields
    )
    if t_fast:
        vals = search_stream_multi(
            spark, index_dir, request, [terms_field, sort_field]
        )
    else:
        if terms_field not in config.doc_cols():
            raise ValueError(f"field {terms_field!r} is neither fast nor stored")
        hits = search_stream_multi(spark, index_dir, request, [sort_field])
        req_splits = [
            r["split_id"] for r in hits.select("split_id").distinct().collect()
        ]
        docs = (
            _table_scan(spark, index_dir, "docs")
            .filter(F.col("split_id").isin(req_splits))
            .select("split_id", "doc_id", f"`{terms_field}`")
        )
        vals = hits.join(docs, ["split_id", "doc_id"])
    from pyspark.sql.window import Window

    sv = F.col(f"`{sort_field}`")
    order = [sv.asc() if asc else sv.desc(), F.col("split_id"), F.col("doc_id")]
    w = Window.partitionBy(F.col(f"`{terms_field}`")).orderBy(*order)
    return (
        vals.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col(f"`{terms_field}`").alias("value"),
            "rank",
            sv.cast("long").alias("sort_value"),
        )
        .orderBy("value", "rank")
    )


def search_collapse(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    collapse_field: str,
    tie_field: str | None = None,
) -> DataFrame:
    """ES-style field collapse (beyond-reference; the natural "top
    conversations" query over a transcript corpus): one result row per
    distinct ``collapse_field`` value among the matching docs — each
    group's highest-BM25 doc — with groups ranked by that best score.

    Plan: ONE scored stream-leaf pass (every match is BM25-scored in full:
    a group's best hit can be any of its docs, so top-k pruning cannot
    apply), ONE window shuffle keyed on the collapse value (per-group
    state is a single row — skewed groups stream through the rank, they
    don't accumulate), then the offset..offset+max_hits winners join the
    split-pruned, column-pruned doc store for their stored fields.
    Ordering and ties: (score desc, split_id, doc_id), or
    (score desc, tie_field asc) when ``tie_field`` names a fast field
    that is a global document key (split-layout-independent ordering).
    Returns (collapse value, group_hits, score, split_id, doc_id, stored
    fields...)."""
    reps, order, config = _collapse_reps(
        spark, index_dir, request, collapse_field, tie_field
    )
    return _collapse_page(
        spark, index_dir, request, collapse_field, reps, order, config
    )


def _collapse_reps(spark, index_dir, request, collapse_field, tie_field):
    """Shared collapse core: the per-group representative rows (__ckey,
    group_hits, score, split_id, doc_id[, __tie]) plus the order columns."""
    vals, config = _collapse_vals(
        spark, index_dir, request, collapse_field, tie_field
    )
    from pyspark.sql.window import Window

    order = (
        [F.col("score").desc(), F.col("__tie")]
        if tie_field is not None
        else [F.col("score").desc(), F.col("split_id"), F.col("doc_id")]
    )
    w = Window.partitionBy("__ckey").orderBy(*order)
    reps = (
        vals.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "group_hits",
            F.count("*").over(Window.partitionBy("__ckey")).cast("long"),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    return reps, order, config


def _collapse_vals(spark, index_dir, request, collapse_field, tie_field):
    """One index's scored match stream with the collapse key attached:
    (split_id, doc_id, score, __ckey[, __tie]).  The pre-window half of
    collapse, shared by the single-index path and the multi-index union."""
    if request.sort_by_field is not None:
        raise ValueError("collapse ranks by BM25; sort_by_field is not supported")
    if request.search_after is not None:
        raise ValueError("collapse does not support search_after cursors")
    _, config = open_index(spark, index_dir)

    def _is_fast(f: str) -> bool:
        return f == config.timestamp_field or f in config.extra_fast_fields

    if tie_field is not None and not _is_fast(tie_field):
        raise ValueError(f"tie_field {tie_field!r} must be a fast field")
    fast = _is_fast(collapse_field)
    req = _dc_replace(request, start_offset=0, sort_by_field=None)
    stream_fields = tuple(
        _resolve_fast_field(spark, index_dir, f)
        for f in ([collapse_field] if fast else []) + ([tie_field] if tie_field else [])
    )
    hits, splits, _ast, _cfg = _leaf_hits_df(
        spark, index_dir, req, stream_fields=stream_fields or None, stream_scored=True
    )
    cols = [F.col("split_id"), F.col("doc_id"), F.col("score")]
    if fast:
        cols.append(F.col("mf_0").alias("__ckey"))
    if tie_field is not None:
        cols.append(F.col(f"mf_{len(stream_fields) - 1}").alias("__tie"))
    vals = hits.select(*cols)
    if not fast:
        if collapse_field not in config.doc_cols():
            raise ValueError(
                f"field {collapse_field!r} is neither fast nor stored"
            )
        keys = (
            _table_scan(spark, index_dir, "docs")
            .filter(F.col("split_id").isin([s.split_id for s in splits]))
            .select(
                "split_id", "doc_id", F.col(f"`{collapse_field}`").alias("__ckey")
            )
        )
        vals = vals.join(keys, ["split_id", "doc_id"])
    return vals, config


def _collapse_page(
    spark, index_dir, request, collapse_field, reps, order, config
) -> DataFrame:
    """Page the representatives and join the winners' stored fields."""
    page = (
        reps.orderBy(*order)
        .offset(int(request.start_offset))
        .limit(int(request.max_hits))
    )
    f_cols = [c for c in fetch_cols(config) if c != "doc_id"]
    docs_tbl = _table_scan(spark, index_dir, "docs").select(
        "split_id", "doc_id", *[F.col(f"`{c}`") for c in f_cols]
    )
    return (
        page.join(docs_tbl, ["split_id", "doc_id"], "left")
        .select(
            F.col("__ckey").alias(collapse_field),
            "group_hits",
            "score",
            "split_id",
            "doc_id",
            *[F.col(f"`{c}`") for c in f_cols if c != collapse_field],
        )
        .orderBy(*order)
    )


def search_collapse_rows(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    collapse_field: str,
    tie_field: str | None = None,
) -> tuple[list[dict], int, int]:
    """Collapse for the REST path: (hits as JSON-safe dicts, total distinct
    groups, total matching docs).  The representatives DataFrame is
    persisted so the totals aggregate and the page read evaluate the
    scored leaf ONCE (the search_agg_multi persist pattern)."""
    reps, order, config = _collapse_reps(
        spark, index_dir, request, collapse_field, tie_field
    )
    reps = reps.persist()
    try:
        tot = reps.agg(
            F.count("*").cast("long").alias("groups"),
            F.coalesce(F.sum("group_hits"), F.lit(0)).cast("long").alias("docs"),
        ).collect()[0]
        page = _collapse_page(
            spark, index_dir, request, collapse_field, reps, order, config
        )
        rows = [
            {k: _json_safe(v) for k, v in r.asDict().items()}
            for r in page.collect()
        ]
        return rows, int(tot["groups"]), int(tot["docs"])
    finally:
        reps.unpersist()


def multi_index_collapse_rows(
    spark: SparkSession,
    index_dirs: list[str],
    request: SearchRequest,
    collapse_field: str,
    tie_field: str | None = None,
) -> tuple[list[dict], int, int]:
    """Field collapse across SEVERAL indexes, EXACT: every index's scored
    match stream (with the collapse key attached) unions into one
    DataFrame and a SINGLE window picks each group's representative over
    the union — so a group spanning indexes has one winner and its
    group_hits counts every member, unlike a merge of per-index collapse
    pages (a group ranked low in one index would lose members silently).
    BM25 scores use each index's own collection stats (the same ES
    query_then_fetch contract as multi_index_search), with the index
    ordinal in the deterministic tie chain.  Returns (rows with
    ``index_id``, total groups, total matching docs)."""
    if len(set(index_dirs)) != len(index_dirs) or not index_dirs:
        raise ValueError("index_dirs must be a non-empty list of distinct indexes")
    if len(index_dirs) == 1:
        return search_collapse_rows(
            spark, index_dirs[0], request, collapse_field, tie_field
        )
    from pyspark.sql.window import Window

    parts, configs = [], []
    for i, d in enumerate(index_dirs):
        vals, config = _collapse_vals(
            spark, d, request, collapse_field, tie_field
        )
        parts.append(vals.withColumn("__qw_idx", F.lit(i)))
        configs.append(config)
    f_cols = [c for c in fetch_cols(configs[0]) if c != "doc_id"]
    for d, cfg in zip(index_dirs[1:], configs[1:]):
        if [c for c in fetch_cols(cfg) if c != "doc_id"] != f_cols:
            raise ValueError(
                f"stored-field sets differ across indexes (at {d}) — "
                "cannot collapse across"
            )
    vals = parts[0]
    for p in parts[1:]:
        vals = vals.unionByName(p)
    order = [F.col("score").desc()]
    if tie_field is not None:
        order.append(F.col("__tie"))
    order += [F.col("__qw_idx"), F.col("split_id"), F.col("doc_id")]
    w = Window.partitionBy("__ckey").orderBy(*order)
    reps = (
        vals.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "group_hits",
            F.count("*").over(Window.partitionBy("__ckey")).cast("long"),
        )
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .persist()
    )
    try:
        tot = reps.agg(
            F.count("*").cast("long").alias("groups"),
            F.coalesce(F.sum("group_hits"), F.lit(0)).cast("long").alias("docs"),
        ).collect()[0]
        page = (
            reps.orderBy(*order)
            .offset(int(request.start_offset))
            .limit(int(request.max_hits))
        ).persist()
        try:
            pages = []
            for i, d in enumerate(index_dirs):
                docs_tbl = _table_scan(spark, d, "docs").select(
                    "split_id", "doc_id", *[F.col(f"`{c}`") for c in f_cols]
                )
                pages.append(
                    page.filter(F.col("__qw_idx") == i)
                    .join(docs_tbl, ["split_id", "doc_id"], "left")
                    .withColumn(
                        "index_id",
                        F.lit(os.path.basename(d.rstrip("/"))),
                    )
                )
            joined = pages[0]
            for p in pages[1:]:
                joined = joined.unionByName(p)
            out = joined.select(
                F.col("__ckey").alias(collapse_field),
                "group_hits",
                "score",
                "index_id",
                "split_id",
                "doc_id",
                *[F.col(f"`{c}`") for c in f_cols if c != collapse_field],
            ).orderBy(*order)
            rows = [
                {k: _json_safe(v) for k, v in r.asDict().items()}
                for r in out.collect()
            ]
        finally:
            page.unpersist()
        return rows, int(tot["groups"]), int(tot["docs"])
    finally:
        reps.unpersist()


def search_agg_filters(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    filters: dict[str, str],
) -> DataFrame:
    """ES-style filters aggregation: named sub-queries, each counted within
    the base request's scope (``base AND (filter)``), ALL evaluated in ONE
    batched leaf pass (multi_search: each leaf task opens its split once,
    reads the union of every filter's posting rows in one pruned scan, and
    runs every count against it — Q filters cost ~one query's job floor,
    not Q).  Counts are exact (the count-only path never materializes
    hits).  Returns (key, doc_count) in the caller's filter order."""
    if not filters:
        raise ValueError("filters must be non-empty")
    reqs = []
    for name, q in filters.items():
        if not str(q).strip():
            raise ValueError(f"filter {name!r} has an empty query")
        base = request.query.strip()
        combined = f"({base}) AND ({q})" if base else str(q)
        reqs.append(
            _dc_replace(
                request,
                query=combined,
                max_hits=0,
                start_offset=0,
                tiebreak="reference",  # counts are tiebreak-independent
            )
        )
    resps = multi_search(spark, index_dir, reqs)
    rows = [(name, int(r.num_hits)) for name, r in zip(filters, resps)]
    return spark.createDataFrame(rows, "key string, doc_count long")


def search_agg_cardinality(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    field: str,
) -> DataFrame:
    """ES-style cardinality aggregation over every matching doc's ``field``
    (fast or stored) — EXACT distinct count (one partial-agg distinct
    shuffle), not the HLL approximation: one row (doc_count, cardinality)."""
    vals = _agg_values_df(spark, index_dir, request, field)
    return vals.agg(
        F.count("*").cast("long").alias("doc_count"),
        F.countDistinct(F.col(f"`{field}`")).cast("long").alias("cardinality"),
    )


def search_agg_stats(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    field: str,
    extended: bool = False,
) -> DataFrame:
    """ES-style stats aggregation over every matching doc's fast i64
    ``field``: one row (count, min, max, sum, avg).  avg is computed as
    sum/count explicitly so any engine reproduces the exact double.

    ``extended`` adds the ES extended_stats tail — sum_of_squares,
    population variance and std_deviation — with the same determinism
    discipline: the squared sum accumulates EXACTLY (decimal(38,0), order
    independent, no float-summation drift), variance is the closed integer
    form (n·Σv² − (Σv)²)/n² evaluated as one double division of two exact
    integers, and std is sqrt of that unrounded double — so a SQL twin
    computing CAST(exact)/CAST(exact) reproduces every bit before the one
    final ROUND."""
    hits = search_stream(spark, index_dir, request, field)
    c = F.col(f"`{field}`")
    d = c.cast("decimal(38,0)")
    aggs = [
        F.count("*").cast("long").alias("doc_count"),
        F.min(c).cast("long").alias("min"),
        F.max(c).cast("long").alias("max"),
        F.sum(c).cast("long").alias("sum"),
    ]
    if extended:
        aggs.append(F.sum(d * d).cast("decimal(38,0)").alias("__ss"))
    out = hits.agg(*aggs)
    cols = [
        F.col("doc_count"),
        F.col("min"),
        F.col("max"),
        F.col("sum"),
        F.round(F.col("sum").cast("double") / F.col("doc_count"), 4).alias("avg"),
    ]
    if extended:
        n = F.col("doc_count").cast("decimal(38,0)")
        s = F.col("sum").cast("decimal(38,0)")
        num = (F.col("__ss") * n - s * s).cast("double")
        den = (n * n).cast("double")
        cols += [
            F.col("__ss").cast("double").alias("sum_of_squares"),
            F.round(num / den, 4).alias("variance"),
            F.round(F.sqrt(num / den), 4).alias("std_deviation"),
        ]
    return out.select(*cols)


def _exact_percentiles(vals: DataFrame, col: str, qs: tuple) -> tuple[int, dict]:
    """EXACT percentiles of an int64 column without a global sort, scale-safe:

    1. ONE map-side-combined hash agg builds the value histogram (cardinality
       = distinct values, never rows);
    2. a COARSE histogram (value >> 16) collapses that to <= 2^48/2^16 rows —
       in practice a few thousand — whose driver-side cumsum locates the
       bucket holding each target rank;
    3. only the needed buckets' fine rows are collected (<= 65536 distinct
       values each) and the closed formula ``min(v) where cum >= ceil(q*n)``
       picks the exact value — the same formula a SQL twin evaluates with a
       window cumsum, so engines agree by construction.

    Returns (n, {'p50': v, ...}); values are None when n == 0."""
    import math

    v = F.col(f"`{col}`").cast("long")
    hist = vals.groupBy(v.alias("v")).agg(F.count("*").cast("long").alias("c"))
    hist = hist.persist()
    try:
        coarse = sorted(
            (int(r["b"]), int(r["c"]))
            for r in hist.groupBy(F.shiftright("v", 16).alias("b"))
            .agg(F.sum("c").alias("c"))
            .collect()
        )
        n = sum(c for _, c in coarse)
        names = [f"p{round(q * 100)}" for q in qs]
        if n == 0:
            return 0, {name: None for name in names}
        # rank -> owning coarse bucket + count of values before it
        targets: dict[str, tuple[int, int]] = {}
        for q, name in zip(qs, names):
            need = math.ceil(q * n)
            cum = 0
            for b, c in coarse:
                if cum + c >= need:
                    targets[name] = (b, need - cum)  # rank within bucket
                    break
                cum += c
        buckets = sorted({b for b, _ in targets.values()})
        fine = {
            b: sorted(rows)
            for b, rows in _group_by(
                (
                    (int(r["v"]) >> 16, (int(r["v"]), int(r["c"])))
                    for r in hist.filter(
                        F.shiftright("v", 16).isin(buckets)
                    ).collect()
                )
            ).items()
        }
        out = {}
        for name, (b, need_in_b) in targets.items():
            cum = 0
            for val, c in fine[b]:
                cum += c
                if cum >= need_in_b:
                    out[name] = val
                    break
        return n, out
    finally:
        hist.unpersist()


def _group_by(pairs):
    d: dict = {}
    for k, item in pairs:
        d.setdefault(k, []).append(item)
    return d


def search_agg_percentiles(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    field: str,
    qs: tuple = (0.5, 0.9, 0.99),
) -> DataFrame:
    """ES-style percentiles aggregation over every matching doc's fast i64
    ``field`` — EXACT (inverse-CDF, ``min(v) where cum >= ceil(q*n)``), not
    the t-digest approximation: one row (doc_count, p50, p90, p99...)."""
    hits = search_stream(spark, index_dir, request, field)
    n, pcts = _exact_percentiles(hits, field, qs)
    row = {"doc_count": n, **pcts}
    ddl = ", ".join(f"{k} long" for k in row)
    return spark.createDataFrame([tuple(row.values())], ddl)


def search_stream_multi(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    fields: list[str],
) -> DataFrame:
    """Multi-column search stream: (split_id, doc_id) of EVERY matching doc
    plus one int64 column per requested fast field, from ONE leaf pass.
    With ``fields=[]`` it is the bare match stream (identity only) — the
    cheapest vehicle for doc-store-join aggregations."""
    out_names = list(dict.fromkeys(fields))
    resolved = [_resolve_fast_field(spark, index_dir, f) for f in out_names]
    uniq = list(dict.fromkeys(resolved))
    req = _dc_replace(request, start_offset=0, sort_by_field=None)
    hits, _splits, _ast, _config = _leaf_hits_df(
        spark, index_dir, req, stream_fields=tuple(uniq)
    )
    sel = [F.col("split_id"), F.col("doc_id")]
    for name, res in zip(out_names, resolved):
        sel.append(F.col(f"mf_{uniq.index(res)}").alias(name))
    return hits.select(*sel)


def search_agg_multi(
    spark: SparkSession,
    index_dir: str,
    request: SearchRequest,
    histogram_interval: int | None = None,
    histogram_calendar: str | None = None,
    terms_field: str | None = None,
    terms_size: int | None = 10,
    terms_metric_field: str | None = None,
    stats_field: str | None = None,
    stats_extended: bool = False,
    percentiles_field: str | None = None,
    percentiles: tuple = (0.5, 0.9, 0.99),
    cardinality_field: str | None = None,
    significant_field: str | None = None,
    significant_size: int | None = 10,
    significant_min_doc_count: int = 3,
) -> dict:
    """Every requested aggregation off ONE stream leaf: the match set is
    evaluated once (postings decoded once per split), persisted, and each
    aggregation reduces the shared DataFrame.  The per-aggregation
    functions above re-run the leaf per call — fine for one aggregation,
    but an ES-style request carries several, and at data scale the match
    evaluation (not the reduce) is the cost.  Returns collected plain
    python: {'histogram': [(bucket, count)...], 'terms': [(value, count)
    ...], 'stats': {...}} — only the requested keys."""
    _, config = open_index(spark, index_dir)
    fast_fields: list[str] = []
    ts_field = None
    if histogram_interval is not None and histogram_calendar is not None:
        raise ValueError("pass either histogram_interval or histogram_calendar")
    if histogram_interval is not None or histogram_calendar is not None:
        if histogram_interval is not None and histogram_interval <= 0:
            raise ValueError(f"interval must be positive, got {histogram_interval}")
        ts_field = config.timestamp_field
        if ts_field is None:
            raise ValueError("index has no timestamp field for the histogram")
        if histogram_calendar is not None:  # validate unit + UTC up front
            _calendar_bucket_expr(spark, ts_field, histogram_calendar)
        fast_fields.append(ts_field)
    def _classify(field: str) -> bool:
        """True → fast (ride the stream leaf); False → stored (doc-store
        join); raises on neither."""
        fast = (
            field == config.timestamp_field or field in config.extra_fast_fields
        )
        if fast:
            fast_fields.append(field)
        elif field not in config.doc_cols():
            raise ValueError(f"field {field!r} is neither fast nor stored")
        return fast

    terms_fast = terms_field is not None and _classify(terms_field)
    card_fast = cardinality_field is not None and _classify(cardinality_field)
    if significant_field is not None:
        _check_significant_field(config, significant_field)
    if terms_metric_field is not None:
        if terms_field is None:
            raise ValueError("terms_metric_field requires terms_field")
        fast_fields.append(terms_metric_field)  # metric must be a fast i64
    if stats_field is not None:
        fast_fields.append(stats_field)
    if percentiles_field is not None:
        fast_fields.append(percentiles_field)
    hits = search_stream_multi(spark, index_dir, request, fast_fields)
    hits = hits.persist()

    def _vals(field: str, fast: bool, keep: tuple = ()) -> DataFrame:
        """hits rows carrying ``field`` (plus the stream-leaf ``keep``
        columns when the field lives in the doc store)."""
        if fast:
            return hits
        return _doc_store_vals(spark, index_dir, hits, field, keep)

    def _significant(vals_df: DataFrame, n_hits: int) -> DataFrame:
        cat, _ = open_index(spark, index_dir)
        return _significant_terms_df(
            spark, index_dir, cat, vals_df, n_hits,
            significant_field, significant_size, significant_min_doc_count,
        )

    try:
        return _agg_reduce(
            hits, _vals,
            ts_field=ts_field,
            histogram_interval=histogram_interval,
            histogram_calendar=histogram_calendar,
            terms_field=terms_field, terms_fast=terms_fast,
            terms_size=terms_size, terms_metric_field=terms_metric_field,
            stats_field=stats_field, stats_extended=stats_extended,
            percentiles_field=percentiles_field, percentiles=percentiles,
            cardinality_field=cardinality_field, card_fast=card_fast,
            significant_field=significant_field, significant=_significant,
        )
    finally:
        hits.unpersist()


def multi_index_agg(
    spark: SparkSession,
    index_dirs: list[str],
    request: SearchRequest,
    histogram_interval: int | None = None,
    histogram_calendar: str | None = None,
    terms_field: str | None = None,
    terms_size: int | None = 10,
    terms_metric_field: str | None = None,
    stats_field: str | None = None,
    stats_extended: bool = False,
    percentiles_field: str | None = None,
    percentiles: tuple = (0.5, 0.9, 0.99),
    cardinality_field: str | None = None,
) -> dict:
    """Aggregations over SEVERAL indexes (the ES ``/a,b/_search`` agg
    shape; round-2 rejected multi-index for aggs).  Each index runs its
    own stream leaf for the match set with the requested fast fields
    materialized, the per-index hit streams UNION into one DataFrame, and
    the shared reduce core (_agg_reduce) folds them in ONE Spark job — so
    bucket counts sum exactly, percentiles merge exactly (the reduce sees
    every value, not per-index sketches), and cardinality is the true
    distinct count across indexes, never a merged approximation.  At
    cluster scale this is the same plan a single index of the combined
    size would run: no per-index driver materialization, no second pass.

    Doc-store (non-fast) group fields join each index's OWN doc store and
    union the results — split ids are only unique within one index, so a
    cross-index join keyed on (split_id, doc_id) alone would collide.

    ``significant_terms`` is per-index by construction (its background
    frequencies come from one index's term-stats LSM) and is rejected
    here, matching the serve layer's documented surface."""
    if len(set(index_dirs)) != len(index_dirs) or not index_dirs:
        raise ValueError("index_dirs must be a non-empty list of distinct indexes")
    if histogram_interval is not None and histogram_calendar is not None:
        raise ValueError("pass either histogram_interval or histogram_calendar")
    if histogram_interval is not None and histogram_interval <= 0:
        raise ValueError(f"interval must be positive, got {histogram_interval}")
    if terms_metric_field is not None and terms_field is None:
        raise ValueError("terms_metric_field requires terms_field")

    # Per-index field classification must AGREE: a field fast in one index
    # and doc-store in another would silently change reduce semantics.
    fast_fields: list[str] = []
    ts_field = None
    terms_fast = card_fast = None
    for d in index_dirs:
        _, config = open_index(spark, d)
        if histogram_interval is not None or histogram_calendar is not None:
            tsf = config.timestamp_field
            if tsf is None:
                raise ValueError(f"index {d} has no timestamp field for the histogram")
            if ts_field is not None and tsf != ts_field:
                raise ValueError(
                    f"timestamp field differs across indexes: {ts_field!r} vs {tsf!r}"
                )
            ts_field = tsf
            if histogram_calendar is not None:
                _calendar_bucket_expr(spark, ts_field, histogram_calendar)

        def _classify(field: str) -> bool:
            fast = (
                field == config.timestamp_field or field in config.extra_fast_fields
            )
            if not fast and field not in config.doc_cols():
                raise ValueError(
                    f"field {field!r} is neither fast nor stored in {d}"
                )
            return fast

        for fname, prev, setter in (
            (terms_field, terms_fast, "terms_fast"),
            (cardinality_field, card_fast, "card_fast"),
        ):
            if fname is None:
                continue
            fast = _classify(fname)
            if prev is not None and prev != fast:
                raise ValueError(
                    f"field {fname!r} is fast in some indexes and stored in "
                    "others — cannot aggregate across"
                )
            if setter == "terms_fast":
                terms_fast = fast
            else:
                card_fast = fast
        for fname in (terms_metric_field, stats_field, percentiles_field):
            if fname is not None and not _classify(fname):
                raise ValueError(f"field {fname!r} must be a fast field in {d}")
    if ts_field is not None:
        fast_fields.append(ts_field)
    if terms_field is not None and terms_fast:
        fast_fields.append(terms_field)
    if cardinality_field is not None and card_fast:
        fast_fields.append(cardinality_field)
    for fname in (terms_metric_field, stats_field, percentiles_field):
        if fname is not None:
            fast_fields.append(fname)

    inner = _dc_replace(request, start_offset=0, sort_by_field=None)
    per_index = [
        search_stream_multi(spark, d, inner, fast_fields).withColumn(
            "__qw_idx", F.lit(i)
        )
        for i, d in enumerate(index_dirs)
    ]
    hits = per_index[0]
    for h in per_index[1:]:
        hits = hits.unionByName(h)
    hits = hits.persist()

    def _vals(field: str, fast: bool, keep: tuple = ()) -> DataFrame:
        if fast:
            return hits
        parts = [
            _doc_store_vals(
                spark, d, hits.filter(F.col("__qw_idx") == i), field, keep
            )
            for i, d in enumerate(index_dirs)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    try:
        return _agg_reduce(
            hits, _vals,
            ts_field=ts_field,
            histogram_interval=histogram_interval,
            histogram_calendar=histogram_calendar,
            terms_field=terms_field, terms_fast=terms_fast,
            terms_size=terms_size, terms_metric_field=terms_metric_field,
            stats_field=stats_field, stats_extended=stats_extended,
            percentiles_field=percentiles_field, percentiles=percentiles,
            cardinality_field=cardinality_field, card_fast=card_fast,
        )
    finally:
        hits.unpersist()


def _doc_store_vals(
    spark: SparkSession, index_dir: str, hits: DataFrame, field: str, keep: tuple = ()
) -> DataFrame:
    """Join the hit stream back to ONE index's doc store for a stored
    field's values (split-partition-pruned scan)."""
    splits = [
        r["split_id"] for r in hits.select("split_id").distinct().collect()
    ]
    docs = (
        _table_scan(spark, index_dir, "docs")
        .filter(F.col("split_id").isin(splits))
        .select("split_id", "doc_id", f"`{field}`")
    )
    lhs = hits.select("split_id", "doc_id", *[F.col(f"`{c}`") for c in keep])
    return lhs.join(docs, ["split_id", "doc_id"])


def _agg_reduce(
    hits: DataFrame,
    _vals,
    *,
    ts_field,
    histogram_interval,
    histogram_calendar,
    terms_field,
    terms_fast,
    terms_size,
    terms_metric_field,
    stats_field,
    stats_extended,
    percentiles_field,
    percentiles,
    cardinality_field,
    card_fast,
    significant_field=None,
    significant=None,
) -> dict:
    """The aggregation reduce core over a persisted hit stream.  Shared by
    the single-index path (search_agg_multi) and multi-index aggregation
    (multi_index_agg): the multi-index case feeds the UNION of the
    per-index hit streams, so every reduce — bucket counts, exact
    percentiles, distinct cardinality — merges across indexes inside ONE
    Spark job instead of approximating from per-index partials."""
    spark = hits.sparkSession
    out: dict = {}
    if histogram_interval is not None or histogram_calendar is not None:
        if histogram_calendar is not None:
            bucket = _calendar_bucket_expr(spark, ts_field, histogram_calendar)
        else:
            iv = int(histogram_interval)
            bucket = (F.floor(F.col(f"`{ts_field}`") / F.lit(iv)) * iv).cast("long")
        rows = (
            hits.groupBy(bucket.alias("bucket"))
            .agg(F.count("*").cast("long").alias("doc_count"))
            .collect()
        )
        out["histogram"] = sorted((int(r["bucket"]), int(r["doc_count"])) for r in rows)
    if terms_field is not None:
        tdf = (
            _vals(terms_field, terms_fast)
            .groupBy(F.col(f"`{terms_field}`").alias("value"))
            .agg(F.count("*").cast("long").alias("doc_count"))
            .orderBy(F.col("doc_count").desc(), F.col("value").asc())
        )
        if terms_size is not None:
            tdf = tdf.limit(int(terms_size))
        out["terms"] = [(r["value"], int(r["doc_count"])) for r in tdf.collect()]
    if terms_metric_field is not None:
        m = F.col(f"`{terms_metric_field}`")
        sdf = (
            _vals(terms_field, terms_fast, keep=(terms_metric_field,))
            .groupBy(F.col(f"`{terms_field}`").alias("value"))
            .agg(
                F.count("*").cast("long").alias("doc_count"),
                F.min(m).cast("long").alias("min"),
                F.max(m).cast("long").alias("max"),
                F.sum(m).cast("long").alias("sum"),
            )
            .orderBy(F.col("doc_count").desc(), F.col("value").asc())
        )
        if terms_size is not None:
            sdf = sdf.limit(int(terms_size))
        out["terms_stats"] = [
            {
                "value": r["value"],
                "doc_count": int(r["doc_count"]),
                "min": int(r["min"]),
                "max": int(r["max"]),
                "sum": int(r["sum"]),
                "avg": round(int(r["sum"]) / int(r["doc_count"]), 4),
            }
            for r in sdf.collect()
        ]
    if stats_field is not None:
        c = F.col(f"`{stats_field}`")
        d = c.cast("decimal(38,0)")
        aggs = [
            F.count("*").cast("long").alias("doc_count"),
            F.min(c).cast("long").alias("min"),
            F.max(c).cast("long").alias("max"),
            F.sum(c).cast("long").alias("sum"),
        ]
        if stats_extended:
            aggs.append(F.sum(d * d).cast("decimal(38,0)").alias("__ss"))
        r = hits.agg(*aggs).collect()[0]
        n = int(r["doc_count"])
        out["stats"] = {
            "count": n,
            "min": None if r["min"] is None else int(r["min"]),
            "max": None if r["max"] is None else int(r["max"]),
            "sum": None if r["sum"] is None else int(r["sum"]),
            "avg": None if n == 0 else round(int(r["sum"]) / n, 4),
        }
        if stats_extended:
            import math

            if n == 0:
                out["stats"].update(
                    sum_of_squares=None, variance=None, std_deviation=None
                )
            else:
                # exact integer core, ONE double division (float(num)/
                # float(den) == the SQL twin's CAST/CAST/divide), round
                # only at the edge — same discipline as the DataFrame
                # path in search_agg_stats
                ss, s = int(r["__ss"]), int(r["sum"])
                num, den = float(n * ss - s * s), float(n * n)
                var = num / den
                out["stats"].update(
                    sum_of_squares=float(ss),
                    variance=round(var, 4),
                    std_deviation=round(math.sqrt(var), 4),
                )
    if percentiles_field is not None:
        n, pcts = _exact_percentiles(hits, percentiles_field, percentiles)
        out["percentiles"] = {"count": n, **pcts}
    if cardinality_field is not None:
        r = _vals(cardinality_field, card_fast).agg(
            F.count("*").cast("long").alias("doc_count"),
            F.countDistinct(F.col(f"`{cardinality_field}`"))
            .cast("long")
            .alias("cardinality"),
        ).collect()[0]
        out["cardinality"] = {
            "count": int(r["doc_count"]),
            "cardinality": int(r["cardinality"]),
        }
    if significant_field is not None:
        sig = significant(_vals(significant_field, False), hits.count())
        out["significant_terms"] = [
            {
                "term": r["term"],
                "fg_count": int(r["fg_count"]),
                "bg_count": int(r["bg_count"]),
                "score": float(r["score"]),
            }
            for r in sig.collect()
        ]
    return out
