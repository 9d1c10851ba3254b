"""Root search: leaf job planning (bins / doc-range units), the RDD
leaf runner, root merge + pagination + cursors, stored-field page fetch,
the public search()/multi_search()/search_df()/fetch_doc()/explain()
APIs, and multi-index addressing.

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


from .plan import (
    HITS_SCHEMA,
    SearchResponse,
    SplitVanishedError,
    _fetch_ddl,
    expand_prefixes,
    fetch_cols,
    global_term_stats,
    open_index,
    prune_splits,
    resolve_sort,
    term_buckets,
)
from .split_io import (
    LAST_PHRASE_COUNTERS,
    _HOTCACHE_PROBE_TTL,
    _cached_docs_dataset,
    _cached_fastfields,
    _cached_hotcache,
    _fetch_doc_fields,
    _limit_arrow_threads,
    _lru_put,
    _phrase_ctr,
    _read_split_postings,
    _split_epoch,
    prune_splits_by_terms,
)
from .leaf import (
    _SplitPostings,
    _validate_msm,
    make_split_scorer,
    select_strategy,
    sort_key_to_f64,
    ts_elidable_strategy,
)


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


