"""REST search API — the quickwit-serve analog (quickwit-serve/src/rest.rs).

Endpoints (same shapes as docs/reference/rest-api.md):

* ``GET /health`` — liveness probe (rest.rs's /health analog).
* ``GET /metrics`` — Prometheus text exposition of the request counters
  (rest.rs:52-54 metrics_service; quickwit-common/src/metrics.rs).
* ``GET /api/v1/{index_id}/search`` — params ``query`` (required),
  ``startTimestamp``, ``endTimestamp``, ``startOffset``, ``maxHits``,
  ``searchField`` (comma-separated), ``sortByField`` →
  ``{"numHits": N, "hits": [...], "elapsedTimeMicros": T}``
  (rest-api.md:47-69; SearchRequest proto quickwit-proto/src/quickwit.rs:6-37).
* ``GET /api/v1/{index_id}/search/stream`` — params ``query``,
  ``fastField`` (required), ``outputFormat`` = ``csv`` |
  ``clickHouseRowBinary``, ``partitionByField`` (RowBinary only:
  per-partition blocks of value/size/i64s, search_stream/mod.rs:50-69) →
  ``text/csv`` body, one fast-field value per line
  (rest-api.md:70-114, search_stream/leaf.rs analog).
  ``sortByField`` uses the reference mini-DSL everywhere: ``+f`` asc,
  ``-f`` desc, bare asc (rest.rs:361-371, sort_by.rs:64-75).
* ``POST /api/v1/{index_id}/search/batch`` — body ``{"queries": [{...
  search params per query...}]}`` → ``{"responses": [...]}`` — Q queries
  in ONE Spark leaf job (multi_search; no reference analog — the
  amortized-job-floor throughput path, ~2.6x at Q=8).

The server maps ``{index_id}`` to ``<index_root>/<index_id>`` — the
metastore-by-directory convention used throughout this engine.  It is a
thin driver-side shim: each request runs the same single-RDD-job search
path as the CLI/library; a lock serializes Spark driver access (the
reference serializes per-split work onto its CPU pool the same way —
concurrency belongs to the leaf tasks, not the HTTP layer).

Run: ``python -m quickwit_spark.serve --index-root DIR [--port P]``.
"""

from __future__ import annotations

import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from quickwit_spark import metrics
from quickwit_spark.index.catalog import Catalog
from quickwit_spark.search.request import parse_numeric_filters as _parse_numeric_filters
from quickwit_spark.search.request import parse_search_after as _parse_search_after
from quickwit_spark.search.request import parse_sort_by_dsl as _sort_by_mini_dsl

# quickwit-serve/src/counters.rs:24-36 registers rest_api:search:num_requests
# and bumps it per search request (rest.rs:50); the extra families below
# cover the other routes and the error taxonomy so an operator can alert on
# 4xx/5xx rates without log scraping.
COUNTERS = {
    "search": metrics.new_counter(
        "rest_api:search:num_requests", "Number of search requests"
    ),
    "stream": metrics.new_counter(
        "rest_api:search_stream:num_requests", "Number of search stream requests"
    ),
    "batch": metrics.new_counter(
        "rest_api:search_batch:num_requests", "Number of batch search requests"
    ),
    "termdict": metrics.new_counter(
        "rest_api:termdict:num_requests", "Number of term-dictionary requests"
    ),
    "doc": metrics.new_counter(
        "rest_api:doc:num_requests", "Number of single-document GET requests"
    ),
    "errors": metrics.new_counter(
        "rest_api:errors:num_responses", "Number of 4xx/5xx REST responses"
    ),
}


def _int_or_none(qs: dict, key: str):
    v = qs.get(key, [None])[0]
    return int(v) if v is not None else None


# The reference derives its query-string structs with
# serde(deny_unknown_fields) (rest.rs:124-127, 224-227): an unrecognized
# parameter is a 400, never a silent default. Same contract here, with
# our extensions (searchAfter / snippets / explain / agg*) in the search
# set; the stream set is exactly the reference's
# SearchStreamRequestQueryString fields.
_SEARCH_PARAMS = frozenset(
    {
        "query", "searchField", "startTimestamp", "endTimestamp",
        "maxHits", "startOffset", "format", "sortByField",
        "searchAfter", "snippetFields", "snippetMaxChars", "storedFields",
        "numericFilter", "explain", "scoreExplain", "minShouldMatch",
        "aggHistogramInterval", "aggHistogramCalendar", "aggTermsField", "aggTermsSize",
        "aggTermsMetricField", "aggStatsField", "aggStatsExtended",
        "aggPercentilesField",
        "aggCardinalityField", "aggSignificantField",
        "aggSignificantSize", "aggFilters",
        "collapseField", "collapseTieField",
    }
)
_STREAM_PARAMS = frozenset(
    {
        "query", "searchField", "startTimestamp", "endTimestamp",
        "fastField", "outputFormat", "partitionByField",
    }
)




def _bad_index_id(index_id: str) -> bool:
    """Reject ids that would escape the index root when path-joined: '..'
    walks to the PARENT of the root (any directory reachable that way with
    a catalog.json would be served), and separators/drive chars nest or
    absolutize the join."""
    return (
        index_id in (".", "..")
        or "/" in index_id
        or "\\" in index_id
        or "\x00" in index_id
    )


class _Handler(BaseHTTPRequestHandler):
    server_version = "quickwit-spark-serve/0.1"

    # injected by make_server
    spark = None
    index_root = None
    lock: threading.Lock = None

    def log_message(self, *a):  # stderr noise off; the JSON responses suffice
        pass

    def _reply(self, code: int, body: bytes, ctype: str = "application/json"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _err(self, code: int, msg: str):
        COUNTERS["errors"].inc()
        self._reply(code, json.dumps({"error": msg}).encode())

    def _reply_chunked(self, chunks, ctype: str) -> None:
        """Stream an iterator of byte chunks with chunked transfer encoding —
        the search-stream path is every-matching-doc-sized, so the driver
        must never hold the whole payload (the reference streams per split
        too, search_stream/leaf.rs:47-62)."""
        self.send_response(200)
        self.send_header("Content-Type", ctype)
        self.send_header("Transfer-Encoding", "chunked")
        self.end_headers()
        for chunk in chunks:
            if chunk:
                self.wfile.write(f"{len(chunk):X}\r\n".encode() + chunk + b"\r\n")
        self.wfile.write(b"0\r\n\r\n")

    def do_POST(self):  # noqa: N802 (stdlib handler naming)
        from quickwit_spark.search.executor import multi_search
        from quickwit_spark.search.request import SearchRequest

        url = urlparse(self.path)
        parts = [p for p in url.path.split("/") if p]
        if (
            len(parts) != 5
            or parts[:2] != ["api", "v1"]
            or parts[3:] != ["search", "batch"]
        ):
            return self._err(404, f"no POST route for {url.path}")
        COUNTERS["batch"].inc()
        if _bad_index_id(parts[2]):
            return self._err(404, f"index {parts[2]!r} not found")
        index_dir = os.path.join(self.index_root, parts[2])
        if not Catalog.exists(index_dir):
            return self._err(404, f"index {parts[2]!r} not found")
        try:
            n = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(n) or b"{}")
            reqs = []
            for q in body.get("queries", []):
                sf, s_asc = _sort_by_mini_dsl(q.get("sortByField"))
                reqs.append(
                    SearchRequest(
                        query=q["query"],
                        max_hits=int(q.get("maxHits", 20)),
                        start_offset=int(q.get("startOffset", 0)),
                        start_timestamp=q.get("startTimestamp"),
                        end_timestamp=q.get("endTimestamp"),
                        search_fields=(
                            tuple(q["searchField"].split(",")) if "searchField" in q else None
                        ),
                        sort_by_field=sf,
                        sort_asc=s_asc,
                        search_after=_parse_search_after(q.get("searchAfter")),
                        stored_fields=(
                            tuple(q["storedFields"].split(","))
                            if "storedFields" in q
                            else None
                        ),
                        numeric_filters=_parse_numeric_filters(
                            q.get("numericFilters")
                        ),
                    )
                )
            if not reqs:
                return self._err(400, "body must contain a non-empty 'queries' list")
            with self.lock:
                resps = multi_search(self.spark, index_dir, reqs)
        except (ValueError, KeyError, json.JSONDecodeError) as e:
            return self._err(400, str(e))
        out = {
            "responses": [
                {
                    "numHits": r.num_hits,
                    "hits": r.hits,
                    "elapsedTimeMicros": r.elapsed_time_micros,
                }
                for r in resps
            ]
        }
        return self._reply(200, json.dumps(out).encode())

    def do_GET(self):  # noqa: N802 (stdlib handler naming)
        from quickwit_spark.search.executor import search, search_stream
        from quickwit_spark.search.request import SearchRequest

        url = urlparse(self.path)
        parts = [p for p in url.path.split("/") if p]
        if parts in (["health"], ["health", "livez"]):  # health_check.rs:50
            return self._reply(200, b'{"status": "ok"}')
        if parts == ["metrics"]:  # rest.rs:52-54 metrics_service
            return self._reply(200, metrics.render().encode(), metrics.CONTENT_TYPE)
        if parts == ["cluster", "members"]:
            # cluster.rs:52 analog — on Spark the "cluster" is the app and
            # its executors (the scheduler owns membership/retry, so this
            # is observability, not routing)
            sc = self.spark.sparkContext
            out = {
                "members": [
                    {
                        "id": sc.applicationId,
                        "master": sc.master,
                        "default_parallelism": sc.defaultParallelism,
                    }
                ]
            }
            return self._reply(200, json.dumps(out).encode())
        # /api/v1/{index_id}/search[/stream] | /api/v1/{index_id}/termdict
        # | /api/v1/{index_id}/doc/{split_id}/{doc_id}
        if len(parts) < 4 or parts[:2] != ["api", "v1"] or parts[3] not in (
            "search",
            "termdict",
            "doc",
        ):
            return self._err(404, f"no route for {url.path}")
        index_id = parts[2]
        # ES-style multi-index addressing: /api/v1/a,b/search fans the
        # request over several indexes and merges pages (plain search
        # only; stream/termdict/agg/collapse/explain stay single-index)
        multi_ids = (
            [i for i in index_id.split(",") if i] if "," in index_id else None
        )
        if multi_ids is not None:
            if len(set(multi_ids)) != len(multi_ids) or len(multi_ids) < 2:
                return self._err(400, f"bad multi-index list {index_id!r}")
            for i in multi_ids:
                if _bad_index_id(i) or not Catalog.exists(
                    os.path.join(self.index_root, i)
                ):
                    return self._err(404, f"index {i!r} not found")
            index_dir = None  # every use below must branch on multi_ids
            if parts[3] != "search" or len(parts) not in (4, 5) or (
                len(parts) == 5 and parts[4] != "stream"
            ):
                return self._err(
                    400,
                    "multi-index addressing supports only /search and "
                    "/search/stream",
                )
        else:
            if _bad_index_id(index_id):
                return self._err(404, f"index {index_id!r} not found")
            index_dir = os.path.join(self.index_root, index_id)
            if not Catalog.exists(index_dir):
                return self._err(404, f"index {index_id!r} not found")
        if parts[3] == "doc":
            # single-document GET by (split_id, doc_id) address (the ES
            # GET /index/_doc analog): one row-group-pruned doc-store read
            if len(parts) != 6:
                return self._err(404, f"no route for {url.path}")
            if url.query:
                return self._err(400, "doc route takes no query parameters")
            try:
                did = int(parts[5])
            except ValueError:
                return self._err(400, f"doc_id must be an integer: {parts[5]!r}")
            from quickwit_spark.search.executor import fetch_doc

            COUNTERS["doc"].inc()
            with self.lock:
                doc = fetch_doc(self.spark, index_dir, parts[4], did)
            if doc is None:
                return self._err(
                    404, f"doc {parts[4]}/{did} not found (split gone or id absent)"
                )
            return self._reply(200, json.dumps(doc, indent=2).encode())
        if parts[3] == "termdict":
            # term-dictionary range scan (FST range-scan analog): terms of
            # an indexed field + global doc_freq, optional prefix window —
            # the autocomplete/introspection backend; driver-side LSM read
            if len(parts) != 4:
                return self._err(404, f"no route for {url.path}")
            qs = parse_qs(url.query)
            unknown = sorted(set(qs) - {"field", "prefix", "limit"})
            if unknown:
                return self._err(
                    400, f"unknown query parameter(s): {', '.join(unknown)}"
                )
            fieldname = qs.get("field", [None])[0]
            if not fieldname:
                return self._err(400, "missing required param 'field'")
            COUNTERS["termdict"].inc()
            try:
                limit = int(qs.get("limit", ["100"])[0])
                from quickwit_spark.search.executor import term_dictionary

                with self.lock:
                    terms = term_dictionary(
                        self.spark,
                        index_dir,
                        fieldname,
                        prefix=qs.get("prefix", [None])[0],
                        limit=limit,
                    )
            except ValueError as e:
                return self._err(400, str(e))
            out = {"field": fieldname, "terms": terms}
            return self._reply(200, json.dumps(out).encode())
        qs = parse_qs(url.query)
        if "query" not in qs:
            return self._err(400, "missing required param 'query'")
        is_stream = len(parts) == 5 and parts[4] == "stream"
        # serde(deny_unknown_fields) parity (rest.rs:124,225): a typo'd
        # param must 400, not silently fall back to its default
        allowed = _STREAM_PARAMS if is_stream else _SEARCH_PARAMS
        unknown = sorted(set(qs) - allowed)
        if unknown:
            return self._err(
                400, f"unknown query parameter(s): {', '.join(unknown)}"
            )
        COUNTERS["stream" if is_stream else "search"].inc()  # rest.rs:50
        try:
            sf, s_asc = _sort_by_mini_dsl(qs.get("sortByField", [None])[0])
            req = SearchRequest(
                query=qs["query"][0],
                # `x if x is not None` not `or`: maxHits=0 is the COUNT
                # request (count collector) and must not fall back to 20
                max_hits=(
                    mh if (mh := _int_or_none(qs, "maxHits")) is not None else 20
                ),
                start_offset=_int_or_none(qs, "startOffset") or 0,
                start_timestamp=_int_or_none(qs, "startTimestamp"),
                end_timestamp=_int_or_none(qs, "endTimestamp"),
                search_fields=(
                    tuple(qs["searchField"][0].split(",")) if "searchField" in qs else None
                ),
                sort_by_field=sf,
                sort_asc=s_asc,
                search_after=_parse_search_after(qs.get("searchAfter", [None])[0]),
                snippet_fields=(
                    tuple(qs["snippetFields"][0].split(","))
                    if "snippetFields" in qs
                    else None
                ),
                snippet_max_chars=_int_or_none(qs, "snippetMaxChars") or 150,
                stored_fields=(
                    tuple(qs["storedFields"][0].split(","))
                    if "storedFields" in qs
                    else None
                ),
                numeric_filters=_parse_numeric_filters(qs.get("numericFilter")),
                score_explain=qs.get("scoreExplain", ["false"])[0].lower()
                in ("true", "1"),
                min_should_match=_int_or_none(qs, "minShouldMatch") or 1,
            )
            if is_stream:
                fast_field = qs.get("fastField", [None])[0]
                if fast_field is None:
                    return self._err(400, "missing required param 'fastField'")
                if not fast_field:
                    # rest.rs deserialize_not_empty_string: empty is a 400,
                    # not a field named ""
                    return self._err(400, "fastField must not be empty")
                if req.search_after is not None:
                    # the stream leaf exports EVERY matching doc (no top-k
                    # order), so a cursor has no meaning — reject rather
                    # than silently re-export everything
                    return self._err(
                        400, "searchAfter is not supported on /search/stream"
                    )
                fmt = qs.get("outputFormat", ["csv"])[0]
                if fmt not in ("csv", "clickHouseRowBinary"):
                    return self._err(400, f"unsupported outputFormat {fmt!r}")
                partition_by = qs.get("partitionByField", [None])[0]
                if partition_by is not None:
                    # leaf.rs:140-145: partitioned export requires the
                    # RowBinary format; CSV + partitionBy is a 400
                    if fmt != "clickHouseRowBinary":
                        return self._err(
                            400,
                            "partitionByField requires "
                            "outputFormat=clickHouseRowBinary",
                        )
                    import struct
                    from itertools import islice

                    from quickwit_spark.search.executor import (
                        export_stream,
                        multi_index_export_stream,
                    )

                    with self.lock:
                        if multi_ids is not None:
                            # partition keys merge across indexes (exact
                            # union-reduce — multi_index_agg contract)
                            df = multi_index_export_stream(
                                self.spark,
                                [os.path.join(self.index_root, i) for i in multi_ids],
                                req, fast_field,
                                output_format="rowbinary",
                                partition_by=partition_by,
                            )
                        else:
                            df = export_stream(
                                self.spark, index_dir, req, fast_field,
                                output_format="rowbinary",
                                partition_by=partition_by,
                            )
                        # reference contract (leaf.rs:346-357): the
                        # partition field must be numeric — reject BEFORE
                        # the chunked reply starts (a mid-stream error
                        # would only truncate the body)
                        ptype = df.schema[0].dataType.simpleString()
                        if ptype not in ("bigint", "int", "smallint", "tinyint", "long"):
                            return self._err(
                                400,
                                f"partitionByField {partition_by!r} must be "
                                f"an integer column (got {ptype})",
                            )
                        rows_it = df.toLocalIterator(prefetchPartitions=True)

                    # reference wire format (search_stream/mod.rs:50-69):
                    # per partition, partition value (8B LE) + payload
                    # byte size (8B LE) + the i64 values
                    def part_chunks():
                        while True:
                            with self.lock:
                                rows = list(islice(rows_it, 64))
                            if not rows:
                                return
                            out = []
                            for r in rows:
                                payload = r["payload"]
                                out.append(
                                    struct.pack(
                                        "<qQ", int(r[partition_by]), len(payload)
                                    )
                                    + payload
                                )
                            yield b"".join(out)

                    return self._reply_chunked(
                        part_chunks(), "application/octet-stream"
                    )
                # toLocalIterator: partitions stream to the driver one at a
                # time — memory stays bounded no matter how many docs match
                # (collect() of a hot query's export could be index-sized).
                # The driver lock is held only around Spark access (the plan
                # build and each iterator pull), NEVER across the client
                # socket write — a slow or stalled client must not block
                # every other query on the server for the whole transfer.
                from itertools import islice

                import numpy as np

                with self.lock:
                    if multi_ids is not None:
                        from quickwit_spark.search.executor import (
                            multi_index_export_stream,
                        )

                        # union of the per-index streams; the wire format
                        # stays one value per line/8 bytes (reference
                        # parity) — index identity is a DataFrame-API
                        # concern, not a wire one
                        stream_df = multi_index_export_stream(
                            self.spark,
                            [os.path.join(self.index_root, i) for i in multi_ids],
                            req, fast_field, output_format="csv",
                        )
                    else:
                        stream_df = search_stream(
                            self.spark, index_dir, req, fast_field
                        )
                    it = stream_df.toLocalIterator(prefetchPartitions=True)

                def batches(size=8192):
                    while True:
                        with self.lock:
                            rows = list(islice(it, size))
                        if not rows:
                            return
                        yield rows

                if fmt == "csv":
                    def csv_chunks():
                        for rows in batches():
                            yield ("\n".join(str(r[fast_field]) for r in rows) + "\n").encode()

                    return self._reply_chunked(csv_chunks(), "text/csv")

                # ClickHouse RowBinary: little-endian i64 per value
                # (docs/reference/rest-api.md:70-114, search_stream/leaf.rs)
                def bin_chunks():
                    for rows in batches():
                        yield np.asarray([r[fast_field] for r in rows], dtype="<i8").tobytes()

                return self._reply_chunked(bin_chunks(), "application/octet-stream")
            # field collapse (beyond-reference, ES `collapse`): one hit per
            # distinct field value; its own response shape, so it composes
            if multi_ids is not None:
                # multi-index: search + aggregations (exact union-reduce
                # merge, executor.multi_index_agg).  Still single-index
                # only: collapse/explain (per-index plans), significant
                # terms (per-index background stats), filters.
                single_only = [
                    p
                    for p in (
                        "explain",
                        "aggSignificantField", "aggFilters",
                    )
                    if qs.get(p, [None])[0] is not None
                ]
                if single_only:
                    return self._err(
                        400,
                        "multi-index search does not support: "
                        + ", ".join(single_only),
                    )
                from quickwit_spark.search.executor import (
                    multi_index_agg,
                    multi_index_collapse_rows,
                    multi_index_search,
                )

                dirs_mi = [os.path.join(self.index_root, i) for i in multi_ids]
                collapse_field = qs.get("collapseField", [None])[0]
                if collapse_field is not None:
                    # same conflict contract as the single-index collapse
                    # branch below
                    if req.snippet_fields is not None:
                        return self._err(
                            400, "collapseField cannot combine with snippetFields"
                        )
                    if any(
                        qs.get(p, [None])[0] is not None
                        for p in (
                            "aggHistogramInterval", "aggHistogramCalendar",
                            "aggTermsField", "aggTermsMetricField",
                            "aggStatsField", "aggStatsExtended",
                            "aggPercentilesField",
                            "aggCardinalityField",
                        )
                    ):
                        return self._err(
                            400, "collapseField cannot combine with agg* params"
                        )
                    with self.lock:
                        rows, n_groups, n_docs = multi_index_collapse_rows(
                            self.spark,
                            dirs_mi,
                            req,
                            collapse_field,
                            qs.get("collapseTieField", [None])[0],
                        )
                    out = {
                        "numHits": n_docs,
                        "collapse": {"field": collapse_field, "numGroups": n_groups},
                        "hits": rows,
                    }
                    fmt = qs.get("format", ["prettyjson"])[0]
                    if fmt not in ("json", "prettyjson"):
                        return self._err(400, f"unsupported format {fmt!r}")
                    body = json.dumps(out, indent=2 if fmt == "prettyjson" else None)
                    return self._reply(200, body.encode())

                agg_interval = _int_or_none(qs, "aggHistogramInterval")
                agg_calendar = qs.get("aggHistogramCalendar", [None])[0]
                agg_terms = qs.get("aggTermsField", [None])[0]
                agg_terms_metric = qs.get("aggTermsMetricField", [None])[0]
                agg_stats = qs.get("aggStatsField", [None])[0]
                agg_stats_ext = qs.get("aggStatsExtended", ["false"])[0] in ("true", "1")
                if agg_stats_ext and agg_stats is None:
                    return self._err(400, "aggStatsExtended requires aggStatsField")
                agg_pcts = qs.get("aggPercentilesField", [None])[0]
                agg_card = qs.get("aggCardinalityField", [None])[0]
                dirs = dirs_mi
                aggs = {}
                with self.lock:
                    resp = multi_index_search(self.spark, dirs, req)
                    if any(
                        a is not None
                        for a in (
                            agg_interval, agg_calendar, agg_terms,
                            agg_terms_metric, agg_stats, agg_pcts, agg_card,
                        )
                    ):
                        size = _int_or_none(qs, "aggTermsSize") or 10
                        multi = multi_index_agg(
                            self.spark,
                            dirs,
                            req,
                            histogram_interval=agg_interval,
                            histogram_calendar=agg_calendar,
                            terms_field=agg_terms,
                            terms_size=size,
                            terms_metric_field=agg_terms_metric,
                            stats_field=agg_stats,
                            stats_extended=agg_stats_ext,
                            percentiles_field=agg_pcts,
                            cardinality_field=agg_card,
                        )
                        aggs = _format_aggs(
                            multi, agg_interval, agg_terms, agg_terms_metric,
                            agg_stats, agg_pcts, agg_card, None,
                        )
                out = {
                    "numHits": resp.num_hits,
                    "hits": resp.hits,
                    "elapsedTimeMicros": resp.elapsed_time_micros,
                }
                if aggs:
                    out["aggregations"] = aggs
                fmt = qs.get("format", ["prettyjson"])[0]
                if fmt not in ("json", "prettyjson"):
                    return self._err(400, f"unsupported format {fmt!r}")
                body = json.dumps(out, indent=2 if fmt == "prettyjson" else None)
                return self._reply(200, body.encode())
            # with neither snippets nor aggregations
            collapse_field = qs.get("collapseField", [None])[0]
            if collapse_field is not None:
                if req.snippet_fields is not None:
                    return self._err(
                        400, "collapseField cannot combine with snippetFields"
                    )
                if any(
                    qs.get(p, [None])[0] is not None
                    for p in (
                        "aggHistogramInterval", "aggHistogramCalendar",
                        "aggTermsField",
                        "aggTermsMetricField", "aggStatsField",
                        "aggStatsExtended",
                        "aggPercentilesField", "aggCardinalityField",
                        "aggSignificantField", "aggFilters",
                    )
                ):
                    return self._err(
                        400, "collapseField cannot combine with agg* params"
                    )
                from quickwit_spark.search.executor import search_collapse_rows

                with self.lock:
                    rows, n_groups, n_docs = search_collapse_rows(
                        self.spark,
                        index_dir,
                        req,
                        collapse_field,
                        qs.get("collapseTieField", [None])[0],
                    )
                out = {
                    "numHits": n_docs,
                    "collapse": {"field": collapse_field, "numGroups": n_groups},
                    "hits": rows,
                }
                fmt = qs.get("format", ["prettyjson"])[0]
                if fmt not in ("json", "prettyjson"):
                    return self._err(400, f"unsupported format {fmt!r}")
                body = json.dumps(out, indent=2 if fmt == "prettyjson" else None)
                return self._reply(200, body.encode())
            # search-side aggregations (beyond-reference; agg-only clients
            # pass maxHits=0, which takes the count-only fast path)
            agg_interval = _int_or_none(qs, "aggHistogramInterval")
            agg_calendar = qs.get("aggHistogramCalendar", [None])[0]
            agg_terms = qs.get("aggTermsField", [None])[0]
            agg_terms_metric = qs.get("aggTermsMetricField", [None])[0]
            agg_stats = qs.get("aggStatsField", [None])[0]
            agg_stats_ext = qs.get("aggStatsExtended", ["false"])[0] in ("true", "1")
            if agg_stats_ext and agg_stats is None:
                return self._err(400, "aggStatsExtended requires aggStatsField")
            agg_pcts = qs.get("aggPercentilesField", [None])[0]
            agg_card = qs.get("aggCardinalityField", [None])[0]
            agg_sig = qs.get("aggSignificantField", [None])[0]
            aggs = {}
            want_explain = qs.get("explain", ["false"])[0] in ("true", "1")
            plan = None
            with self.lock:
                if want_explain:
                    from quickwit_spark.search.executor import explain

                    plan = explain(self.spark, index_dir, req)
                resp = search(self.spark, index_dir, req)
                if any(
                    a is not None
                    for a in (
                        agg_interval, agg_calendar, agg_terms, agg_terms_metric,
                        agg_stats, agg_pcts, agg_card, agg_sig,
                    )
                ):
                    # ALL requested aggregations share one stream leaf:
                    # the match set is evaluated once, not once per agg
                    from quickwit_spark.search.executor import search_agg_multi

                    size = _int_or_none(qs, "aggTermsSize") or 10  # ES default
                    multi = search_agg_multi(
                        self.spark,
                        index_dir,
                        req,
                        histogram_interval=agg_interval,
                        histogram_calendar=agg_calendar,
                        terms_field=agg_terms,
                        terms_size=size,
                        terms_metric_field=agg_terms_metric,
                        stats_field=agg_stats,
                        stats_extended=agg_stats_ext,
                        percentiles_field=agg_pcts,
                        cardinality_field=agg_card,
                        significant_field=agg_sig,
                        significant_size=(
                            _int_or_none(qs, "aggSignificantSize") or 10
                        ),
                    )
                    aggs.update(
                        _format_aggs(
                            multi, agg_interval, agg_terms, agg_terms_metric,
                            agg_stats, agg_pcts, agg_card, agg_sig,
                        )
                    )
                agg_filters = qs.get("aggFilters", [None])[0]
                if agg_filters is not None:
                    from quickwit_spark.search.executor import search_agg_filters

                    try:
                        flt = json.loads(agg_filters)
                    except json.JSONDecodeError as e:
                        raise ValueError(f"aggFilters is not valid JSON: {e}")
                    if not isinstance(flt, dict):
                        raise ValueError("aggFilters must be a JSON object")
                    rows = search_agg_filters(
                        self.spark, index_dir, req, flt
                    ).collect()
                    aggs["filters"] = {
                        "buckets": [
                            {"key": r["key"], "docCount": int(r["doc_count"])}
                            for r in rows
                        ]
                    }
        except ValueError as e:  # parser rejection (bad query / field)
            return self._err(400, str(e))
        out = {
            "numHits": resp.num_hits,
            "hits": resp.hits,
            "elapsedTimeMicros": resp.elapsed_time_micros,
        }
        if aggs:
            out["aggregations"] = aggs
        if plan is not None:
            out["explain"] = plan
        # format=json|prettyjson (reference rest-api.md: default prettyjson)
        fmt = qs.get("format", ["prettyjson"])[0]
        if fmt not in ("json", "prettyjson"):
            return self._err(400, f"unsupported format {fmt!r}")
        body = json.dumps(out, indent=2 if fmt == "prettyjson" else None)
        return self._reply(200, body.encode())


def _format_aggs(
    multi: dict, agg_interval, agg_terms, agg_terms_metric,
    agg_stats, agg_pcts, agg_card, agg_sig,
) -> dict:
    """Engine agg result dict → REST response shape (shared by the
    single-index and multi-index search endpoints)."""
    aggs: dict = {}
    if "histogram" in multi:
        aggs["histogram"] = {
            "interval": agg_interval,
            "buckets": [
                {"key": b, "docCount": n} for b, n in multi["histogram"]
            ],
        }
    if "terms" in multi:
        aggs["terms"] = {
            "field": agg_terms,
            "buckets": [
                {"key": v, "docCount": n} for v, n in multi["terms"]
            ],
        }
    if "terms_stats" in multi:
        aggs["termsStats"] = {
            "field": agg_terms,
            "metricField": agg_terms_metric,
            "buckets": multi["terms_stats"],
        }
    if "stats" in multi:
        aggs["stats"] = {"field": agg_stats, **multi["stats"]}
    if "percentiles" in multi:
        aggs["percentiles"] = {"field": agg_pcts, **multi["percentiles"]}
    if "cardinality" in multi:
        aggs["cardinality"] = {"field": agg_card, **multi["cardinality"]}
    if "significant_terms" in multi:
        aggs["significantTerms"] = {
            "field": agg_sig,
            "buckets": multi["significant_terms"],
        }
    return aggs


def make_server(spark, index_root: str, port: int = 0) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; port 0 = ephemeral."""
    handler = type(
        "BoundHandler",
        (_Handler,),
        {"spark": spark, "index_root": index_root, "lock": threading.Lock()},
    )
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


def main():
    import argparse

    from quickwit_spark.cli import _get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--index-root", required=True)
    ap.add_argument("--port", type=int, default=7280)  # the reference's default REST port
    ap.add_argument("--local-cpus", default=None)
    args = ap.parse_args()
    spark = _get_spark("qw-serve", args.local_cpus, None)
    spark.sparkContext.setLogLevel("ERROR")
    srv = make_server(spark, args.index_root, args.port)
    print(json.dumps({"serving": True, "port": srv.server_address[1]}), flush=True)
    srv.serve_forever()


if __name__ == "__main__":
    main()
