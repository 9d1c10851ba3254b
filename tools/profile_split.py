"""Micro-profile the per-split leaf work for one query."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import get_spark  # noqa: E402


def main():
    from quickwit_spark.search import executor as ex
    from quickwit_spark.search.request import SearchRequest

    spark = get_spark("4")
    spark.sparkContext.setLogLevel("ERROR")
    idx = "/tmp/qwspark_bench/idx-profile"
    req = SearchRequest(query="deploy")
    cat, config, ast, splits, terms, buckets, scorer, gstats = ex._plan_leaf(spark, idx, req, "topk")
    sids = [s.split_id for s in splits][:10]

    def t(label, fn, n=3):
        fn()
        best = min(_time(fn) for _ in range(n))
        print(f"{label:34s} {best*1e3:7.2f}ms")

    def _time(fn):
        t0 = time.monotonic()
        fn()
        return time.monotonic() - t0

    sid = sids[0]
    t("cached_fastfields (warm)", lambda: ex._cached_fastfields(idx, sid))
    t("read_split_postings", lambda: ex._read_split_postings(idx, sid, terms, buckets))
    ff = ex._cached_fastfields(idx, sid)
    post = ex._read_split_postings(idx, sid, terms, buckets)
    t("scorer full (incl fetch)", lambda: scorer((sid,), post, ff))
    scorer_nofetch = ex.make_split_scorer(config, None if False else ex.global_term_stats(spark, idx, cat, set(terms), buckets), ast, req, "topk", None)
    t("scorer no-fetch", lambda: scorer_nofetch((sid,), post, ff))
    import numpy as np
    out = scorer_nofetch((sid,), post, ff)
    doc_ids = out["doc_id"].to_numpy()
    t("fetch_doc_fields", lambda: ex._fetch_doc_fields(idx, sid, doc_ids))


if __name__ == "__main__":
    main()
