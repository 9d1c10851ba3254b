"""Time a driver-local thread-pooled leaf search over all splits."""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import BENCH_QUERIES, get_spark  # noqa: E402


def main():
    from quickwit_spark.search import executor as ex
    from quickwit_spark.search.request import SearchRequest

    spark = get_spark("4")
    spark.sparkContext.setLogLevel("ERROR")
    idx = "/tmp/qwspark_bench/idx-profile"

    for name, kw in BENCH_QUERIES.items():
        req = SearchRequest(**kw)
        cat, config, ast, splits, terms, buckets, scorer, gstats = ex._plan_leaf(spark, idx, req, "topk")
        sids = [s.split_id for s in splits]

        def one(sid):
            ff = ex._cached_fastfields(idx, sid)
            if ff is None:
                return None
            post = ex._read_split_postings(idx, sid, terms, buckets)
            return scorer((sid,), post, ff)

        for nthreads in (8, 16, 32):
            pool = ThreadPoolExecutor(nthreads)
            list(pool.map(one, sids))  # warm
            best = None
            for _ in range(3):
                t0 = time.monotonic()
                list(pool.map(one, sids))
                el = time.monotonic() - t0
                best = el if best is None or el < best else best
            print(f"{name:16s} threads={nthreads:2d}  {best*1e3:7.1f}ms")
            pool.shutdown()


if __name__ == "__main__":
    main()
