"""Measure the fixed overhead of tiny Spark jobs under different mechanisms."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import get_spark  # noqa: E402


def t(label, fn, n=5):
    fn()  # warm
    times = []
    for _ in range(n):
        t0 = time.monotonic()
        fn()
        times.append(time.monotonic() - t0)
    print(f"{label:44s} best={min(times)*1e3:7.1f}ms  med={sorted(times)[n//2]*1e3:7.1f}ms")


def main():
    import pandas as pd

    spark = get_spark("32")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    sids = [f"split-{i:04d}" for i in range(52)]

    def passthrough(batches):
        for b in batches:
            yield b

    def work_ms(ms):
        def f(it):
            import time as _t
            rows = list(it)
            _t.sleep(ms / 1e3 * len(rows))
            return [(r, 1.0) for r in rows]
        return f

    t("createDataFrame(52) only", lambda: spark.createDataFrame([(s,) for s in sids], "split_id string"))
    df = spark.createDataFrame([(s,) for s in sids], "split_id string")
    t("reused df.mapInPandas(pass).collect()", lambda: df.mapInPandas(passthrough, "split_id string").collect())
    t("fresh df + mapInPandas(pass).collect()",
      lambda: spark.createDataFrame([(s,) for s in sids], "split_id string").mapInPandas(passthrough, "split_id string").collect())
    for n in (8, 16, 32, 52):
        t(f"rdd.parallelize({n} slices).mapPartitions(id)",
          lambda n=n: sc.parallelize(sids, n).mapPartitions(lambda it: it).collect())
    # simulate 50ms/split work at various slice counts
    for n in (8, 16, 32, 52):
        t(f"rdd {n} slices, 50ms per split",
          lambda n=n: sc.parallelize(sids, n).mapPartitions(work_ms(50)).collect())
    def pandas_work(batches):
        import time as _t
        for b in batches:
            _t.sleep(0.05 * len(b))
            yield pd.DataFrame({"split_id": b["split_id"]})

    for n in (16, 32, 52):
        t(f"mapInPandas {n} parts, 50ms per split",
          lambda n=n: spark.createDataFrame([(s,) for s in sids], "split_id string")
          .repartition(n).mapInPandas(pandas_work, "split_id string").collect())


if __name__ == "__main__":
    main()
