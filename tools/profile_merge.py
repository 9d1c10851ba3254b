"""Profile the merge round's three stages at sf0.1 (set QW_MERGE_TIMING=1)."""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["QW_MERGE_TIMING"] = "1"


def main() -> None:
    from bench import get_spark

    spark = get_spark(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from quickwit_spark.config import transcripts_config
    from quickwit_spark.index.builder import build_index
    from quickwit_spark.index.merge import run_merge_pipeline

    from bench import ensure_corpus

    df = spark.read.parquet(ensure_corpus(50_000))
    d = "/tmp/qwspark_bench/idx-merge-profile"
    shutil.rmtree(d, ignore_errors=True)
    cfg = transcripts_config(
        split_num_docs_target=20_000, segment_num_docs_target=8_000
    )
    t0 = time.monotonic()
    build_index(spark, df, cfg, d, build_id="mp")
    print(f"build: {time.monotonic() - t0:.2f}s", flush=True)
    t0 = time.monotonic()
    run_merge_pipeline(spark, d)
    print(f"merge total: {time.monotonic() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
