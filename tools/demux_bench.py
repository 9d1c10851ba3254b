"""Demux at soak scale (the round-4 judge's ask #8).

`execute_demux` re-clusters splits by a tenant-like field so tag pruning
turns tenant-scoped queries into O(matching splits) work — the
StableMultitenant story (reference merge_executor.rs:337-487).  It is
correctness-proven by Hypothesis bin-packing invariants and the
clustering tests; this tool adds the missing SOAK-SCALE row: demux
throughput on a ~10.2M-turn index plus the tenant-scoped query latency
and split-pruning delta it buys.

The transcript fixture's `tool` column is turn-level (mostly empty on a
conversation's first turn), so the bench derives a conversation-constant
tenant id (`tenant-<crc32(conv_id) % 20>`) into that column before
indexing — exactly the multitenant shape demux exists for — and tags it
(`tag_fields=("role","tool")`) so the root can prune on it.

Usage: python tools/demux_bench.py [--conversations 500000] [--repeats 7]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/tmp/qwspark_bench"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conversations", type=int, default=500_000)
    ap.add_argument("--repeats", type=int, default=7)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--tenants", type=int, default=20)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from bench import get_spark, probe_page_fault_gbps
    from quickwit_spark.config import transcripts_config
    from quickwit_spark.index.builder import build_index
    from quickwit_spark.index.catalog import PUBLISHED, Catalog
    from quickwit_spark.index.merge import execute_demux, garbage_collect
    from quickwit_spark.search.executor import explain, search
    from quickwit_spark.search.request import SearchRequest

    corpus = os.path.join(SCRATCH, f"transcripts_{args.conversations}_dir")
    if not os.path.isdir(corpus):
        from quickwit_spark.fixtures.transcripts import write_transcripts_parquet

        write_transcripts_parquet(
            corpus, n_conversations=args.conversations, seed=42, n_files=64
        )

    spark = get_spark(str(args.cpus))
    spark.sparkContext.setLogLevel("ERROR")
    idx = os.path.join(SCRATCH, "idx-demux-bench")
    shutil.rmtree(idx, ignore_errors=True)

    # conversation-constant tenant in the `tool` column, tagged for pruning
    df = spark.read.parquet(corpus).withColumn(
        "tool",
        F.concat(
            F.lit("tenant-"),
            (F.crc32(F.col("conv_id")) % args.tenants).cast("string"),
        ),
    )
    cfg = transcripts_config(
        split_num_docs_target=200_000,
        segment_num_docs_target=50_000,
        tag_fields=("role", "tool"),
    )
    t0 = time.monotonic()
    build_index(spark, df, cfg, idx, build_id="dmx")
    build_secs = round(time.monotonic() - t0, 1)
    cat = Catalog(idx)
    splits = cat.splits([PUBLISHED])
    n_docs = sum(s.num_docs for s in splits)
    print(f"built {n_docs} docs / {len(splits)} splits in {build_secs}s", flush=True)

    tenant_q = SearchRequest("tool:tenant-7 AND deploy")

    def measure(tag: str) -> dict:
        search(spark, idx, tenant_q)  # warm
        times, probes = [], []
        for _ in range(args.repeats):
            probes.append(probe_page_fault_gbps(16))
            t0 = time.monotonic()
            resp = search(spark, idx, tenant_q)
            times.append(round(time.monotonic() - t0, 3))
        rep = explain(spark, idx, tenant_q)
        return {
            "hits": resp.num_hits,
            "p50": sorted(times)[len(times) // 2],
            "min": min(times),
            "times": times,
            "probes": probes,
            "splits_total": rep["splits_total"],
            "splits_after_pruning": rep["splits_after_pruning"],
        }

    before = measure("pre")
    print("pre-demux:", before, flush=True)

    old_ids = [s.split_id for s in splits]
    t0 = time.monotonic()
    execute_demux(spark, idx, old_ids, "tool", num_outputs=len(old_ids))
    demux_secs = round(time.monotonic() - t0, 1)
    garbage_collect(idx, deletion_grace_secs=0.0)
    print(f"demux {n_docs} docs in {demux_secs}s = {n_docs/demux_secs:,.0f} docs/s",
          flush=True)

    after = measure("post")
    print("post-demux:", after, flush=True)

    out = {
        "metric": "demux at soak scale: throughput + tenant-scoped query delta",
        "docs": n_docs,
        "build_secs": build_secs,
        "n_splits": len(splits),
        "tenants": args.tenants,
        "demux_secs": demux_secs,
        "demux_docs_per_sec": round(n_docs / demux_secs, 0),
        "tenant_query": tenant_q.query,
        "pre": before,
        "post": after,
        "speedup_p50": round(before["p50"] / after["p50"], 2),
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
