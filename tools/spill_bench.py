"""Spill-path evidence at a realistic split size.

The reference cuts splits at 10M docs (index_config.rs:161-163); a fresh
build of such a split cannot assume the encoded postings fit in task
memory.  `builder_spill_mb` bounds the per-task resident postings: past the
threshold the accumulator flushes a sorted run to executor-local scratch
and the finalize stage streams a k-way merge of the runs into the final
postings writer (index/builder.py `_spill_acc` / `_write_postings_spilled`).

This bench builds ONE ~1M-doc split twice — resident (spill disabled) and
with a deliberately tiny threshold (default 48 MiB, forcing dozens of
runs) — and reports both throughputs plus the spill run count, evidencing
that the spill path holds the throughput needed for 10M-doc production
splits with per-task memory bounded by the knob rather than split size.

Usage: python tools/spill_bench.py [--conversations 50000] [--spill-mb 48]
Prints one JSON line at the end.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCRATCH = "/tmp/qwspark_bench"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conversations", type=int, default=50_000)
    ap.add_argument("--spill-mb", type=int, default=48)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    from quickwit_spark.fixtures.transcripts import write_transcripts_parquet

    os.makedirs(SCRATCH, exist_ok=True)
    corpus = os.path.join(SCRATCH, f"transcripts_{args.conversations}_dir")
    if not os.path.isdir(corpus):
        t0 = time.monotonic()
        n = write_transcripts_parquet(
            corpus, n_conversations=args.conversations, seed=42, n_files=8
        )
        print(f"generated {n} turns in {time.monotonic() - t0:.1f} s", flush=True)

    from bench import get_spark, probe_page_fault_gbps

    spark = get_spark(str(args.cpus))

    from quickwit_spark.config import transcripts_config
    from quickwit_spark.index.builder import build_index

    df = spark.read.parquet(corpus)
    n_turns = df.count()

    out = {"turns": n_turns, "fault_gbps": probe_page_fault_gbps()}
    for label, spill_mb in (("resident", 1 << 20), ("spilled", args.spill_mb)):
        cfg = transcripts_config(
            # one split: the whole corpus funnels through a single task, the
            # worst case the spill knob exists for
            split_num_docs_target=max(n_turns * 2, 1),
            segment_num_docs_target=200_000,
            builder_spill_mb=spill_mb,
        )
        d = os.path.join(SCRATCH, f"idx-spill-{label}")
        shutil.rmtree(d, ignore_errors=True)
        t0 = time.monotonic()
        build_index(spark, df, cfg, d, build_id=f"spill-{label}")
        secs = time.monotonic() - t0
        out[label] = {
            "secs": round(secs, 2),
            "turns_per_sec": round(n_turns / secs, 1),
            "splits": len(glob.glob(os.path.join(d, "docs", "split_id=*"))),
        }
        print(f"{label}: {secs:.1f}s = {n_turns / secs:,.0f} turns/s", flush=True)
    out["spill_mb"] = args.spill_mb
    out["throughput_ratio_spilled_vs_resident"] = round(
        out["spilled"]["turns_per_sec"] / out["resident"]["turns_per_sec"], 3
    )
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
