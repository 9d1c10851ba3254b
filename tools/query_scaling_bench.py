"""Query-side scaling evidence (supplementary to the build-throughput
evidence in BENCH_SCALING.json): batched query throughput on the SAME
index at N vs 4N taskset-pinned cores, each run via ``spark-submit
--py-files quickwit_spark.zip`` in its own JVM.

The index is built once (unpinned); the two pinned runs only query it, so
this isolates leaf-search scaling.  Query work per batch is fixed, the
driver's plan/merge cost is serial (Amdahl floor), so efficiency here is
expected to trail the build's — record the number, don't tune to it.

Usage: python tools/query_scaling_bench.py [--n 2] [--convs 50000] [--batches 5]
Writes BENCH_QUERY_SCALING.json and a QUERY-SCALING section in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))
from scaling_bench import make_pyfiles_zip  # noqa: E402

MARK_BEGIN = "<!-- QUERY-SCALING-BEGIN -->"
MARK_END = "<!-- QUERY-SCALING-END -->"


def _spark_submit():
    return shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )


def run_cli(cpus: int, zip_path: str, pinned: bool, cli_args: list[str]) -> dict:
    pin = ["taskset", "-c", f"0-{cpus - 1}"] if pinned and shutil.which("taskset") else []
    cmd = [
        *pin,
        _spark_submit(),
        "--master", f"local[{cpus}]",
        "--driver-memory", os.environ.get("QW_SCALE_DRIVER_MEM", "48g"),
        "--conf", "spark.ui.enabled=false",
        "--py-files", zip_path,
        os.path.join(REPO, "quickwit_spark", "cli.py"),
        "--shuffle-partitions", str(max(cpus * 2, 8)),
        *cli_args,
    ]
    env = dict(os.environ)
    env.pop("PYSPARK_DRIVER_PYTHON", None)
    env["PYSPARK_PYTHON"] = sys.executable
    out = subprocess.run(cmd, capture_output=True, text=True, env=env, cwd="/tmp")
    if out.returncode != 0:
        sys.stderr.write(out.stdout[-3000:] + "\n" + out.stderr[-3000:] + "\n")
        raise SystemExit(f"{cli_args[0]} at local[{cpus}] failed")
    return json.loads([l for l in out.stdout.splitlines() if l.startswith("{")][-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--convs", type=int, default=50_000)
    ap.add_argument("--batches", type=int, default=3)
    ap.add_argument("--concurrency", type=int, default=4, help="client threads per JVM (searcher-under-load shape)")
    ap.add_argument("--repeats", type=int, default=2, help="best-of per level (host noise)")
    args = ap.parse_args()

    os.makedirs("/tmp/qwspark_scale", exist_ok=True)
    zip_path = make_pyfiles_zip("/tmp/qwspark_scale/quickwit_spark.zip")
    corpus = f"/tmp/qwspark_bench/transcripts_{args.convs}.parquet"
    if not os.path.exists(corpus):
        sys.path.insert(0, REPO)
        from quickwit_spark.fixtures.transcripts import write_transcripts_parquet

        os.makedirs(os.path.dirname(corpus), exist_ok=True)
        write_transcripts_parquet(corpus, n_conversations=args.convs, seed=42)

    index_dir = f"/tmp/qwspark_scale/qidx-{args.convs}"
    if not os.path.exists(os.path.join(index_dir, "catalog.json")):
        run_cli(  # build once, unpinned full box — the index is shared
            os.cpu_count() or 8, zip_path, False,
            ["bench-build", "--input", corpus, "--index-dir", index_dir,
             "--n-conversations", str(args.convs), "--split-docs", "20000", "--runs", "1"],
        )

    results = {}
    for cpus in (args.n, args.n * 4):
        best = None
        for _ in range(args.repeats):
            r = run_cli(cpus, zip_path, True,
                        ["bench-queries", "--index-dir", index_dir,
                         "--batches", str(args.batches),
                         "--concurrency", str(args.concurrency)])
            if best is None or r["queries_per_sec"] > best["queries_per_sec"]:
                best = r
        results[cpus] = best
        print(f"local[{cpus}]: {best['queries']} queries in {best['secs']}s "
              f"= {best['queries_per_sec']} q/s", file=sys.stderr)

    lo, hi = results[args.n], results[args.n * 4]
    eff = (hi["queries_per_sec"] / lo["queries_per_sec"]) / 4.0
    summary = {
        "metric": "batched query throughput scaling (N vs 4N cores, same index)",
        "n_cores": args.n,
        "n4_cores": args.n * 4,
        "queries_per_sec_n": lo["queries_per_sec"],
        "queries_per_sec_4n": hi["queries_per_sec"],
        "scaling_efficiency": round(eff, 3),
        "launcher": "spark-submit --py-files quickwit_spark.zip",
    }
    with open(os.path.join(REPO, "BENCH_QUERY_SCALING.json"), "w") as f:
        json.dump(summary, f, indent=2)

    section = f"""## Query-throughput scaling (measured, this sandbox; supplementary)

Searcher-under-load throughput: {args.concurrency} client threads each
submitting {args.batches} batches of the 8-query canonical set through
`multi_search` against the SAME prebuilt index ({args.convs:,}
conversations), taskset-pinned N vs 4N cores, separate JVMs via
spark-submit.  Concurrent clients overlap one query's serial driver work
(plan + merge + page fetch) with another's executor work — the shape a
real searcher sees; a single query's LATENCY does not scale with cores
(its leaf work is already subsecond), throughput under load does:

| cores | queries/sec |
|---|---|
| local[{args.n}] (N) | {lo['queries_per_sec']} |
| local[{args.n * 4}] (4N) | {hi['queries_per_sec']} |

**Query-throughput scaling N→4N = {round(eff, 3)}** (build-side evidence,
the north-rule criterion, is in `BENCH_SCALING.json`).
Raw numbers in `BENCH_QUERY_SCALING.json`; reproduce with
`python tools/query_scaling_bench.py`."""
    update_baseline_md_q(section)
    print(json.dumps(summary))


def update_baseline_md_q(section: str) -> None:
    path = os.path.join(REPO, "BASELINE.md")
    text = open(path).read()
    block = f"{MARK_BEGIN}\n{section}\n{MARK_END}"
    if MARK_BEGIN in text:
        pre = text.split(MARK_BEGIN)[0]
        post = text.split(MARK_END)[1] if MARK_END in text else "\n"
        text = pre + block + post
    else:
        text = text.rstrip() + "\n\n" + block + "\n"
    open(path, "w").write(text)


if __name__ == "__main__":
    main()
