"""Generate the frozen backward-compat index fixture.

Run ONCE at round-2 layout (pre-versioning, pre-hotcache) and committed;
the backward-compat suite (tests/test_backward_compat.py) only READS the
result.  Mirrors quickwit-metastore/src/backward_compatibility_tests/,
which pins serialized metadata files from old releases and asserts the
current engine still opens them.
"""
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from quickwit_spark.config import transcripts_config
from quickwit_spark.fixtures.transcripts import generate_transcripts
from quickwit_spark.index.builder import build_index
from quickwit_spark.search.executor import search
from quickwit_spark.search.request import SearchRequest

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "golden", "compat_r2_index")

spark = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.session.timeZone", "UTC")
         .config("spark.sql.shuffle.partitions", "4").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

shutil.rmtree(OUT, ignore_errors=True)
cfg = transcripts_config(split_num_docs_target=300, segment_num_docs_target=128)
pdf = generate_transcripts(n_conversations=12, seed=21)
build_index(spark, spark.createDataFrame(pdf), cfg, OUT, build_id="r2fix")
# round-2 splits had no hotcache sidecar
shutil.rmtree(os.path.join(OUT, "hotcache"), ignore_errors=True)
# prune Spark/committer noise
for root, dirs, files in os.walk(OUT):
    for f in files:
        if f.endswith(".crc") or f in ("_SUCCESS",):
            os.remove(os.path.join(root, f))

# freeze expected results next to it
expected = {}
for name, q in {
    "single": SearchRequest("deploy"),
    "phrase": SearchRequest('"the deploy"'),
    "bool": SearchRequest("error OR timeout", max_hits=15),
    "sort": SearchRequest("deploy", sort_by_field="ts"),
}.items():
    resp = search(spark, OUT, q)
    expected[name] = {
        "query": q.query,
        "num_hits": resp.num_hits,
        "hits": [
            {"conv_id": h["conv_id"], "turn_idx": h["turn_idx"],
             "score": round(h["score"], 9)}
            for h in resp.hits
        ],
    }
with open(os.path.join(OUT, "..", "compat_r2_expected.json"), "w") as f:
    json.dump(expected, f, indent=1, sort_keys=True)
print("fixture written to", OUT)
with open(os.path.join(OUT, "catalog.json")) as f:
    state = json.load(f)
print("catalog keys:", sorted(state.keys()))
