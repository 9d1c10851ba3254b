"""Backward compatibility over FROZEN on-disk fixtures — the
quickwit-metastore/src/backward_compatibility_tests/ analog.

tests/golden/compat_r2_index is a complete round-2-format index
(generated once by tools/make_compat_fixture.py at the round-2 layout:
no catalog "version" field, no split format_version, no hotcache
sidecars) with its expected search results pinned next to it.  Round-3+
code must open and search it end-to-end WITHOUT rebuilding anything, and
mutating it must upgrade the serialization in place.
"""

from __future__ import annotations

import json
import os
import shutil

import pytest

from quickwit_spark.index.catalog import (
    CATALOG_VERSION,
    PUBLISHED,
    SPLIT_FORMAT_VERSION,
    Catalog,
    CatalogFromFutureError,
    SplitMetadata,
)
from quickwit_spark.search.executor import search
from quickwit_spark.search.request import SearchRequest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
FIXTURE = os.path.join(GOLDEN, "compat_r2_index")


@pytest.fixture()
def r2_index(tmp_path):
    """A working copy of the frozen round-2 index (tests may mutate it)."""
    dst = str(tmp_path / "r2_index")
    shutil.copytree(FIXTURE, dst)
    return dst


def _expected() -> dict:
    with open(os.path.join(GOLDEN, "compat_r2_expected.json")) as f:
        return json.load(f)


def test_round2_catalog_has_no_version_fields():
    """Guard the fixture itself: it must stay a PRE-versioning catalog,
    or this suite stops testing anything."""
    with open(os.path.join(FIXTURE, "catalog.json")) as f:
        state = json.load(f)
    assert "version" not in state
    assert all("format_version" not in s for s in state["splits"].values())
    assert not os.path.exists(os.path.join(FIXTURE, "hotcache"))


def test_round2_index_searches_end_to_end(spark, r2_index):
    """Open + search the frozen index: every pinned query reproduces its
    round-2 num_hits and (conv_id, turn_idx, score) hit list exactly."""
    for name, exp in _expected().items():
        req = SearchRequest(exp["query"], max_hits=max(10, len(exp["hits"])))
        if name == "sort":
            req = SearchRequest(exp["query"], sort_by_field="ts")
        resp = search(spark, r2_index, req)
        assert resp.num_hits == exp["num_hits"], name
        got = [
            {"conv_id": h["conv_id"], "turn_idx": h["turn_idx"],
             "score": round(h["score"], 9)}
            for h in resp.hits
        ]
        assert got == exp["hits"], name


def test_round2_catalog_mutation_upgrades_version(r2_index):
    cat = Catalog(r2_index)
    assert cat._state.get("version", 0) == 0  # loaded as-is, no rewrite
    old_rows = {s.split_id for s in cat.splits([PUBLISHED])}
    assert old_rows
    assert all(s.format_version == 0 for s in cat.splits([PUBLISHED]))
    cat.stage_split(SplitMetadata(split_id="new-00001", num_docs=1, ts_min=0, ts_max=1))
    cat.publish_splits(["new-00001"], {})
    fresh = Catalog(r2_index)
    assert fresh._state["version"] == CATALOG_VERSION  # upgraded on write
    by_id = {s.split_id: s for s in fresh.splits([PUBLISHED])}
    assert by_id["new-00001"].format_version == SPLIT_FORMAT_VERSION
    # old rows keep their pre-versioning stamp AND stay fully readable
    assert all(by_id[s].format_version == 0 for s in old_rows)


def test_future_catalog_version_rejected(tmp_path):
    idx = str(tmp_path / "future_idx")
    os.makedirs(idx)
    with open(os.path.join(idx, "catalog.json"), "w") as f:
        json.dump({"version": CATALOG_VERSION + 1, "config": {"index_id": "f"},
                   "splits": {}, "checkpoint": {}, "next_seq": 0,
                   "termstats": {"deltas": [], "complete": True}}, f)
    with pytest.raises(CatalogFromFutureError, match="newer engine"):
        Catalog(idx)


def test_round2_termstats_deltas_still_read(r2_index):
    """The frozen deltas carry no qw_termstats_version schema stamp;
    global term stats must still resolve from them."""
    cat = Catalog(r2_index)
    files = cat.termstats_files()
    assert files  # round-2 LSM was complete
    import pyarrow.parquet as pq

    md = pq.read_schema(files[0]).metadata or {}
    assert b"qw_termstats_version" not in md  # fixture predates the stamp
