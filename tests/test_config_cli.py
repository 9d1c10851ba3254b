"""Index-config surface: file loading, catalog round-trip, fixed-at-create
semantics (reference: fixed schema, docs/design/indexing.md:14; CLI
`index create --index-config-uri`)."""

import argparse
import json
import os

import pytest

from quickwit_spark.cli import cmd_create
from quickwit_spark.config import IndexConfig, load_config, transcripts_config
from quickwit_spark.fixtures.transcripts import generate_transcripts
from quickwit_spark.index.builder import build_index
from quickwit_spark.index.catalog import Catalog


def test_config_roundtrips_every_field():
    cfg = transcripts_config(
        split_num_docs_target=123,
        segment_num_docs_target=45,
        merge_factor=5,
        max_merge_factor=7,
        max_values_per_tag_field=17,
        term_merge_buckets=8,
        store_source=True,
        sort_by_field="ts",
        sort_by_order="asc",
    )
    assert IndexConfig.from_dict(cfg.to_dict()) == cfg


def test_load_config_json(tmp_path):
    cfg = transcripts_config(max_values_per_tag_field=9)
    p = tmp_path / "index-config.json"
    p.write_text(json.dumps(cfg.to_dict()))
    assert load_config(str(p)) == cfg


def test_cli_create_then_build_uses_stored_config(spark, tmp_path):
    cfg = transcripts_config(split_num_docs_target=300, segment_num_docs_target=64)
    conf_file = tmp_path / "conf.json"
    conf_file.write_text(json.dumps(cfg.to_dict()))
    idx = str(tmp_path / "idx")

    out = cmd_create(
        argparse.Namespace(index_dir=idx, config=str(conf_file), split_docs=1, segment_docs=1)
    )
    assert out["index_id"] == "transcripts"
    assert os.path.exists(os.path.join(idx, "catalog.json"))
    # second create refuses
    out2 = cmd_create(
        argparse.Namespace(index_dir=idx, config=str(conf_file), split_docs=1, segment_docs=1)
    )
    assert "error" in out2

    # building with the stored config works; a different config is rejected
    pdf = generate_transcripts(n_conversations=10, seed=3)
    stored = IndexConfig.from_dict(Catalog(idx).config_dict)
    report = build_index(spark, spark.createDataFrame(pdf), stored, idx)
    assert report.total_docs == len(pdf)
    with pytest.raises(ValueError, match="different config"):
        build_index(
            spark,
            spark.createDataFrame(pdf),
            transcripts_config(split_num_docs_target=999),
            idx,
            build_id="b2",
        )


def test_split_subcommands(spark, tmp_path):
    """split-list filters (states/time/tags), split-describe stats,
    split-extract copies the split's table files (split.rs analog)."""
    from quickwit_spark.cli import cmd_split_describe, cmd_split_extract, cmd_split_list

    idx = str(tmp_path / "idx")
    pdf = generate_transcripts(n_conversations=12, seed=9)
    cfg = transcripts_config(split_num_docs_target=120, segment_num_docs_target=64)
    build_index(spark, spark.createDataFrame(pdf), cfg, idx)
    cat = Catalog(idx)
    sids = [s.split_id for s in cat.splits()]

    ns = lambda **kw: argparse.Namespace(**kw)  # noqa: E731
    out = cmd_split_list(ns(index_dir=idx, states=None, start_timestamp=None, end_timestamp=None, tags=None))
    assert {r["split_id"] for r in out["splits"]} == set(sids)
    # a never-seen tag filters everything out; a real tag keeps all
    assert cmd_split_list(ns(index_dir=idx, states=None, start_timestamp=None, end_timestamp=None, tags=["role:nope"]))["splits"] == []
    # a start after every ts_max filters everything out
    hi = max(s.ts_max for s in cat.splits()) + 1
    assert cmd_split_list(ns(index_dir=idx, states=None, start_timestamp=hi, end_timestamp=None, tags=None))["splits"] == []

    d = cmd_split_describe(ns(index_dir=idx, split=sids[0]))
    assert d["split"]["num_docs"] > 0 and d["file_sizes"]["postings"] > 0
    assert "error" in cmd_split_describe(ns(index_dir=idx, split="nope"))

    tgt = str(tmp_path / "extracted")
    out = cmd_split_extract(ns(index_dir=idx, split=sids[0], target_dir=tgt))
    assert set(out["tables"]) >= {"docs", "postings", "fastfields"}
    assert os.path.exists(os.path.join(tgt, "postings"))


def test_source_management_and_source_scoped_ingest(spark, tmp_path):
    """source add/list/describe/delete (source.rs analog); ingest --source
    pulls path/format from the record, prefixes build ids with the source
    id, and delete_source drops exactly that source's checkpoints."""
    from quickwit_spark.cli import cmd_ingest, cmd_source
    from quickwit_spark.fixtures.transcripts import write_transcripts_parquet

    idx = str(tmp_path / "idx")
    data = str(tmp_path / "in.parquet")
    write_transcripts_parquet(data, n_conversations=6, seed=4)
    cfg = transcripts_config(split_num_docs_target=500, segment_num_docs_target=64)
    (tmp_path / "conf.json").write_text(json.dumps(cfg.to_dict()))
    cmd_create(argparse.Namespace(index_dir=idx, config=str(tmp_path / "conf.json"), split_docs=1, segment_docs=1))

    ns = argparse.Namespace
    out = cmd_source(ns(index_dir=idx, action="add", source_id="s1", type="parquet",
                        params=json.dumps({"path": data, "format": "parquet"})))
    assert out == {"cmd": "source-add", "source_id": "s1"}
    assert "error" in cmd_source(ns(index_dir=idx, action="add", source_id="s1", type="parquet", params="{}"))
    assert "s1" in cmd_source(ns(index_dir=idx, action="list"))["sources"]

    # '~' (the scope separator) and '/' (hive-partition-dir breaker) are
    # rejected in source ids so the '{source}~~{build}' prefix stays exact
    assert "error" in cmd_source(ns(index_dir=idx, action="add", source_id="a~b", type="parquet", params="{}"))

    rep = cmd_ingest(ns(index_dir=idx, input=None, source="s1", build_id="b0",
                        config=None, split_docs=1, segment_docs=1,
                        local_cpus=None, shuffle_partitions=None))
    assert rep["total_docs"] > 0

    desc = cmd_source(ns(index_dir=idx, action="describe", source_id="s1"))
    assert desc["source_type"] == "parquet" and desc["checkpoint"]  # positions recorded
    assert all(k.startswith("s1~~") for k in desc["checkpoint"])

    # split ids embed the source-scoped build id and are used verbatim as
    # split_id=<sid> partition directory names: they must be '/'-free and
    # survive the partition-discovery readers (merge reads with basePath)
    from quickwit_spark.index.merge import run_merge_pipeline

    sids = [s.split_id for s in Catalog(idx).splits()]
    assert sids and all("/" not in s and s.startswith("s1~~b0-") for s in sids)
    run_merge_pipeline(spark, idx)  # would null-out doc_id offsets pre-fix
    from quickwit_spark.search.executor import search
    from quickwit_spark.search.request import SearchRequest

    resp = search(spark, idx, SearchRequest(query="the", max_hits=5))
    assert resp.num_hits > 0

    cmd_source(ns(index_dir=idx, action="delete", source_id="s1"))
    assert cmd_source(ns(index_dir=idx, action="list"))["sources"] == {}
    assert not {k for k in Catalog(idx).checkpoint() if k.startswith("s1-")}
    # the published splits themselves survive (delete source != delete data)
    assert Catalog(idx).splits()


REFERENCE_FORMAT_CONFIG = {
    "version": 0,
    "index_id": "events-generic",
    "doc_mapping": {
        "field_mappings": [
            {"name": "title", "type": "text", "record": "position"},
            {"name": "body", "type": "text", "record": "position"},
            {"name": "category", "type": "text", "tokenizer": "raw"},
            {"name": "created", "type": "date", "fast": True},
            {"name": "severity", "type": "i64", "fast": True, "indexed": True},
            {
                "name": "attributes",
                "type": "object",
                "field_mappings": [
                    {"name": "server", "type": "text", "tokenizer": "raw"},
                ],
            },
        ],
        "tag_fields": ["category"],
    },
    "search_settings": {"default_search_fields": ["title", "body"]},
    "indexing_settings": {
        "timestamp_field": "created",
        "split_num_docs_target": 50,
        "merge_policy": {"merge_factor": 3, "max_merge_factor": 4},
    },
}


def test_load_reference_format_config(tmp_path):
    """The reference's index-config FILE shape (doc_mapping /
    search_settings / indexing_settings, docs/reference/index-config.md)
    loads into a mapper-backed IndexConfig with dotted leaves."""
    p = tmp_path / "ref-config.json"
    p.write_text(json.dumps(REFERENCE_FORMAT_CONFIG))
    cfg = load_config(str(p))
    assert cfg.index_id == "events-generic"
    assert cfg.timestamp_field == "created"
    assert cfg.split_num_docs_target == 50 and cfg.merge_factor == 3
    assert cfg.default_search_fields == ("title", "body")
    assert "attributes.server" in cfg.fields  # nested leaf flattened
    assert cfg.doc_mapper_json is not None
    # catalog round-trip preserves the mapper
    assert IndexConfig.from_dict(cfg.to_dict()) == cfg


def test_cli_generic_create_ingest_search(spark, tmp_path):
    """Full reference user journey on a NON-transcript schema: create with
    a reference-format config file, ingest NDJSON (error taxonomy in the
    output), field-scoped search on a dotted nested leaf."""
    from quickwit_spark.cli import cmd_ingest, cmd_search

    conf = tmp_path / "conf.json"
    conf.write_text(json.dumps(REFERENCE_FORMAT_CONFIG))
    nd = tmp_path / "docs.ndjson"
    docs = [
        json.dumps(
            {
                "title": f"report {i}",
                "body": "needle haystack" if i % 2 == 0 else "haystack",
                "category": "ops",
                "created": f"2024-02-0{1 + i % 9}T00:00:00Z",
                "severity": i % 3,
                "attributes": {"server": f"srv-{i % 2}"},
            }
        )
        for i in range(40)
    ]
    docs.append("not json")
    nd.write_text("\n".join(docs) + "\n")
    idx = str(tmp_path / "idx")

    out = cmd_create(argparse.Namespace(index_dir=idx, config=str(conf), split_docs=1, segment_docs=1))
    assert out["index_id"] == "events-generic"
    out = cmd_ingest(
        argparse.Namespace(
            index_dir=idx, config=None, input=str(nd), build_id="b0", source=None,
            local_cpus="4", shuffle_partitions=8, split_docs=1, segment_docs=1,
        )
    )
    assert out["total_docs"] == 40
    assert out["invalid_by_reason"] == {"not_json:": 1}
    out = cmd_search(
        argparse.Namespace(
            index_dir=idx, query="attributes.server:srv-0 needle", max_hits=5,
            start_offset=0, start_timestamp=None, end_timestamp=None,
            sort_by=None, local_cpus="4",
            shuffle_partitions=8, search_fields=None,
        )
    )
    assert out["num_hits"] > 0
    for h in out["hits"]:
        assert h["attributes.server"] == "srv-0"
        assert "needle" in h["body"]


def test_flat_array_mapper_config_routes_to_docmapper():
    """A flat (non-nested) mapper dict whose only non-engine feature is an
    array<T> type must route through the DocMapper path (review finding:
    the detection used to test dict KEYS for 'array')."""
    from quickwit_spark.config import config_from_any

    cfg = config_from_any(
        {
            "index_id": "arr",
            "field_mappings": [
                {"name": "tags", "type": "array<text>", "tokenizer": "raw"},
                {"name": "body", "type": "text"},
            ],
        }
    )
    assert cfg.doc_mapper_json is not None
    assert cfg.fields["tags"].is_array


def test_flat_config_with_array_field_round_trips():
    """config_from_any must recognize the engine's own flat
    IndexConfig.to_dict() (catalog.json's embedded shape) even when it
    contains array<T> fields — 'array<' alone is not a DocMapper marker.
    Regression: the DocMapper branch rejected the non-text fields'
    tokenizer/record defaults and silently dropped the build knobs."""
    from quickwit_spark.config import FieldMapping, IndexConfig, config_from_any

    cfg = IndexConfig(
        index_id="x",
        field_mappings=(
            FieldMapping("text", "text", record="position"),
            FieldMapping("tags", "array<text>", tokenizer="raw"),
            FieldMapping("ts", "i64", fast=True),
        ),
        timestamp_field="ts",
        default_search_fields=("text",),
        split_num_docs_target=123,
        merge_factor=7,
        max_merge_factor=8,
    )
    rt = config_from_any(cfg.to_dict())
    assert rt == cfg
    assert rt.split_num_docs_target == 123 and rt.merge_factor == 7


def test_reset_index_and_overwrite_flags(spark, tmp_path):
    """reset_index (quickwit-core/src/index.rs:162-185) wipes splits,
    checkpoints, and termstats but keeps config/sources; build --overwrite
    re-ingests the same build_id from scratch instead of resume-skipping."""
    from quickwit_spark.cli import cmd_build
    from quickwit_spark.fixtures.transcripts import write_transcripts_parquet
    from quickwit_spark.index.merge import reset_index
    from quickwit_spark.search.executor import search
    from quickwit_spark.search.request import SearchRequest

    src = tmp_path / "in.parquet"
    write_transcripts_parquet(str(src), n_conversations=20, seed=3)
    idx = str(tmp_path / "idx")
    ns = dict(
        input=str(src), input_format="auto", index_dir=idx, build_id="b0",
        config=None, n_splits=None, wave_size=None, split_docs=200,
        segment_docs=64, local_cpus="4", shuffle_partitions=8,
    )
    out = cmd_build(argparse.Namespace(**ns, overwrite=False))
    assert out["published_splits"] > 0
    cat = Catalog(idx)
    cat.add_source("s1", "file", {"path": str(src), "format": "parquet"})
    assert cat.checkpoint()  # build recorded positions

    r = reset_index(idx)
    assert r["splits_reset"] == out["n_splits"]
    cat = Catalog(idx)
    assert cat.splits() == [] and cat.checkpoint() == {}
    assert cat.sources().get("s1") is not None  # config + sources survive
    assert cat.config_dict is not None

    # same build_id would normally resume-skip everything; after the reset
    # it must rebuild, and --overwrite does reset+build in one command
    out2 = cmd_build(argparse.Namespace(**ns, overwrite=True))
    assert out2["published_splits"] == out["published_splits"]
    assert out2["skipped_splits"] == 0
    got = search(spark, idx, SearchRequest("the", max_hits=1))
    assert got.num_hits > 0


def test_create_overwrite(tmp_path):
    """create --overwrite (index.rs:177-183) replaces an existing index."""
    idx = str(tmp_path / "idx")
    ns = dict(index_dir=idx, config=None, split_docs=9, segment_docs=9, metastore=None)
    out = cmd_create(argparse.Namespace(**ns, overwrite=False))
    assert "error" not in out
    out = cmd_create(argparse.Namespace(**ns, overwrite=False))
    assert "already exists" in out["error"]
    out = cmd_create(argparse.Namespace(**ns, overwrite=True))
    assert "error" not in out and Catalog.exists(idx)


def test_config_rejects_duplicates_and_bad_merge_factors():
    """index_config.rs:274-299 validate(): duplicate mappings and
    max_merge_factor < merge_factor are config errors, not silent."""
    from quickwit_spark.config import FieldMapping, IndexConfig

    base = dict(
        index_id="x",
        timestamp_field=None,
        default_search_fields=("text",),
    )
    with pytest.raises(ValueError, match="duplicate"):
        IndexConfig(
            field_mappings=(
                FieldMapping("text", "text", record="position"),
                FieldMapping("text", "text"),
            ),
            **base,
        )
    with pytest.raises(ValueError, match="max_merge_factor"):
        IndexConfig(
            field_mappings=(FieldMapping("text", "text", record="position"),),
            merge_factor=10,
            max_merge_factor=9,
            **base,
        )
