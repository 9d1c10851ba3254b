"""DocMapper parity tests — ports of the reference's doc-parsing accept /
reject cases (default_mapper.rs:468-1039, field_mapping_entry.rs tests,
default_doc_mapper/mod.rs:85-103)."""

from __future__ import annotations

import base64
from datetime import datetime, timezone

import pytest

from quickwit_spark.docmapper import (
    DocMapper,
    DocParsingError,
    FieldEntry,
    parse_ndjson,
    parse_rfc3339,
    spark_struct_type,
    validate_field_mapping_name,
)

# the reference test mapper (quickwit-doc-mapper/src/lib.rs
# default_doc_mapper_for_tests): timestamp, body, response_date,
# response_time, response_payload (fast bytes), owner, attributes object
REF_MAPPER_DICT = {
    "store_source": True,
    "default_search_fields": ["body", "attributes.server", "attributes.server.status"],
    "timestamp_field": "timestamp",
    "tag_fields": ["owner"],
    "field_mappings": [
        {"name": "timestamp", "type": "i64", "fast": True},
        {"name": "body", "type": "text", "stored": True, "record": "position"},
        {"name": "response_date", "type": "date", "fast": True},
        {"name": "response_time", "type": "f64", "fast": True},
        {"name": "response_payload", "type": "bytes", "fast": True},
        {"name": "owner", "type": "text", "tokenizer": "raw"},
        {
            "name": "attributes",
            "type": "object",
            "field_mappings": [
                {"name": "tags", "type": "array<i64>"},
                {"name": "server", "type": "text", "tokenizer": "raw"},
                {"name": "server.status", "type": "array<text>", "tokenizer": "raw"},
                {"name": "server.payload", "type": "array<bytes>"},
            ],
        },
    ],
}

# reference JSON_DOC_VALUE (default_mapper.rs:479-493)
JSON_DOC_VALUE = """
{
    "timestamp": 1586960586000,
    "body": "20200415T072306-0700 INFO This is a great log",
    "response_date": "2021-12-19T16:39:57Z",
    "response_time": 2.3,
    "response_payload": "YWJj",
    "owner": "foo",
    "attributes": {
        "server": "ABC",
        "tags": [22, 23],
        "server.status": ["200", "201"],
        "server.payload": ["YQ==", "Yg=="]
    }
}"""


@pytest.fixture(scope="module")
def mapper():
    return DocMapper.from_dict(REF_MAPPER_DICT)


# --- field name validation (mod.rs:85-103) ----------------------------------


def test_validate_field_mapping_name():
    with pytest.raises(ValueError, match="Field name is empty"):
        validate_field_mapping_name("")
    with pytest.raises(ValueError, match="too long"):
        validate_field_mapping_name("a" * 256)
    with pytest.raises(ValueError, match="must start with"):
        validate_field_mapping_name("0")
    with pytest.raises(ValueError, match="illegal characters"):
        validate_field_mapping_name("_my-field!")
    validate_field_mapping_name("my-field")
    validate_field_mapping_name("_id")
    validate_field_mapping_name("my.nested.field")


# --- mapping-entry validation (field_mapping_entry.rs / default_mapper.rs) --


def test_unknown_type_rejected():
    with pytest.raises(ValueError, match="unknown type"):
        FieldEntry.from_dict({"name": "x", "type": "int32"})


def test_text_fast_rejected():
    with pytest.raises(ValueError, match="fast=true not yet supported for text"):
        FieldEntry.from_dict({"name": "x", "type": "text", "fast": True})


def test_tokenizer_on_numeric_rejected():
    with pytest.raises(ValueError, match="for text field only"):
        FieldEntry.from_dict({"name": "x", "type": "i64", "tokenizer": "raw"})


def test_record_on_unindexed_text_rejected():
    with pytest.raises(ValueError, match="allowed only if indexed"):
        FieldEntry.from_dict(
            {"name": "x", "type": "text", "indexed": False, "record": "position"}
        )


def test_array_of_object_rejected():
    # field_mapping_entry.rs:667-671
    with pytest.raises(ValueError, match="array of object is not supported"):
        FieldEntry.from_dict(
            {"name": "x", "type": "array<object>", "field_mappings": [{"name": "y", "type": "i64"}]}
        )


def test_object_without_children_rejected():
    with pytest.raises(ValueError, match="at least one field mapping"):
        FieldEntry.from_dict({"name": "x", "type": "object"})


def test_source_reserved():
    # default_mapper.rs test_fail_with_field_name_equal_to_source
    with pytest.raises(ValueError, match="reserved field name"):
        DocMapper.from_dict({"field_mappings": [{"name": "_source", "type": "i64"}]})


def test_duplicate_leaf_rejected():
    with pytest.raises(ValueError, match="must be unique"):
        DocMapper.from_dict(
            {
                "field_mappings": [
                    {"name": "a", "type": "i64"},
                    {"name": "a", "type": "text"},
                ]
            }
        )


def test_non_fast_timestamp_rejected():
    # default_mapper.rs test_fail_to_build_doc_mapper_with_non_fast_timestamp_field
    with pytest.raises(ValueError, match="Timestamp field must be a fast field"):
        DocMapper.from_dict(
            {
                "timestamp_field": "timestamp",
                "field_mappings": [{"name": "timestamp", "type": "i64"}],
            }
        )


def test_text_timestamp_rejected():
    with pytest.raises(ValueError, match="Timestamp field must be a fast field"):
        DocMapper.from_dict(
            {
                "timestamp_field": "timestamp",
                "field_mappings": [{"name": "timestamp", "type": "text"}],
            }
        )


def test_array_timestamp_rejected():
    # test_fail_to_build_doc_mapper_with_multivalued_timestamp_field
    with pytest.raises(ValueError, match="cannot be an array"):
        DocMapper.from_dict(
            {
                "timestamp_field": "timestamp",
                "field_mappings": [
                    {"name": "timestamp", "type": "array<i64>", "fast": True}
                ],
            }
        )


def test_tag_on_default_tokenized_text_rejected():
    # build_schema tag checks (default_mapper.rs:170-189)
    with pytest.raises(ValueError, match="`raw` tokenizer"):
        DocMapper.from_dict(
            {
                "tag_fields": ["t"],
                "field_mappings": [{"name": "t", "type": "text"}],
            }
        )


def test_tag_on_bytes_rejected():
    with pytest.raises(ValueError, match="not allowed on `bytes`"):
        DocMapper.from_dict(
            {
                "tag_fields": ["b"],
                "field_mappings": [{"name": "b", "type": "bytes"}],
            }
        )


def test_unknown_tag_field_rejected():
    with pytest.raises(ValueError, match="Unknown tag field"):
        DocMapper.from_dict(
            {"tag_fields": ["nope"], "field_mappings": [{"name": "a", "type": "i64"}]}
        )


def test_demux_rules():
    base = {"name": "tenant", "type": "u64", "fast": True}
    DocMapper.from_dict({"demux_field": "tenant", "field_mappings": [dict(base)]})
    with pytest.raises(ValueError, match="must be a fast field"):
        DocMapper.from_dict(
            {"demux_field": "tenant", "field_mappings": [{"name": "tenant", "type": "u64"}]}
        )
    with pytest.raises(ValueError, match="u64 or i64"):
        DocMapper.from_dict(
            {"demux_field": "tenant", "field_mappings": [{"name": "tenant", "type": "f64", "fast": True}]}
        )


def test_demux_added_to_tags():
    m = DocMapper.from_dict(
        {"demux_field": "tenant", "field_mappings": [{"name": "tenant", "type": "u64", "fast": True}]}
    )
    assert "tenant" in m.tag_fields


def test_sort_by_must_be_fast():
    with pytest.raises(ValueError, match="Sort by field must be a fast field"):
        DocMapper.from_dict(
            {
                "sort_by": {"field_name": "x", "order": "desc"},
                "field_mappings": [{"name": "x", "type": "i64"}],
            }
        )


# --- doc parsing: the reference's accept/reject cases ------------------------


def test_parsing_document(mapper):
    # default_mapper.rs test_parsing_document: all leaves typed correctly
    vals = mapper.doc_from_json(JSON_DOC_VALUE)
    assert vals["timestamp"] == [1586960586000]
    assert vals["body"] == ["20200415T072306-0700 INFO This is a great log"]
    assert vals["response_date"] == [datetime(2021, 12, 19, 16, 39, 57, tzinfo=timezone.utc)]
    assert vals["response_time"] == [2.3]
    assert vals["response_payload"] == [b"abc"]
    assert vals["owner"] == ["foo"]
    assert vals["attributes.server"] == ["ABC"]
    assert vals["attributes.tags"] == [22, 23]
    assert vals["attributes.server.status"] == ["200", "201"]
    assert vals["attributes.server.payload"] == [b"a", b"b"]


def test_accept_unknown_and_missing_fields(mapper):
    # test_accept_parsing_document_with_unknown_fields_and_missing_fields
    vals = mapper.doc_from_json(
        """{
        "timestamp": 1586960586000,
        "unknown_field": "20200415T072306-0700 INFO This is a great log",
        "response_date": "2021-12-19T16:39:57+00:00",
        "response_time": 12,
        "response_payload": "YWJj"
    }"""
    )
    assert "unknown_field" not in vals
    assert "body" not in vals  # missing non-fast fields are fine
    assert vals["response_time"] == [12.0]


def test_missing_fast_field_rejected(mapper):
    # test_fail_parsing_document_with_missing_fast_field
    with pytest.raises(DocParsingError) as ei:
        mapper.doc_from_json(
            """{
            "timestamp": 1586960586000,
            "response_date": "2021-12-19T16:39:57+00:00",
            "response_time": 12
        }"""
        )
    assert ei.value.kind == "required_fast_field"
    assert ei.value.field == "response_payload"


def test_wrong_cardinality_rejected(mapper):
    # test_fail_to_parse_document_with_wrong_cardinality
    with pytest.raises(DocParsingError) as ei:
        mapper.doc_from_json(
            '{"timestamp": 1586960586000, "body": ["text 1", "text 2"]}'
        )
    assert ei.value.kind == "multi_values_not_supported"
    assert ei.value.field == "body"


def test_wrong_value_rejected(mapper):
    # test_fail_to_parse_document_with_wrong_value
    with pytest.raises(DocParsingError) as ei:
        mapper.doc_from_json('{"timestamp": 1586960586000, "body": 1}')
    assert ei.value.kind == "value_error"
    assert "Expected JSON string, got '1'." in str(ei.value)


def test_not_json_rejected(mapper):
    with pytest.raises(DocParsingError) as ei:
        mapper.doc_from_json("this is not json")
    assert ei.value.kind == "not_json"


def test_bad_base64_rejected():
    # test_fail_to_parse_document_with_wrong_base64_value
    m = DocMapper.from_dict(
        {"field_mappings": [{"name": "image", "type": "bytes", "stored": True}]}
    )
    with pytest.raises(DocParsingError) as ei:
        m.doc_from_json('{"city": "paris", "image": "invalid base64 data"}')
    assert "Expected Base64 string, got 'invalid base64 data'." in str(ei.value)


def test_i64_range_and_float_rejected():
    m = DocMapper.from_dict({"field_mappings": [{"name": "n", "type": "i64"}]})
    assert m.doc_from_json('{"n": -5}')["n"] == [-5]
    with pytest.raises(DocParsingError, match="Expected i64"):
        m.doc_from_json('{"n": 2.5}')
    with pytest.raises(DocParsingError, match="Expected i64"):
        m.doc_from_json(f'{{"n": {2**63}}}')
    with pytest.raises(DocParsingError, match="Expected JSON number"):
        m.doc_from_json('{"n": "5"}')
    with pytest.raises(DocParsingError, match="Expected JSON number"):
        m.doc_from_json('{"n": true}')


def test_u64_negative_rejected():
    m = DocMapper.from_dict({"field_mappings": [{"name": "n", "type": "u64"}]})
    assert m.doc_from_json(f'{{"n": {2**64 - 1}}}')["n"] == [2**64 - 1]
    with pytest.raises(DocParsingError, match="Expected u64"):
        m.doc_from_json('{"n": -1}')


def test_date_parsing():
    m = DocMapper.from_dict({"field_mappings": [{"name": "d", "type": "date"}]})
    got = m.doc_from_json('{"d": "2021-12-19T16:39:57-05:00"}')["d"][0]
    assert got == datetime(2021, 12, 19, 21, 39, 57, tzinfo=timezone.utc)
    with pytest.raises(DocParsingError, match="Expected RFC 3339 date"):
        m.doc_from_json('{"d": "2021-12-19"}')
    with pytest.raises(DocParsingError, match="Expected RFC 3339 date"):
        m.doc_from_json('{"d": 1586960586000}')


def test_null_values_are_absent(mapper):
    vals = mapper.doc_from_json(
        '{"timestamp": 1, "body": null, "response_payload": "YWJj", '
        '"response_date": "2021-12-19T16:39:57Z", "response_time": 1}'
    )
    assert "body" not in vals


def test_object_wrong_shape_rejected(mapper):
    with pytest.raises(DocParsingError) as ei:
        mapper.doc_from_json(
            '{"timestamp": 1, "response_payload": "YQ==", "attributes": [1]}'
        )
    assert ei.value.kind == "multi_values_not_supported"
    with pytest.raises(DocParsingError, match="Expected JSON object"):
        mapper.doc_from_json(
            '{"timestamp": 1, "response_payload": "YQ==", "attributes": 3}'
        )


def test_rfc3339_helper():
    assert parse_rfc3339("2020-01-01T00:00:00Z").tzinfo == timezone.utc
    with pytest.raises(ValueError):
        parse_rfc3339("not a date")


def test_roundtrip_dict(mapper):
    assert DocMapper.from_dict(mapper.to_dict()).to_dict() == mapper.to_dict()


# --- Spark projection ---------------------------------------------------------


def test_parse_ndjson_spark(spark, mapper):
    lines = [
        (JSON_DOC_VALUE.replace("\n", " "),),
        (
            '{"timestamp": 2, "body": "ok", "response_payload": "YQ==", '
            '"response_date": "2021-12-19T16:39:57Z", "response_time": 1}',
        ),
        ("not json at all",),
        (
            '{"timestamp": 3, "body": 7, "response_payload": "YQ==", '
            '"response_date": "2021-12-19T16:39:57Z", "response_time": 1}',
        ),
        ('{"timestamp": 4, "body": "missing the fast bytes field"}',),
    ]
    df = spark.createDataFrame(lines, "value string")
    out = parse_ndjson(df, mapper).toPandas()
    assert list(out.columns) == [lf for lf in mapper.leaves] + ["_parse_error"]
    ok = out[out["_parse_error"].isna()]
    assert len(ok) == 2
    first = out.iloc[0]
    assert first["timestamp"] == 1586960586000
    assert first["attributes.server"] == "ABC"
    assert list(first["attributes.tags"]) == [22, 23]
    assert bytes(first["response_payload"]) == b"abc"
    errs = out["_parse_error"].dropna().tolist()
    assert "not_json:" in errs
    assert "value_error:body" in errs
    assert "required_fast_field:response_date" in errs


def test_spark_struct_type(mapper):
    t = spark_struct_type(mapper)
    names = [f.name for f in t.fields]
    assert "attributes.server.payload" in names
    assert names[-1] == "_parse_error"


def test_demux_field_converts_to_index_config():
    """A DocMapper with a u64 demux field (auto-added to tags, reference
    default_mapper.rs:131-139) must convert to an IndexConfig — numeric
    tag fields are legal (review finding: tag validation used to require
    raw text and made demux unusable through any config path)."""
    from quickwit_spark.config import IndexConfig

    m = DocMapper.from_dict(
        {
            "field_mappings": [
                {"name": "body", "type": "text"},
                {"name": "tenant", "type": "u64", "fast": True, "indexed": True},
            ],
            "demux_field": "tenant",
        }
    )
    assert m.tag_fields == ("tenant",)
    cfg = IndexConfig.from_doc_mapper(m, "t")
    assert "tenant" in cfg.tag_fields


def test_u64_overflow_classified_not_crash(spark):
    """A full-range u64 value passes the reference taxonomy but must become
    THAT doc's value_error (the engine's columns are int64-backed), never an
    Arrow task crash."""
    import json as _json

    m = DocMapper.from_dict(
        {"field_mappings": [{"name": "f", "type": "u64", "indexed": True}]}
    )
    lines = [_json.dumps({"f": (1 << 64) - 1}), _json.dumps({"f": 7})]
    df = spark.createDataFrame([(s,) for s in lines], "value string")
    out = parse_ndjson(df, m).collect()
    errs = {r["_parse_error"] for r in out}
    assert "value_error:f" in errs and None in errs


def test_reserved_plumbing_leaf_names_rejected():
    from quickwit_spark.config import IndexConfig

    m = DocMapper.from_dict(
        {"field_mappings": [{"name": "ts", "type": "i64", "fast": True}]}
    )
    with pytest.raises(ValueError, match="reserved by the engine"):
        IndexConfig.from_doc_mapper(m, "t")


def test_f64_sort_by_rejected_at_mapper():
    with pytest.raises(ValueError, match="cannot be f64"):
        DocMapper.from_dict(
            {
                "field_mappings": [{"name": "sc", "type": "f64", "fast": True}],
                "sort_by_field": "sc",
            }
        )


# --- Hypothesis fuzzing: mapper serde round-trip + parse classification ----

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_SCALARS = ["text", "i64", "u64", "f64", "date", "bytes"]


@st.composite
def _entries(draw, depth=0):
    t = draw(st.sampled_from(_SCALARS + (["object"] if depth < 2 else [])))
    name = draw(
        st.text(alphabet="abcdefgh_", min_size=1, max_size=6).filter(
            lambda s: s[0].isalpha() or s[0] == "_"
        )
    )
    d = {"name": name, "type": t}
    if t == "object":
        d["field_mappings"] = draw(
            st.lists(_entries(depth=depth + 1), min_size=1, max_size=3)
        )
    else:
        if draw(st.booleans()) and t != "object":
            d["type"] = f"array<{t}>"
        if t == "text":
            d["tokenizer"] = draw(st.sampled_from(["default", "raw", "stem_en"]))
            d["record"] = draw(st.sampled_from(["basic", "freq", "position"]))
        elif t != "bytes" and draw(st.booleans()) and not d["type"].startswith("array"):
            d["fast"] = True
        d["stored"] = draw(st.booleans())
        d["indexed"] = draw(st.booleans())
    return d


@settings(max_examples=60, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(entries=st.lists(_entries(), min_size=1, max_size=5))
def test_mapper_serde_roundtrip(entries):
    """Any mapper that VALIDATES must round-trip through to_dict/from_dict
    with identical flattened leaves and identical parse behavior."""
    try:
        m = DocMapper.from_dict({"field_mappings": entries})
    except ValueError:
        return  # duplicate leaf names etc. — rejection is fine
    m2 = DocMapper.from_dict(m.to_dict())
    assert sorted(m.leaves) == sorted(m2.leaves)
    for n in m.leaves:
        assert m.leaves[n].entry == m2.leaves[n].entry


_VALS = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(-(1 << 70), 1 << 70),
    st.floats(allow_nan=False, allow_infinity=False),
    st.text(max_size=8),
    st.lists(st.one_of(st.integers(-100, 100), st.text(max_size=4)), max_size=3),
)


@settings(max_examples=120, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(doc=st.dictionaries(st.sampled_from(["a", "b", "c", "zz"]), _VALS, max_size=4))
def test_doc_from_json_total_classification(doc):
    """doc_from_json on ARBITRARY json objects either returns typed values
    or raises a classified DocParsingError — never any other exception —
    and accepted values respect the leaf types."""
    import json as _json

    m = DocMapper.from_dict(
        {
            "field_mappings": [
                {"name": "a", "type": "i64", "indexed": True},
                {"name": "b", "type": "array<text>"},
                {"name": "c", "type": "date"},
            ]
        }
    )
    try:
        out = m.doc_from_json(_json.dumps(doc))
    except DocParsingError as e:
        assert e.kind in (
            "not_json", "value_error", "multi_values_not_supported",
            "required_fast_field", "no_such_field_in_schema",
        )
        return
    for v in out.get("a", []):
        assert isinstance(v, int) and not isinstance(v, bool)
    for v in out.get("b", []):
        assert isinstance(v, str)
    for v in out.get("c", []):
        assert isinstance(v, datetime)
