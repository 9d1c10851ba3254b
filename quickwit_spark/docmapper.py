"""General DocMapper — the typed, nested, config-driven JSON→document
projection of the reference (quickwit-doc-mapper/src/default_doc_mapper/*).

Supported leaf types (field_mapping_entry.rs:497-518): ``text``, ``i64``,
``u64``, ``f64``, ``date`` (RFC-3339 string → UTC datetime,
field_mapping_entry.rs:338-349), ``bytes`` (base64 string,
field_mapping_entry.rs:382-391), ``object`` (nested mappings,
field_mapping_entry.rs:406-438) and ``array<T>`` of any scalar type
(cardinality from the ``array<...>`` type string,
field_mapping_entry.rs:574-593).  Array-of-object is rejected
(field_mapping_entry.rs:667-671).  Nested names flatten with ``.`` joins
via FieldPath (field_mapping_entry.rs:445-470).

Doc parsing follows the reference's error taxonomy exactly
(DocParsingError, field_mapping_entry.rs:719-738):

* NotJson                    — the input line is not valid JSON
* ValueError(field, msg)     — a value has the wrong type / range / format
* NoSuchFieldInSchema(field) — (kept for API parity; our schema is closed
                               at build time so it cannot fire at parse)
* MultiValuesNotSupported    — array given to a single-valued field
* RequiredFastField(field)   — a declared fast field is absent from the doc

Unknown JSON fields are silently dropped (default_mapper.rs:582-595);
nulls mean "absent" (field_mapping_entry.rs parse_*: JsonValue::Null → []).

Spark surface: ``spark_struct_type`` derives the nested input StructType,
``parse_ndjson`` projects a DataFrame of JSON lines to one typed column per
stored leaf (dotted names) plus a ``_parse_error`` classification column —
Arrow-batched mapInPandas (JSON docs are parsed one-by-one in the reference
too; the C-speed json module inside an Arrow batch is the same shape).
"""

from __future__ import annotations

import base64
import binascii
import json
import re
from dataclasses import dataclass, field as dc_field
from datetime import datetime, timezone
from typing import Any, Iterator

SOURCE_FIELD_NAME = "_source"  # reserved (quickwit-doc-mapper/src/lib.rs:43-44)

SCALAR_TYPES = ("text", "i64", "u64", "f64", "date", "bytes")
TOKENIZERS = ("default", "raw", "stem_en")
RECORD_OPTIONS = ("basic", "freq", "position")

# validate_field_mapping_name (default_doc_mapper/mod.rs:40-71)
_NAME_PTN = re.compile(r"^[a-zA-Z_][a-zA-Z0-9-_.]{0,254}$")


class DocParsingError(Exception):
    """One reference DocParsingError variant, identified by ``kind``."""

    def __init__(self, kind: str, field: str, message: str):
        super().__init__(message)
        self.kind = kind
        self.field = field

    @staticmethod
    def not_json(sample: str) -> "DocParsingError":
        return DocParsingError("not_json", "", "The provided string is not valid JSON")

    @staticmethod
    def value_error(field: str, msg: str) -> "DocParsingError":
        return DocParsingError(
            "value_error", field, f"The field '{field}' could not be parsed: {msg}"
        )

    @staticmethod
    def multi_values(field: str) -> "DocParsingError":
        return DocParsingError(
            "multi_values_not_supported",
            field,
            "The document contains an array of values but a single value is "
            f"expected: {field!r}",
        )

    @staticmethod
    def required_fast_field(field: str) -> "DocParsingError":
        return DocParsingError(
            "required_fast_field",
            field,
            f"The document must contain field {field!r}. As a fast field, it "
            "is implicitly required.",
        )

    @staticmethod
    def no_such_field(field: str) -> "DocParsingError":
        return DocParsingError(
            "no_such_field_in_schema",
            field,
            "The document contains a field that is not declared in the "
            f"schema: {field!r}",
        )


def validate_field_mapping_name(name: str) -> None:
    """Reference validate_field_mapping_name (mod.rs:44-71), same messages."""
    if _NAME_PTN.match(name):
        return
    if not name:
        raise ValueError("Field name is empty.")
    if len(name) > 255:
        raise ValueError(
            f"Field name `{name}` is too long. Field names must not be longer "
            "than 255 characters."
        )
    first = name[0]
    if not (first.isascii() and first.isalpha()) and first != "_":
        raise ValueError(
            f"Field name `{name}` is invalid. Field names must start with an "
            "uppercase or lowercase ASCII letter, or an underscore `_`."
        )
    raise ValueError(
        f"Field name `{name}` contains illegal characters. Field names must "
        "only contain uppercase and lowercase ASCII letters, digits, hyphens "
        "`-`, periods `.`, and underscores `_`."
    )


@dataclass(frozen=True)
class FieldEntry:
    """One FieldMappingEntry (field_mapping_entry.rs:43-48).  ``type`` is the
    scalar type (or 'object'); ``array`` carries the cardinality parsed from
    an ``array<...>`` type string."""

    name: str
    type: str
    array: bool = False
    stored: bool = True
    indexed: bool = True
    fast: bool = False
    tokenizer: str | None = None
    record: str | None = None
    field_mappings: tuple["FieldEntry", ...] = ()

    @staticmethod
    def from_dict(d: dict) -> "FieldEntry":
        name = d.get("name", "")
        type_str = d.get("type", "")
        is_array = type_str.startswith("array<") and type_str.endswith(">")
        scalar = type_str[6:-1] if is_array else type_str
        if scalar not in SCALAR_TYPES + ("object",):
            raise ValueError(f"Field `{name}` has an unknown type: `{scalar}`.")
        validate_field_mapping_name(name)
        stored = d.get("stored", True)
        fast = d.get("fast", False)
        indexed = d.get("indexed")
        tokenizer = d.get("tokenizer")
        record = d.get("record")
        children: tuple[FieldEntry, ...] = ()

        if scalar == "text":
            # new_text (field_mapping_entry.rs:595-623)
            if fast:
                raise ValueError(
                    f"Error when parsing field `{name}`: fast=true not yet "
                    "supported for text field."
                )
            if indexed is False and (record is not None or tokenizer is not None):
                raise ValueError(
                    f"Error when parsing `{name}`: `record` and `tokenizer` "
                    "parameters are allowed only if indexed is true."
                )
            if tokenizer is not None and tokenizer not in TOKENIZERS:
                raise ValueError(
                    f"Error when parsing field `{name}`: unknown tokenizer "
                    f"`{tokenizer}`."
                )
            if record is not None and record not in RECORD_OPTIONS:
                raise ValueError(
                    f"Error when parsing field `{name}`: unknown record option "
                    f"`{record}`."
                )
        elif scalar == "object":
            # new_object (field_mapping_entry.rs:660-690)
            if record is not None or tokenizer is not None:
                raise ValueError(
                    f"Error when parsing field `{name}`: `field_mappings` is "
                    "the only valid parameter."
                )
            if is_array:
                raise ValueError(
                    f"Error when parsing field `{name}`: array of object is "
                    "not supported."
                )
            raw_children = d.get("field_mappings", [])
            if not raw_children:
                raise ValueError(
                    f"Error when parsing field `{name}`: object type must have "
                    "at least one field mapping."
                )
            children = tuple(FieldEntry.from_dict(c) for c in raw_children)
        else:
            # int_options / new_bytes: check_no_text_options
            # (field_mapping_entry.rs:703-713)
            if record is not None or tokenizer is not None:
                raise ValueError(
                    f"Error when parsing `{name}`: `record` and `tokenizer` "
                    "parameters are for text field only."
                )

        return FieldEntry(
            name=name,
            type=scalar,
            array=is_array,
            stored=stored,
            indexed=True if indexed is None else bool(indexed),
            fast=fast,
            tokenizer=(tokenizer or "default") if scalar == "text" else None,
            record=(record or "basic") if scalar == "text" else None,
            field_mappings=children,
        )

    def to_dict(self) -> dict:
        d: dict = {
            "name": self.name,
            "type": f"array<{self.type}>" if self.array else self.type,
            "stored": self.stored,
            "indexed": self.indexed,
            "fast": self.fast,
        }
        if self.type == "text":
            d["tokenizer"] = self.tokenizer
            d["record"] = self.record
        if self.type == "object":
            d["field_mappings"] = [c.to_dict() for c in self.field_mappings]
        return d


@dataclass(frozen=True)
class Leaf:
    """A flattened schema entry: dotted full name + its FieldEntry."""

    name: str
    entry: FieldEntry


def _flatten(entries: tuple[FieldEntry, ...], prefix: str = "") -> list[Leaf]:
    out: list[Leaf] = []
    for e in entries:
        full = f"{prefix}{e.name}"
        if e.type == "object":
            out.extend(_flatten(e.field_mappings, prefix=f"{full}."))
        else:
            out.append(Leaf(full, e))
    return out


# --- per-type value parsers (field_mapping_entry.rs:125-438 semantics) ------

U64_MAX = (1 << 64) - 1
I64_MIN, I64_MAX = -(1 << 63), (1 << 63) - 1

_RFC3339 = re.compile(
    r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:\d{2})$"
)


def parse_rfc3339(value: str) -> datetime:
    if not _RFC3339.match(value):
        raise ValueError("not RFC 3339")
    v = value.replace("z", "Z")
    if v.endswith("Z"):
        v = v[:-1] + "+00:00"
    return datetime.fromisoformat(v).astimezone(timezone.utc)


def _parse_scalar(entry: FieldEntry, name: str, v: Any) -> Any:
    """One non-null, non-array JSON value → a typed python value, or raise
    the reference's ValueError message for that type."""
    t = entry.type
    if t == "text":
        if isinstance(v, str):
            return v
        raise DocParsingError.value_error(name, f"Expected JSON string, got '{_j(v)}'.")
    if t in ("i64", "u64", "f64"):
        # JSON numbers only; bool is not a JSON number (serde Number)
        if isinstance(v, bool) or not isinstance(v, (int, float)):
            raise DocParsingError.value_error(
                name, f"Expected JSON number or array of JSON numbers, got '{_j(v)}'."
            )
        if t == "f64":
            return float(v)
        if isinstance(v, float):
            if not v.is_integer():
                raise DocParsingError.value_error(
                    name, f"Expected {t}, got '{_j(v)}'."
                )
            v = int(v)
        if t == "i64":
            if not (I64_MIN <= v <= I64_MAX):
                raise DocParsingError.value_error(name, f"Expected i64, got '{v}'.")
            return v
        if not (0 <= v <= U64_MAX):
            raise DocParsingError.value_error(name, f"Expected u64, got '{v}'.")
        return v
    if t == "date":
        if not isinstance(v, str):
            raise DocParsingError.value_error(name, f"Expected RFC 3339 date, got '{_j(v)}'.")
        try:
            return parse_rfc3339(v)
        except ValueError:
            raise DocParsingError.value_error(
                name, f"Expected RFC 3339 date, got '{v}'."
            ) from None
    if t == "bytes":
        if not isinstance(v, str):
            raise DocParsingError.value_error(
                name, f"Expected JSON string for bytes field, got '{_j(v)}'"
            )
        try:
            return base64.b64decode(v, validate=True)
        except (binascii.Error, ValueError):
            raise DocParsingError.value_error(
                name, f"Expected Base64 string, got '{v}'."
            ) from None
    raise AssertionError(t)


def _j(v: Any) -> str:
    return json.dumps(v, separators=(",", ":"))


def _parse_value(entry: FieldEntry, name: str, v: Any, out: dict) -> None:
    """parse_* dispatch (field_mapping_entry.rs:125-158): nulls are absent,
    arrays recurse when the field is multi-valued (nested arrays flatten,
    matching the reference's recursive parse)."""
    if v is None:
        return
    if isinstance(v, list):
        if not entry.array:
            raise DocParsingError.multi_values(name)
        for el in v:
            _parse_value(entry, name, el, out)
        return
    out.setdefault(name, []).append(_parse_scalar(entry, name, v))


def _parse_object(entries: tuple[FieldEntry, ...], prefix: str, obj: Any, out: dict, name: str) -> None:
    """parse_object (field_mapping_entry.rs:406-438): unknown keys dropped,
    arrays of objects rejected."""
    if obj is None:
        return
    if isinstance(obj, list):
        raise DocParsingError.multi_values(name)
    if not isinstance(obj, dict):
        raise DocParsingError.value_error(name, f"Expected JSON object, got '{_j(obj)}'.")
    for e in entries:
        if e.name not in obj:
            continue  # missing fields accepted (default_mapper.rs:582-595)
        child = obj[e.name]
        full = f"{prefix}{e.name}"
        if e.type == "object":
            _parse_object(e.field_mappings, f"{full}.", child, out, full)
        else:
            _parse_value(e, full, child, out)


class DocMapper:
    """DefaultDocMapper analog: schema build + validation + doc_from_json."""

    def __init__(
        self,
        field_mappings: tuple[FieldEntry, ...],
        *,
        default_search_fields: tuple[str, ...] = (),
        timestamp_field: str | None = None,
        tag_fields: tuple[str, ...] = (),
        sort_by_field: str | None = None,
        sort_by_order: str = "desc",
        demux_field: str | None = None,
        store_source: bool = False,
    ):
        self.field_mappings = field_mappings
        self.default_search_fields = tuple(default_search_fields)
        self.timestamp_field = timestamp_field
        self.sort_by_field = sort_by_field
        self.sort_by_order = sort_by_order
        self.demux_field = demux_field
        self.store_source = store_source

        leaves = _flatten(field_mappings)
        by_name: dict[str, Leaf] = {}
        for lf in leaves:
            # build_schema (default_mapper.rs:156-205)
            if lf.name == SOURCE_FIELD_NAME:
                raise ValueError(
                    "`_source` is a reserved field name, please, use a "
                    "different name for this field."
                )
            if lf.name in by_name:
                raise ValueError(
                    f"Field name must be unique, found duplicates for `{lf.name}`"
                )
            by_name[lf.name] = lf
        self.leaves = by_name

        # tag fields (default_mapper.rs:120-131,170-189)
        seen_tags: list[str] = []
        for tag in tag_fields:
            if tag in seen_tags:
                raise ValueError(f"Duplicated tag field: `{tag}`")
            lf = by_name.get(tag)
            if lf is None:
                raise ValueError(f"Unknown tag field: `{tag}`")
            if lf.entry.type == "bytes":
                raise ValueError("Tags collection is not allowed on `bytes` fields.")
            if lf.entry.type == "text" and lf.entry.tokenizer != "raw":
                raise ValueError(
                    "Tags collection is only allowed on text fields with the "
                    "`raw` tokenizer."
                )
            seen_tags.append(tag)
        if demux_field is not None and demux_field not in seen_tags:
            # demux auto-added to tags (default_mapper.rs:131-139)
            seen_tags.append(demux_field)
        self.tag_fields = tuple(seen_tags)

        # timestamp (resolve_timestamp_field, default_mapper.rs:209-245)
        if timestamp_field is not None:
            lf = by_name.get(timestamp_field)
            if lf is None:
                raise ValueError(f"Unknown timestamp field: `{timestamp_field}`")
            if not lf.entry.fast:
                raise ValueError(
                    "Timestamp field must be a fast field, please add the fast "
                    f"property to your field `{timestamp_field}`."
                )
            if lf.entry.array:
                raise ValueError(
                    "Timestamp field cannot be an array, please change your "
                    f"field `{timestamp_field}` from an array to a single value."
                )
            if lf.entry.type not in ("i64", "date"):
                # our engine accepts date here too (ts_epoch is derived); the
                # reference restricts to i64 (default_mapper.rs:224-243)
                raise ValueError(
                    "Timestamp field must be of type i64, please change your "
                    f"field type `{timestamp_field}` to i64."
                )

        # sort_by (resolve_sort_field, default_mapper.rs:247-267)
        if sort_by_field is not None:
            lf = by_name.get(sort_by_field)
            if lf is None:
                raise ValueError(f"Unknown sort by field: `{sort_by_field}`")
            if not lf.entry.fast:
                raise ValueError(
                    "Sort by field must be a fast field, please add the fast "
                    f"property to your field `{sort_by_field}`."
                )
            if lf.entry.type == "f64":
                # the sort contract is integer-class fast fields (the
                # reference sorts u64 fast-field values, collector.rs:47-64)
                raise ValueError(
                    f"Sort by field `{sort_by_field}` cannot be f64: sorting "
                    "uses integer-class fast fields (u64 contract)."
                )

        # demux (resolve_demux_field, default_mapper.rs:269-312)
        if demux_field is not None:
            lf = by_name.get(demux_field)
            if lf is None:
                raise ValueError(f"Unknown demux field: `{demux_field}`")
            if not lf.entry.fast:
                raise ValueError(
                    "Demux field must be a fast field, please add the fast "
                    f"property to your field `{demux_field}`."
                )
            if not lf.entry.indexed:
                raise ValueError(
                    "Demux field must be indexed, please add the indexed "
                    f"property to your field `{demux_field}`."
                )
            if lf.entry.array:
                raise ValueError(
                    "Demux field cannot be an array, please change your field "
                    f"`{demux_field}` from an array to a single value."
                )
            if lf.entry.type not in ("u64", "i64"):
                raise ValueError(
                    "Demux field must be of type u64 or i64, please change "
                    f"your field type `{demux_field}` to u64 or i64."
                )

        for f in self.default_search_fields:
            lf = by_name.get(f)
            if lf is None:
                raise ValueError(f"Unknown default search field: `{f}`")
            if not lf.entry.indexed:
                raise ValueError(f"Default search field `{f}` is not indexed.")

        self.fast_leaves = [lf for lf in leaves if lf.entry.fast]

    # -- serialization -------------------------------------------------------

    @staticmethod
    def from_dict(d: dict) -> "DocMapper":
        return DocMapper(
            tuple(FieldEntry.from_dict(m) for m in d.get("field_mappings", [])),
            default_search_fields=tuple(d.get("default_search_fields", ())),
            timestamp_field=d.get("timestamp_field"),
            tag_fields=tuple(d.get("tag_fields", ())),
            sort_by_field=(d.get("sort_by") or {}).get("field_name")
            if isinstance(d.get("sort_by"), dict)
            else d.get("sort_by_field"),
            sort_by_order=(d.get("sort_by") or {}).get("order", "desc")
            if isinstance(d.get("sort_by"), dict)
            else d.get("sort_by_order", "desc"),
            demux_field=d.get("demux_field"),
            store_source=d.get("store_source", False),
        )

    def to_dict(self) -> dict:
        return {
            "field_mappings": [m.to_dict() for m in self.field_mappings],
            "default_search_fields": list(self.default_search_fields),
            "timestamp_field": self.timestamp_field,
            "tag_fields": list(self.tag_fields),
            "sort_by_field": self.sort_by_field,
            "sort_by_order": self.sort_by_order,
            "demux_field": self.demux_field,
            "store_source": self.store_source,
        }

    # -- doc parsing ----------------------------------------------------------

    def doc_from_json(self, doc_json: str) -> dict[str, list]:
        """JSON line → {flattened leaf name: [typed values]}.  Raises
        DocParsingError with the reference taxonomy (doc_from_json,
        default_mapper.rs:410-437)."""
        try:
            obj = json.loads(doc_json)
        except (ValueError, TypeError):
            raise DocParsingError.not_json(doc_json[:20]) from None
        out: dict[str, list] = {}
        _parse_object(self.field_mappings, "", obj, out, "")
        # check_fast_field_in_doc (default_mapper.rs:375-389)
        for lf in self.fast_leaves:
            if lf.name not in out:
                raise DocParsingError.required_fast_field(lf.name)
        return out


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

_SPARK_SCALAR = {
    "text": "string",
    "i64": "long",
    "u64": "long",  # engine representation; full-u64 values above 2^63-1
    # pass doc_from_json (reference range) but parse_ndjson classifies them
    # as that doc's value_error — Arrow/Spark have no u64 column type
    "f64": "double",
    "date": "timestamp",
    "bytes": "binary",
}


def leaf_spark_type(entry: FieldEntry) -> str:
    base = _SPARK_SCALAR[entry.type]
    return f"array<{base}>" if entry.array else base


def spark_struct_type(mapper: DocMapper):
    """Flattened output StructType of parse_ndjson: one column per stored
    leaf (dotted name) + _parse_error."""
    from pyspark.sql.types import StructType

    ddl = ", ".join(
        f"`{lf.name}` {leaf_spark_type(lf.entry)}" for lf in mapper.leaves.values()
    )
    ddl = (ddl + ", " if ddl else "") + "`_parse_error` string"
    return StructType.fromDDL(ddl)


def parse_ndjson(df, mapper: DocMapper, with_identity: bool = False):
    """DataFrame with one JSON-line column (first column) → one typed column
    per leaf (dotted names) + ``_parse_error`` (null when the doc parsed;
    else 'kind:field').  Arrow-batched mapInPandas; docs whose parse fails
    keep all-null leaves so the caller can count/route them (the
    IndexerCounters analog, indexer.rs:38-62).

    ``with_identity`` adds a ``_doc_key`` column — the md5 hex of the raw
    line — a deterministic content-addressed doc identity (pure function of
    the data, never of task scheduling: the stable-docID invariant,
    SURVEY.md §7) for corpora without a natural key."""
    import pandas as pd

    from pyspark.sql.types import StringType, StructField

    schema = spark_struct_type(mapper)
    if with_identity:
        schema = schema.add(StructField("_doc_key", StringType()))
    leaves = list(mapper.leaves.values())
    names = [lf.name for lf in leaves]
    multi = {lf.name for lf in leaves if lf.entry.array}
    u64_names = [lf.name for lf in leaves if lf.entry.type == "u64"]
    mapper_dict = mapper.to_dict()
    json_col = df.columns[0]

    def run(batches) -> Iterator["pd.DataFrame"]:
        import hashlib

        m = DocMapper.from_dict(mapper_dict)
        cols = names + ["_parse_error"] + (["_doc_key"] if with_identity else [])
        for pdf in batches:
            rows = []
            for line in pdf[json_col]:
                rec: dict[str, Any] = {}
                try:
                    vals = m.doc_from_json(line if isinstance(line, str) else "")
                    # engine range guard: the u64 column is int64-backed
                    # (Arrow/Spark have no u64) — a full-range u64 value must
                    # classify as this DOC's error, not crash the Arrow batch
                    for n in u64_names:
                        for v in vals.get(n, ()):
                            if v > I64_MAX:
                                raise DocParsingError.value_error(
                                    n,
                                    f"u64 value {v} exceeds the engine's "
                                    "int64-backed fast/stored range",
                                )
                    for n in names:
                        got = vals.get(n)
                        if n in multi:
                            rec[n] = got if got else None
                        else:
                            rec[n] = got[0] if got else None
                    rec["_parse_error"] = None
                except DocParsingError as e:
                    rec = {n: None for n in names}
                    rec["_parse_error"] = f"{e.kind}:{e.field}"
                if with_identity:
                    rec["_doc_key"] = hashlib.md5(
                        (line if isinstance(line, str) else "").encode()
                    ).hexdigest()
                rows.append(rec)
            yield pd.DataFrame(rows, columns=cols)

    return df.mapInPandas(run, schema)


def load_doc_mapper(path: str) -> DocMapper:
    """Load a doc-mapper config file (JSON; YAML when PyYAML is present) —
    the index-config doc_mapping section of the reference CLI."""
    with open(path) as f:
        raw = f.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml  # type: ignore[import-not-found]
        except ImportError as e:
            raise ValueError("YAML config requires PyYAML; use JSON instead") from e
        return DocMapper.from_dict(yaml.safe_load(raw))
    return DocMapper.from_dict(json.loads(raw))
