"""Index configuration — the doc-mapper / indexing-settings surface of the
reference (quickwit-doc-mapper/src/default_doc_mapper/*,
quickwit-config/src/index_config.rs), reduced to what a Spark-native engine
needs.

A ``FieldMapping`` mirrors the reference FieldMappingEntry
(field_mapping_entry.rs:43-48): name, type (scalar or ``array<T>``),
tokenizer (text only), record option, fast/stored/indexed flags.  Nested
``object`` mappings are flattened to dotted leaf names by
``IndexConfig.from_doc_mapper`` (FieldPath analog,
field_mapping_entry.rs:445-470) — the engine works on flat leaves.

Validation rules mirror the reference:

* timestamp_field must be a fast single-valued i64/date field
  (default_mapper.rs:208-245)
* tag fields must be raw-tokenized text (default_mapper.rs:170-189)
* text fields cannot be fast (field_mapping_entry.rs:596-601)

Engine-specific restrictions (documented divergences):

* ``fast`` on bytes or array fields is rejected (the reference allows
  both; our fast-field store is scalar int64/float64 columns)
* non-text fields default to ``indexed=False`` (reference default is
  true); an indexed numeric/date/bytes field is term-indexed by its
  canonical string (exact-value match), which is what the reference's
  numeric term queries do, but indexing every distinct timestamp of a
  transcript corpus by default would bloat postings — mapper-driven
  configs carry the flag explicitly either way
"""

from __future__ import annotations

from dataclasses import dataclass, field

SCALAR_FIELD_TYPES = ("text", "i64", "u64", "f64", "date", "datetime", "bytes")


@dataclass(frozen=True)
class FieldMapping:
    name: str
    type: str  # text | i64 | u64 | f64 | date | bytes | array<T>
    tokenizer: str = "default"  # text only: default | raw | stem_en
    record: str = "basic"  # basic | freq | position
    fast: bool = False
    stored: bool = True
    indexed: bool | None = None  # None → text: True, non-text: False

    @property
    def is_array(self) -> bool:
        return self.type.startswith("array<") and self.type.endswith(">")

    @property
    def scalar_type(self) -> str:
        """'datetime' normalizes to 'date' (both accepted on input)."""
        t = self.type[6:-1] if self.is_array else self.type
        return "date" if t == "datetime" else t

    @property
    def is_indexed(self) -> bool:
        if self.indexed is not None:
            return self.indexed
        return self.scalar_type == "text"

    def __post_init__(self):
        st = self.scalar_type
        if st not in ("text", "i64", "u64", "f64", "date", "bytes"):
            raise ValueError(f"field {self.name}: unknown type {self.type!r}")
        if st == "text" and self.fast:
            raise ValueError(
                f"field {self.name}: fast is not supported for text "
                "(reference field_mapping_entry.rs:596-601)"
            )
        if self.fast and self.is_array:
            raise ValueError(
                f"field {self.name}: fast array fields are not supported by "
                "this engine (scalar fast columns only)"
            )
        if self.fast and st == "bytes":
            raise ValueError(
                f"field {self.name}: fast bytes fields are not supported by "
                "this engine"
            )
        if self.tokenizer not in ("default", "raw", "stem_en"):
            raise ValueError(f"field {self.name}: unknown tokenizer {self.tokenizer!r}")
        if self.record not in ("basic", "freq", "position"):
            raise ValueError(f"field {self.name}: unknown record option {self.record!r}")


# internal plumbing columns every index carries (doc identity, order, time)
PLUMBING_COLS = ("doc_id", "conv_id", "turn_idx", "ts", "ts_epoch")


@dataclass(frozen=True)
class IndexConfig:
    index_id: str
    field_mappings: tuple[FieldMapping, ...]
    timestamp_field: str | None = None
    tag_fields: tuple[str, ...] = ()
    default_search_fields: tuple[str, ...] = ()
    # scaled-down defaults (reference: 10M docs/split, index_config.rs:161-163;
    # merge factor 10/12, index_config.rs:103-109)
    split_num_docs_target: int = 5_000
    segment_num_docs_target: int = 1_000
    merge_factor: int = 3
    max_merge_factor: int = 4
    # reference packager caps tag cardinality at 1000 (packager.rs:36-40)
    max_values_per_tag_field: int = 1_000
    # phase-2 posting reduce: terms are hashed into this many buckets per
    # split so each applyInPandas call amortizes pandas/Arrow overhead over
    # thousands of terms (and hot terms spread across buckets)
    term_merge_buckets: int = 32
    # reference store_source (index_config.rs:49, default_mapper.rs:428-435):
    # when true, every hit carries a reserved `_source` field. The reference
    # stores the raw input JSON; our canonical input is a typed table, so
    # `_source` is the canonical RFC-3339 JSON of the stored columns
    # (schema-mapped fields only — unknown input fields were already dropped
    # at projection, default_mapper.rs:582-595)
    store_source: bool = False
    # index-level default sort (doc_mapper.rs:61-63: default SortBy::DocId;
    # default_mapper.rs:247-267: a declared sort_by field must be fast).
    # None → BM25 relevance order (north rule); requests with an explicit
    # sort_by_field always win over this default.
    sort_by_field: str | None = None
    sort_by_order: str = "desc"
    # split-build postings spill threshold: when a build task's accumulated
    # encoded-postings payload exceeds this many MiB, the accumulator flushes
    # a sorted partial run to executor-local scratch and finish() streams a
    # k-way merge of the runs into the final postings file — the shuffle-
    # spill analog that bounds per-task memory by this knob instead of by
    # split size (a fresh build at the reference's 10M-doc split target,
    # index_config.rs:161-163, would otherwise hold the whole split's
    # postings resident).  <= 0 forces a spill after every chunk (tests).
    builder_spill_mb: int = 768
    # when this config came from a general DocMapper (docmapper.py), the
    # nested mapper serialized as JSON (string keeps the frozen dataclass
    # hashable) — ingest paths re-hydrate it to parse/validate NDJSON with
    # the full nested-object/array semantics the flat leaves can't express
    doc_mapper_json: str | None = None

    def __post_init__(self):
        by_name = {m.name: m for m in self.field_mappings}
        if len(by_name) != len(self.field_mappings):
            names = [m.name for m in self.field_mappings]
            dupes = sorted({n for n in names if names.count(n) > 1})
            raise ValueError(f"duplicate field mappings: {dupes}")
        if self.max_merge_factor < self.merge_factor:
            raise ValueError(
                "max_merge_factor must be >= merge_factor "
                "(reference index_config.rs:292-299)"
            )
        if self.sort_by_field is not None:
            sb = by_name.get(self.sort_by_field)
            if sb is None or not sb.fast:
                raise ValueError(
                    "sort_by field must be a declared fast field "
                    "(reference default_mapper.rs:247-267)"
                )
        if self.sort_by_order not in ("asc", "desc"):
            raise ValueError("sort_by_order must be 'asc' or 'desc'")
        if self.timestamp_field is not None:
            ts = by_name.get(self.timestamp_field)
            if (
                ts is None
                or ts.scalar_type not in ("i64", "u64", "date")
                or ts.is_array
                or not ts.fast
            ):
                raise ValueError(
                    "timestamp_field must be a fast single-valued i64/date "
                    "field (reference default_mapper.rs:208-245)"
                )
        for tag in self.tag_fields:
            tm = by_name.get(tag)
            # reference tag rules (default_mapper.rs:170-189): bytes never;
            # text only with the raw tokenizer; numeric/date tags allowed
            # (a demux field is auto-added to tags and is u64/i64) — their
            # tag values are the canonical term strings
            if (
                tm is None
                or tm.scalar_type == "bytes"
                or (tm.scalar_type == "text" and tm.tokenizer != "raw")
                or not tm.is_indexed
            ):
                raise ValueError(
                    f"tag field {tag} must be an indexed raw-text or "
                    "numeric/date field (reference default_mapper.rs:170-189)"
                )
        for f in self.default_search_fields:
            if f not in by_name:
                raise ValueError(f"default search field {f} not in schema")

    @property
    def fields(self) -> dict[str, FieldMapping]:
        return {m.name: m for m in self.field_mappings}

    @property
    def indexed_text_fields(self) -> list[FieldMapping]:
        return [
            m for m in self.field_mappings if m.scalar_type == "text" and m.is_indexed
        ]

    @property
    def tokenized_text_fields(self) -> tuple[str, ...]:
        """Indexed text fields with real tokenization (default / stem_en)."""
        return tuple(
            m.name for m in self.indexed_text_fields if m.tokenizer != "raw"
        )

    @property
    def lens_tracked_fields(self) -> tuple[str, ...]:
        """Every indexed field except the legacy ``text`` column keeps a
        per-doc length blob in the fastfields table (doc_lens_<name>):
        tantivy's fieldnorm counts TOKENS — for raw/typed fields that is
        the number of values (1 for scalars, n for arrays) — and both BM25
        scoring and the WAND block bounds must use the same lengths."""
        return tuple(
            m.name
            for m in self.field_mappings
            if m.is_indexed and m.name != "text"
        )

    @property
    def indexed_typed_fields(self) -> list[FieldMapping]:
        """Non-text indexed leaves: term-indexed by canonical string value
        (exact-value match — the reference's numeric term queries)."""
        return [
            m
            for m in self.field_mappings
            if m.scalar_type != "text" and m.is_indexed
        ]

    @property
    def extra_fast_fields(self) -> tuple[str, ...]:
        """fast i64/u64/date fields beyond the timestamp — materialized as
        per-segment int64 columns in the fastfields table (sortable /
        exportable, reference collector.rs:47-64).  date values are epoch
        microseconds."""
        return tuple(
            m.name
            for m in self.field_mappings
            if m.fast
            and m.scalar_type in ("i64", "u64", "date")
            and m.name != self.timestamp_field
        )

    @property
    def extra_fast_float_fields(self) -> tuple[str, ...]:
        """fast f64 fields — float64 fastfield columns (exportable; sorting
        keeps the reference's u64-fast-field contract, collector.rs:47-64)."""
        return tuple(
            m.name for m in self.field_mappings if m.fast and m.scalar_type == "f64"
        )

    @property
    def stored_extra_fields(self) -> list[FieldMapping]:
        """Stored schema fields beyond the plumbing columns, in mapping
        order — these become extra doc-store columns."""
        return [
            m
            for m in self.field_mappings
            if m.stored and m.name not in ("conv_id", "turn_idx", "ts")
        ]

    def doc_cols(self) -> list[str]:
        """Doc-store column order: plumbing identity, stored schema fields,
        time columns."""
        return (
            ["doc_id", "conv_id", "turn_idx"]
            + [m.name for m in self.stored_extra_fields]
            + ["ts", "ts_epoch"]
        )

    def to_dict(self) -> dict:
        return {
            "index_id": self.index_id,
            "field_mappings": [vars(m).copy() for m in self.field_mappings],
            "timestamp_field": self.timestamp_field,
            "tag_fields": list(self.tag_fields),
            "default_search_fields": list(self.default_search_fields),
            "split_num_docs_target": self.split_num_docs_target,
            "segment_num_docs_target": self.segment_num_docs_target,
            "merge_factor": self.merge_factor,
            "max_merge_factor": self.max_merge_factor,
            "max_values_per_tag_field": self.max_values_per_tag_field,
            "term_merge_buckets": self.term_merge_buckets,
            "store_source": self.store_source,
            "sort_by_field": self.sort_by_field,
            "sort_by_order": self.sort_by_order,
            "builder_spill_mb": self.builder_spill_mb,
            **(
                {"doc_mapper_json": self.doc_mapper_json}
                if self.doc_mapper_json is not None
                else {}
            ),
        }

    @staticmethod
    def from_dict(d: dict) -> "IndexConfig":
        # loading a PERSISTED catalog must never raise on shapes that were
        # valid when written: configs stored before the merge-factor rule
        # existed may carry max_merge_factor < merge_factor — clamp up
        # instead of bricking every open of an existing index (strict
        # validation applies to user-supplied configs at create time)
        mf = d.get("merge_factor", 3)
        return IndexConfig(
            index_id=d["index_id"],
            field_mappings=tuple(FieldMapping(**m) for m in d["field_mappings"]),
            timestamp_field=d.get("timestamp_field"),
            tag_fields=tuple(d.get("tag_fields", ())),
            default_search_fields=tuple(d.get("default_search_fields", ())),
            split_num_docs_target=d.get("split_num_docs_target", 5_000),
            segment_num_docs_target=d.get("segment_num_docs_target", 1_000),
            merge_factor=mf,
            max_merge_factor=max(d.get("max_merge_factor", 4), mf),
            max_values_per_tag_field=d.get("max_values_per_tag_field", 1_000),
            term_merge_buckets=d.get("term_merge_buckets", 32),
            store_source=d.get("store_source", False),
            sort_by_field=d.get("sort_by_field"),
            sort_by_order=d.get("sort_by_order", "desc"),
            builder_spill_mb=d.get("builder_spill_mb", 768),
            doc_mapper_json=d.get("doc_mapper_json"),
        )

    @staticmethod
    def from_doc_mapper(mapper, index_id: str, **overrides) -> "IndexConfig":
        """Flatten a general DocMapper (docmapper.py) into the engine's
        leaf-level config: nested object fields become dotted leaf names,
        tokenizer/record/fast/stored/indexed flags carry over.

        Leaf names that collide with the engine's synthesized plumbing
        columns are rejected loudly — the generic build derives doc
        identity/order/time itself, so a user leaf named e.g. ``ts`` would
        otherwise produce ambiguous duplicate columns downstream."""
        reserved = set(PLUMBING_COLS) | {"split_id", "split_ord", "part_key"}
        for name in mapper.leaves:
            if name in reserved:
                raise ValueError(
                    f"field name {name!r} is reserved by the engine "
                    f"(plumbing columns: {sorted(reserved)}); rename the "
                    "field in your doc mapping"
                )
        mappings = []
        for lf in mapper.leaves.values():
            e = lf.entry
            mappings.append(
                FieldMapping(
                    name=lf.name,
                    type=f"array<{e.type}>" if e.array else e.type,
                    tokenizer=e.tokenizer or "default",
                    record=e.record or "basic",
                    fast=e.fast,
                    stored=e.stored,
                    indexed=e.indexed,
                )
            )
        import json as _json

        defaults = dict(
            index_id=index_id,
            field_mappings=tuple(mappings),
            timestamp_field=mapper.timestamp_field,
            tag_fields=tuple(mapper.tag_fields),
            default_search_fields=tuple(mapper.default_search_fields),
            store_source=mapper.store_source,
            sort_by_field=mapper.sort_by_field,
            sort_by_order=mapper.sort_by_order,
            doc_mapper_json=_json.dumps(mapper.to_dict(), sort_keys=True),
        )
        defaults.update(overrides)
        return IndexConfig(**defaults)  # type: ignore[arg-type]


def load_config(path: str) -> IndexConfig:
    """Load an index config file — the index-config-uri of the reference CLI
    (`quickwit index create --index-config-uri`, docs/reference/index-config.md).
    JSON always; YAML when PyYAML is importable.  Three accepted shapes:

    1. the engine's own flat ``IndexConfig.to_dict()`` (what catalog.json
       embeds);
    2. the REFERENCE index-config file: ``{version, index_id, doc_mapping:
       {field_mappings, tag_fields, store_source}, search_settings:
       {default_search_fields}, indexing_settings: {timestamp_field,
       split_num_docs_target, merge_policy...}}`` — nested objects and
       arrays included (docs/reference/index-config.md:24-162);
    3. a bare DocMapper dict (docmapper.py shape, nested mappings).
    """
    import json

    with open(path) as f:
        raw = f.read()
    if path.endswith((".yaml", ".yml")):
        try:
            import yaml  # type: ignore[import-not-found]
        except ImportError as e:
            raise ValueError("YAML config requires PyYAML; use JSON instead") from e
        d = yaml.safe_load(raw)
    else:
        d = json.loads(raw)
    return config_from_any(d)


def config_from_any(d: dict) -> IndexConfig:
    """Dict of any accepted config shape (see load_config) → IndexConfig."""
    from .docmapper import DocMapper

    if "doc_mapping" in d:  # reference index-config file format
        dm = dict(d["doc_mapping"])
        search = d.get("search_settings", {}) or {}
        indexing = d.get("indexing_settings", {}) or {}
        if "default_search_fields" in search:
            dm["default_search_fields"] = search["default_search_fields"]
        # reference puts timestamp_field under indexing_settings
        if "timestamp_field" in indexing and "timestamp_field" not in dm:
            dm["timestamp_field"] = indexing["timestamp_field"]
        if "demux_field" in indexing and "demux_field" not in dm:
            dm["demux_field"] = indexing["demux_field"]
        mapper = DocMapper.from_dict(dm)
        knobs = {}
        for k in ("split_num_docs_target", "segment_num_docs_target"):
            if k in indexing:
                knobs[k] = indexing[k]
        mp = indexing.get("merge_policy", {}) or {}
        if "merge_factor" in mp:
            knobs["merge_factor"] = mp["merge_factor"]
        if "max_merge_factor" in mp:
            knobs["max_merge_factor"] = mp["max_merge_factor"]
        return IndexConfig.from_doc_mapper(mapper, d.get("index_id", "index"), **knobs)
    # The engine's own flat IndexConfig.to_dict() (what catalog.json embeds)
    # is recognized by its knob keys — DocMapper.to_dict() never emits any
    # of these.  It must NOT fall into the DocMapper branch: its per-field
    # dicts carry tokenizer/record defaults on non-text fields (which
    # FieldEntry.from_dict rejects), and the DocMapper round-trip would
    # silently drop split/segment/merge/spill knobs.  Note flat configs
    # support array<T> fields too, so 'array<' alone is NOT a DocMapper
    # marker.
    engine_knobs = {
        "split_num_docs_target", "segment_num_docs_target",
        "merge_factor", "max_merge_factor", "max_values_per_tag_field",
        "term_merge_buckets", "builder_spill_mb", "doc_mapper_json",
    }
    if engine_knobs & set(d):
        return IndexConfig.from_dict(d)
    mappings = d.get("field_mappings", [])
    nested = any(
        m.get("type") == "object"
        or "field_mappings" in m
        or str(m.get("type", "")).startswith("array<")
        for m in mappings
    )
    if nested:  # bare DocMapper dict
        mapper = DocMapper.from_dict(d)
        return IndexConfig.from_doc_mapper(mapper, d.get("index_id", "index"))
    return IndexConfig.from_dict(d)


def transcripts_config(**overrides) -> IndexConfig:
    """The FIXTURES.md F2 config: transcripts (conv_id, turn_idx, role, text, tool, ts)."""
    defaults = dict(
        index_id="transcripts",
        field_mappings=(
            FieldMapping("text", "text", tokenizer="default", record="position"),
            FieldMapping("role", "text", tokenizer="raw"),
            FieldMapping("tool", "text", tokenizer="raw"),
            FieldMapping("conv_id", "text", tokenizer="raw"),
            FieldMapping("turn_idx", "i64", fast=True),
            FieldMapping("ts", "i64", fast=True),
        ),
        timestamp_field="ts",
        tag_fields=("role",),
        default_search_fields=("text",),
    )
    defaults.update(overrides)
    return IndexConfig(**defaults)  # type: ignore[arg-type]


def documents_config(**overrides) -> IndexConfig:
    """Config for the driver's /root/testdata documents table
    (doc_id, text, lang, source, n_chars) recast as transcript turns."""
    defaults = dict(
        index_id="documents",
        field_mappings=(
            FieldMapping("text", "text", tokenizer="default", record="position"),
            FieldMapping("role", "text", tokenizer="raw"),  # carries `lang`
            FieldMapping("tool", "text", tokenizer="raw"),  # carries `source`
            FieldMapping("conv_id", "text", tokenizer="raw"),
            FieldMapping("turn_idx", "i64", fast=True),
            FieldMapping("ts", "i64", fast=True),  # carries doc_id (no real ts)
        ),
        timestamp_field="ts",
        tag_fields=("role",),
        default_search_fields=("text",),
        split_num_docs_target=200,
        segment_num_docs_target=64,
    )
    defaults.update(overrides)
    return IndexConfig(**defaults)  # type: ignore[arg-type]
