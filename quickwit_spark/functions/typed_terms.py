"""Canonical term strings for indexed non-text fields.

The reference indexes numeric/date/bytes fields as exact-value terms
(tantivy term = the binary-encoded value; queries bind a value term via
the doc mapper, quickwit-doc-mapper/src/query_builder.rs).  Our postings
table keys terms by string, so every typed value has ONE canonical string
form used identically at index build and at query bind:

* i64 / u64 — base-10 integer string
* f64       — python ``repr`` of the float (shortest round-trip form)
* date      — UTC RFC-3339 ``YYYY-MM-DDTHH:MM:SS[.ffffff]Z``
* bytes     — standard base64
"""

from __future__ import annotations

import base64
import re
from datetime import datetime, timezone


def canonical_date(dt: datetime) -> str:
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    dt = dt.astimezone(timezone.utc)
    s = dt.strftime("%Y-%m-%dT%H:%M:%S")
    if dt.microsecond:
        s += f".{dt.microsecond:06d}"
    return s + "Z"


def canonical_value(scalar_type: str, v) -> str:
    """One typed python value → its canonical term string."""
    if scalar_type in ("i64", "u64"):
        return str(int(v))
    if scalar_type == "f64":
        return repr(float(v))
    if scalar_type == "date":
        return canonical_date(v)
    if scalar_type == "bytes":
        return base64.b64encode(bytes(v)).decode("ascii")
    raise ValueError(f"not a typed scalar: {scalar_type}")


def canonical_query_term(scalar_type: str, text: str) -> str:
    """A query-string term → the canonical term for the field's type.
    Raises ValueError when the text cannot be a value of that type (the
    reference rejects type-incompatible query terms at bind time)."""
    if scalar_type in ("i64", "u64"):
        # strict ASCII integer syntax: Python int() also accepts '1_0',
        # surrounding whitespace, '+5', and Unicode digits — all of which
        # the reference rejects at bind time
        if not re.fullmatch(r"-?[0-9]+", text):
            raise ValueError(f"not an integer literal: {text!r}")
        v = int(text)
        if scalar_type == "u64" and v < 0:
            raise ValueError(f"negative value for u64 field: {text}")
        return str(v)
    if scalar_type == "f64":
        # same strictness: no whitespace/underscores (Rust's f64 parser
        # accepts inf/infinity/NaN spellings but neither of those)
        if not re.fullmatch(
            r"[+-]?(inf(inity)?|nan|[0-9]+(\.[0-9]*)?([eE][+-]?[0-9]+)?"
            r"|\.[0-9]+([eE][+-]?[0-9]+)?)",
            text,
            re.IGNORECASE,
        ):
            raise ValueError(f"not a float literal: {text!r}")
        return repr(float(text))
    if scalar_type == "date":
        from ..docmapper import parse_rfc3339

        return canonical_date(parse_rfc3339(text))
    if scalar_type == "bytes":
        return base64.b64encode(base64.b64decode(text, validate=True)).decode("ascii")
    raise ValueError(f"not a typed scalar: {scalar_type}")
