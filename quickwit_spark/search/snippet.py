"""Snippet / highlight generation for search hits.

Beyond-reference: the reference engine (ddelemeny/quickwit ~v0.2) returns
stored fields only — no snippets anywhere in quickwit-search.  This module
adds the tantivy-SnippetGenerator-style surface users expect from a search
engine, with deliberately simple, deterministic semantics:

* the hit's stored text is re-tokenized with the SAME definition as the
  index (alphanumeric runs of 1..40 chars — functions/tokenizer.py), but
  keeping char spans into the ORIGINAL string, so highlights preserve case
  and punctuation;
* a document token matches when its processed form (lowercased, stemmed for
  ``stem_en`` fields) equals any positive query term for that field — the
  exact set BM25 scores (parser.positive_terms), so phrases highlight their
  words and NOT-clauses never highlight;
* fragments greedily pack consecutive tokens while the span from the
  fragment's first token start to the candidate token end stays within
  ``max_chars``;
* the best fragment wins by (distinct matched terms, matched occurrences,
  earliest start) — ties resolve to the earliest, so output is stable;
* matched tokens inside the winning fragment are wrapped in ``<b></b>``
  (the tantivy default tag).

Scale: snippets are generated DRIVER-SIDE for the final page only (at most
offset+k hits, after the distributed top-k merge) — never in the leaf — so
the cost is O(k * |text|) regardless of corpus size or split count.
Per-row Python is explicitly fine here; this is not a hot path.
"""

from __future__ import annotations

import re

from ..config import IndexConfig
from ..functions.stemmer import stem_cached
from .parser import positive_terms

# Case-preserving twin of tokenizer._TOKEN_RE: same alphanumeric-run
# definition (1..40 chars, longer runs match nowhere), but over the
# original-case text so spans index into the stored string.
_TOKEN_SPAN_RE = re.compile(r"(?<![0-9A-Za-z])[0-9A-Za-z]{1,40}(?![0-9A-Za-z])")

HIGHLIGHT_OPEN = "<b>"
HIGHLIGHT_CLOSE = "</b>"


def _token_spans(text: str):
    """Yield (start, end, lowercased_token) over the original string."""
    for m in _TOKEN_SPAN_RE.finditer(text):
        yield m.start(), m.end(), m.group(0).lower()


def generate_snippet(
    text: str,
    terms: set[str],
    max_chars: int = 150,
    stem: bool = False,
) -> str | None:
    """Best highlighted fragment of ``text`` for the processed query
    ``terms`` (post-stem forms when ``stem``), or None when nothing
    matches.  Deterministic: see module docstring for the fragment spec."""
    if not text or not terms:
        return None
    spans = list(_token_spans(text))
    if not spans:
        return None
    matched = [
        (s, e, tok)
        for s, e, tok in spans
        if (stem_cached(tok) if stem else tok) in terms
    ]
    if not matched:
        return None

    # greedy fragmentation over ALL tokens: a fragment accumulates tokens
    # while (token_end - fragment_start) <= max_chars; overflow starts a
    # new fragment at that token
    fragments: list[tuple[int, int]] = []  # (char_start, char_end)
    frag_start = spans[0][0]
    frag_end = spans[0][1]
    for s, e, _ in spans[1:]:
        if e - frag_start <= max_chars:
            frag_end = e
        else:
            fragments.append((frag_start, frag_end))
            frag_start, frag_end = s, e
    fragments.append((frag_start, frag_end))

    def frag_score(fs: int, fe: int) -> tuple[int, int]:
        hits = [(s, e, t) for s, e, t in matched if s >= fs and e <= fe]
        distinct = len({(stem_cached(t) if stem else t) for _, _, t in hits})
        return distinct, len(hits)

    best = max(
        fragments,
        key=lambda f: (*frag_score(*f), -f[0]),  # earliest wins ties
    )
    if frag_score(*best) == (0, 0):
        return None
    fs, fe = best
    out: list[str] = []
    cursor = fs
    for s, e, _ in matched:
        if s < fs or e > fe:
            continue
        out.append(text[cursor:s])
        out.append(HIGHLIGHT_OPEN)
        out.append(text[s:e])
        out.append(HIGHLIGHT_CLOSE)
        cursor = e
    out.append(text[cursor:fe])
    return "".join(out)


def attach_snippets(
    config: IndexConfig,
    ast,
    hits: list[dict],
    fields: tuple[str, ...],
    max_chars: int = 150,
) -> None:
    """Mutate each hit dict, adding ``snippets: {field: fragment}`` for the
    requested stored text fields (fields with no match contribute no key;
    a hit with no matching field at all still gets an empty dict, so the
    response shape is uniform)."""
    by_field = config.fields
    terms_by_field: dict[str, set[str]] = {}
    for f, t in positive_terms(ast):
        terms_by_field.setdefault(f, set()).add(t)
    for field in fields:
        m = by_field.get(field)
        if m is None or m.scalar_type != "text" or m.tokenizer == "raw":
            raise ValueError(
                f"snippet field {field!r} is not a tokenized stored text field"
            )
        if not m.stored:
            raise ValueError(f"snippet field {field!r} is not stored")
    for hit in hits:
        snips: dict[str, str] = {}
        for field in fields:
            terms = terms_by_field.get(field)
            text = hit.get(field)
            if not terms or not isinstance(text, str):
                continue
            frag = generate_snippet(
                text,
                terms,
                max_chars=max_chars,
                stem=by_field[field].tokenizer == "stem_en",
            )
            if frag is not None:
                snips[field] = frag
        hit["snippets"] = snips
