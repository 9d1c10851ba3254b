"""Query parser — a small recursive-descent parser for the reference's query
language (docs/reference/query-language.md:8-42; semantics frozen against
quickwit-doc-mapper/src/query_builder.rs):

* terms, quoted phrases, field-scoped clauses ``field:term`` /
  ``field:(sub query)``, grouping parens
* ``AND`` is the default conjunction for bare clause sequences
  (query_builder.rs:47-48 sets default occur = Must)
* ``OR`` binds looser than the implicit/explicit AND
* ``NOT x`` / ``-x`` → must_not; ``+x`` → must (the default)
* range queries ``[a TO b]`` are **rejected** (query_builder.rs:36-39,53-66)
* default-field resolution: unscoped clauses search the request's
  search_fields or the config's default_search_fields
  (query_builder.rs:41-45,68-77)

Query terms are analyzed with the target field's tokenizer at parse-bind
time: a ``default``-tokenized field lowercases the term, and a multi-token
query term (e.g. ``spark-sql``) becomes a phrase if positions are recorded,
else a conjunction of its tokens.  ``raw`` fields match the exact value.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from ..config import IndexConfig
from ..functions.tokenizer import tokenize_text


class QueryParserError(ValueError):
    pass


@dataclass(frozen=True)
class TermQuery:
    field: str
    term: str


@dataclass(frozen=True)
class PhraseQuery:
    field: str
    terms: tuple[str, ...]


@dataclass
class BoolQuery:
    must: list = field(default_factory=list)
    should: list = field(default_factory=list)
    must_not: list = field(default_factory=list)


@dataclass(frozen=True)
class _RawClause:
    """Pre-binding clause: fieldless text until schema resolution."""
    field: str | None
    text: str
    phrase: bool = False


# -- lexer -------------------------------------------------------------------
#
# Backslash escaping (reference query-language.md "Escaping Special
# Characters"): ``\X`` makes X a literal term character — an escaped colon
# doesn't split field:term, an escaped space doesn't end the token, an
# escaped paren/quote/bracket has no syntax meaning.  The lexer re-encodes
# each escape as a sentinel byte + the literal char so later stages can tell
# syntax chars from escaped ones; ``_unescape`` strips the sentinels at
# clause-binding time.

_SPECIAL = set('()"')
_ESC = "\x00"  # cannot appear in a query string's text


def _unescape(t: str) -> str:
    return t.replace(_ESC, "")


def _find_unescaped(t: str, ch: str) -> int:
    i = 0
    while i < len(t):
        if t[i] == _ESC:
            i += 2
            continue
        if t[i] == ch:
            return i
        i += 1
    return -1


def _lex(q: str) -> list[str]:
    if _ESC in q:
        raise QueryParserError("query contains a NUL byte")
    tokens: list[str] = []
    i, n = 0, len(q)
    while i < n:
        c = q[i]
        if c.isspace():
            i += 1
        elif c == "\\":
            # token starting with an escape: fall through to word scanning
            i = _lex_word(q, i, tokens)
        elif c in "()":
            tokens.append(c)
            i += 1
        elif c == '"':
            j = i + 1
            body = []
            while j < n and q[j] != '"':
                if q[j] == "\\" and j + 1 < n:
                    body.append(_ESC + q[j + 1])
                    j += 2
                else:
                    body.append(q[j])
                    j += 1
            if j >= n:
                raise QueryParserError(f"unterminated phrase in query: {q!r}")
            tokens.append('"' + "".join(body) + '"')
            i = j + 1
        elif c == "[" or c == "{":
            raise QueryParserError(
                f"range queries are not supported (reference query_builder.rs:36-39): {q!r}"
            )
        elif c in "+-" and (i + 1 < n and not q[i + 1].isspace()):
            tokens.append(c)
            i += 1
        else:
            i = _lex_word(q, i, tokens)
    return tokens


def _lex_word(q: str, i: int, tokens: list[str]) -> int:
    n = len(q)
    j = i
    out = []
    while j < n:
        c = q[j]
        if c == "\\":
            if j + 1 < n:
                out.append(_ESC + q[j + 1])
                j += 2
            else:
                out.append(_ESC + "\\")  # trailing lone backslash: literal
                j += 1
            continue
        if c.isspace() or c in _SPECIAL:
            break
        if c == "[" or c == "{":
            raise QueryParserError(
                f"range queries are not supported (reference query_builder.rs:36-39): {q!r}"
            )
        # field:"phrase" — stop before the quote so it lexes separately
        if c == ":" and j + 1 < n and q[j + 1] == '"':
            out.append(c)
            j += 1
            break
        out.append(c)
        j += 1
    tokens.append("".join(out))
    return j


# -- parser ------------------------------------------------------------------


class _Parser:
    def __init__(self, tokens: list[str]):
        self.toks = tokens
        self.i = 0

    def peek(self) -> str | None:
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self) -> str:
        if self.i >= len(self.toks):
            # e.g. 'error NOT' / 'foo -' / '+' — a trailing operator with no
            # operand must be a parse error (HTTP 400), not an IndexError
            raise QueryParserError("unexpected end of query (dangling operator?)")
        t = self.toks[self.i]
        self.i += 1
        return t

    def parse_query(self):
        """query := and_group (OR and_group)*  — OR binds loosest."""
        groups = [self.parse_and_group()]
        while self.peek() == "OR":
            self.next()
            groups.append(self.parse_and_group())
        if len(groups) == 1:
            return groups[0]
        return BoolQuery(should=groups)

    def parse_and_group(self):
        """and_group := (AND? signed_clause)+  — implicit AND = Must."""
        node = BoolQuery()
        first = True
        while True:
            t = self.peek()
            if t is None or t == ")" or t == "OR":
                break
            if t == "AND":
                if first:
                    raise QueryParserError("query starts with AND")
                self.next()
                nxt = self.peek()
                if nxt is None or nxt == ")" or nxt == "OR":
                    raise QueryParserError("dangling AND with no right operand")
                continue
            sign, clause = self.parse_signed_clause()
            if sign == "-":
                node.must_not.append(clause)
            else:
                node.must.append(clause)
            first = False
        if not node.must and not node.must_not and not node.should:
            raise QueryParserError("empty query group")
        if not node.must and node.must_not:
            raise QueryParserError("pure-negation query is not supported")
        if len(node.must) == 1 and not node.must_not and not node.should:
            return node.must[0]
        return node

    def parse_signed_clause(self):
        t = self.peek()
        if t == "NOT":
            # negation COMPOSES with whatever sign the inner clause carries
            # ('NOT NOT x' requires x; swallowing the inner sign silently
            # inverted stacked negations)
            self.next()
            sign, clause = self.parse_signed_clause()
            return ("-" if sign == "+" else "+"), clause
        if t == "-":
            self.next()
            sign, clause = self.parse_signed_clause()
            return ("-" if sign == "+" else "+"), clause
        if t == "+":
            # '+' is a no-op marker: it keeps the inner sign ('+-x' == '-x')
            self.next()
            return self.parse_signed_clause()
        return "+", self.parse_clause(None)

    def parse_clause(self, bound_field: str | None):
        t = self.next()
        if t == "(":
            inner = self.parse_query()
            if self.peek() != ")":
                raise QueryParserError("unbalanced parens")
            self.next()
            return inner if bound_field is None else _bind_field(inner, bound_field)
        if t.startswith('"'):
            return _RawClause(bound_field, _unescape(t[1:-1]), phrase=True)
        colon = _find_unescaped(t, ":") if bound_field is None else -1
        if colon == len(t) - 1 and colon >= 0:
            fieldname = _unescape(t[:-1])
            if not fieldname:
                raise QueryParserError("empty field name")
            return self.parse_clause(fieldname)
        if colon >= 0:
            fieldname, text = _unescape(t[:colon]), t[colon + 1 :]
            if _find_unescaped(text, "[") >= 0 or _find_unescaped(text, "{") >= 0:
                raise QueryParserError("range queries are not supported")
            _reject_comparison(text)
            return _RawClause(fieldname, _unescape(text))
        _reject_comparison(t)
        return _RawClause(bound_field, _unescape(t))


def _reject_comparison(text: str) -> None:
    """``field:>foo`` / ``<=bar`` are range comparisons in the tantivy
    grammar and the reference rejects every range form
    (query_builder.rs:152-156 expects Err for ``title:>foo``); silently
    tokenizing away the operator would turn a range into a term match.
    Escaped operators (``\\>foo``) lex with the escape marker first and
    stay literal."""
    if text[:1] in (">", "<"):
        raise QueryParserError(
            "range queries are not supported (reference query_builder.rs:36-39)"
        )


def _bind_field(node, fieldname: str):
    """Fill in the group's field on clauses that don't carry their own.
    An explicitly scoped inner clause wins (tantivy's set_default_field
    only supplies missing fields, it never overrides one)."""
    if isinstance(node, _RawClause):
        if node.field is not None:
            return node
        return _RawClause(fieldname, node.text, node.phrase)
    if isinstance(node, BoolQuery):
        return BoolQuery(
            must=[_bind_field(c, fieldname) for c in node.must],
            should=[_bind_field(c, fieldname) for c in node.should],
            must_not=[_bind_field(c, fieldname) for c in node.must_not],
        )
    return node


# -- schema binding ------------------------------------------------------------


def _resolve(node, config: IndexConfig, default_fields: tuple[str, ...]):
    """Bind raw clauses to schema fields, analyzing terms with the field's
    tokenizer; expand unscoped clauses over the default search fields."""
    if isinstance(node, BoolQuery):
        return BoolQuery(
            must=[_resolve(c, config, default_fields) for c in node.must],
            should=[_resolve(c, config, default_fields) for c in node.should],
            must_not=[_resolve(c, config, default_fields) for c in node.must_not],
        )
    assert isinstance(node, _RawClause)
    if node.field is None:
        if not default_fields:
            raise QueryParserError("no default search field configured")
        alts = [
            _resolve(_RawClause(f, node.text, node.phrase), config, default_fields)
            for f in default_fields
        ]
        return alts[0] if len(alts) == 1 else BoolQuery(should=alts)
    fm = config.fields.get(node.field)
    if fm is None:
        raise QueryParserError(f"field does not exist in schema: {node.field}")
    if not fm.is_indexed:
        # stored/fast-only fields have no postings: fail at bind time like
        # tantivy's FieldNotIndexed instead of silently matching nothing
        raise QueryParserError(f"field is not indexed: {node.field}")
    if fm.scalar_type != "text":
        # typed term query (i64/u64/f64/date/bytes): exact value match on
        # the canonical term string (same form the build task indexed)
        from ..functions.typed_terms import canonical_query_term

        try:
            return TermQuery(node.field, canonical_query_term(fm.scalar_type, node.text))
        except ValueError as e:
            raise QueryParserError(
                f"invalid {fm.scalar_type} value for field {node.field}: {node.text!r}"
            ) from e
    if fm.tokenizer == "raw":
        return TermQuery(node.field, node.text)
    toks = tokenize_text(node.text)
    if fm.tokenizer == "stem_en":
        # query terms are analyzed with the same filter chain as documents
        # (tantivy TextAnalyzer semantics): tokenize, lowercase, stem
        from ..functions.stemmer import stem_cached

        toks = [stem_cached(t) for t in toks]
    if not toks:
        raise QueryParserError(f"query term analyzes to nothing: {node.text!r}")
    if node.phrase or len(toks) > 1:
        if len(toks) == 1:
            return TermQuery(node.field, toks[0])
        if fm.record != "position":
            raise QueryParserError(
                f"phrase query on field {node.field} requires record=position "
                "(reference docs/reference/index-config.md:123-142)"
            )
        return PhraseQuery(node.field, tuple(toks))
    return TermQuery(node.field, toks[0])


def parse_query(
    q: str, config: IndexConfig, search_fields: tuple[str, ...] | None = None
):
    """Parse + schema-bind a query string → TermQuery | PhraseQuery | BoolQuery."""
    tokens = _lex(q)
    if not tokens:
        raise QueryParserError("empty query")
    ast = _Parser(tokens).parse_query()
    default_fields = tuple(search_fields) if search_fields else config.default_search_fields
    return _resolve(ast, config, default_fields)


def collect_terms(node) -> set[tuple[str, str]]:
    """All (field, term) pairs referenced by the query (warmup analog —
    exactly the posting lists the leaf search needs, leaf.rs:173-193)."""
    out: set[tuple[str, str]] = set()
    if isinstance(node, TermQuery):
        out.add((node.field, node.term))
    elif isinstance(node, PhraseQuery):
        out.update((node.field, t) for t in node.terms)
    elif isinstance(node, BoolQuery):
        for c in node.must + node.should + node.must_not:
            out |= collect_terms(c)
    return out


def positive_terms(node) -> set[tuple[str, str]]:
    """(field, term) pairs in non-negated positions — the ones BM25 scores."""
    out: set[tuple[str, str]] = set()
    if isinstance(node, TermQuery):
        out.add((node.field, node.term))
    elif isinstance(node, PhraseQuery):
        out.update((node.field, t) for t in node.terms)
    elif isinstance(node, BoolQuery):
        for c in node.must + node.should:
            out |= positive_terms(c)
    return out


def extract_tag_predicate(node, tag_fields: tuple[str, ...]):
    """Simplified tag-pruning AST (reference tag_pruning.rs:47-51,151-205):
    returns a function(tags: set[str], has_tags: bool) -> bool deciding
    whether a split may contain matches.  Clauses not scoped to a tag field
    are 'uninformative' and collapse to True."""

    def uninformative(_tags, _has):
        return True

    if isinstance(node, TermQuery):
        if node.field in tag_fields:
            marker = f"{node.field}!"
            want = f"{node.field}:{node.term}"
            return lambda tags, _has: (marker not in tags) or (want in tags)
        return uninformative
    if isinstance(node, PhraseQuery):
        return uninformative
    if isinstance(node, BoolQuery):
        must_preds = [extract_tag_predicate(c, tag_fields) for c in node.must]
        should_preds = [extract_tag_predicate(c, tag_fields) for c in node.should]

        def pred(tags, has):
            if must_preds and not all(p(tags, has) for p in must_preds):
                return False
            if should_preds and not any(p(tags, has) for p in should_preds):
                return False
            return True

        return pred
    return uninformative
