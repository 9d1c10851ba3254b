"""Query grammar tests — semantics frozen against the reference
(query_builder.rs:29-77 incl. rejection cases, docs/reference/query-language.md)."""

import pytest

from quickwit_spark.config import transcripts_config
from quickwit_spark.search.parser import (
    BoolQuery,
    PhraseQuery,
    QueryParserError,
    TermQuery,
    collect_terms,
    extract_tag_predicate,
    parse_query,
)

CFG = transcripts_config()


def test_single_term():
    ast = parse_query("deploy", CFG)
    assert ast == TermQuery("text", "deploy")


def test_implicit_and_is_default():
    ast = parse_query("deploy failure", CFG)  # query_builder.rs:47-48
    assert isinstance(ast, BoolQuery)
    assert ast.must == [TermQuery("text", "deploy"), TermQuery("text", "failure")]
    assert parse_query("deploy AND failure", CFG) == ast


def test_or_binds_loosest():
    ast = parse_query("a OR b c", CFG)
    assert isinstance(ast, BoolQuery) and len(ast.should) == 2
    right = ast.should[1]
    assert isinstance(right, BoolQuery) and len(right.must) == 2


def test_not_and_minus():
    for q in ["deploy NOT failure", "deploy -failure"]:
        ast = parse_query(q, CFG)
        assert ast.must == [TermQuery("text", "deploy")]
        assert ast.must_not == [TermQuery("text", "failure")]


def test_field_scoped():
    assert parse_query("role:assistant", CFG) == TermQuery("role", "assistant")
    # raw tokenizer: value not lowercased
    assert parse_query("role:Assistant", CFG) == TermQuery("role", "Assistant")
    # default tokenizer: query term analyzed (lowercased)
    assert parse_query("text:Deploy", CFG) == TermQuery("text", "deploy")


def test_field_group():
    ast = parse_query("text:(alpha OR beta)", CFG)
    assert isinstance(ast, BoolQuery)
    assert ast.should == [TermQuery("text", "alpha"), TermQuery("text", "beta")]


def test_phrase():
    ast = parse_query('"exact words here"', CFG)
    assert ast == PhraseQuery("text", ("exact", "words", "here"))


def test_multi_token_term_becomes_phrase():
    assert parse_query("spark-sql", CFG) == PhraseQuery("text", ("spark", "sql"))


def test_range_rejected():
    for q in ["ts:[1 TO 5]", "[a TO b]", "x {1 TO 2}"]:
        with pytest.raises(QueryParserError):
            parse_query(q, CFG)  # query_builder.rs:36-39


def test_comparison_range_rejected():
    """query_builder.rs:152-156: ``title:>foo`` is a range form and must be
    rejected, not silently tokenized down to the bare term."""
    for q in ["text:>foo", "text:<foo", "ts:>=5", "text: <bar", ">foo"]:
        with pytest.raises(QueryParserError, match="range"):
            parse_query(q, CFG)
    # escaped operator stays a literal and analyzes to the term
    assert parse_query(r"text:\>foo", CFG) == TermQuery("text", "foo")


def test_boost_grammar():
    """tantivy '^' boost grammar (UserInputAst::Boost): term, scoped term,
    phrase, and group boosts; matching is unchanged, only the score
    multiplier rides on the leaf."""
    assert parse_query("deploy^2", CFG) == TermQuery("text", "deploy", boost=2.0)
    assert parse_query("text:deploy^1.5", CFG) == TermQuery("text", "deploy", boost=1.5)
    assert parse_query('"a b"^2', CFG) == PhraseQuery("text", ("a", "b"), boost=2.0)
    grp = parse_query("(a b)^3", CFG)
    assert all(c.boost == 3.0 for c in grp.must)
    # non-numeric suffix is NOT a boost: the '^' analyzes away as term text
    assert parse_query("deploy^x", CFG) == PhraseQuery("text", ("deploy", "x"))
    # escaped '^' stays literal
    assert parse_query(r"deploy\^2", CFG) == PhraseQuery("text", ("deploy", "2"))


def test_match_all():
    """bare '*' → AllQuery (UserInputLeaf::All); nested '*' and escaped
    '\\*' are not match-all."""
    from quickwit_spark.search.parser import AllQuery

    assert parse_query("*", CFG) == AllQuery()
    with pytest.raises(QueryParserError, match="entire query"):
        parse_query("* deploy", CFG)
    with pytest.raises(QueryParserError):  # literal '*' analyzes to nothing
        parse_query(r"\*", CFG)


def test_quoted_colon_is_literal():
    """query_builder.rs:163-174: a colon INSIDE a quoted value never splits
    a new field scope — ``server.name:".bar:"`` must build a term/phrase
    query on the scoped field."""
    assert parse_query('text:".bar:"', CFG) == TermQuery("text", "bar")
    assert parse_query('text:"for.bar:b"', CFG) == PhraseQuery(
        "text", ("for", "bar", "b")
    )


def test_backslash_escaping():
    """query-language.md 'Escaping Special Characters': \\X makes X literal —
    escaped colons don't split field:term, escaped spaces don't end the
    token, escaped brackets aren't ranges; the literal still goes through
    the target field's analyzer (tantivy TextAnalyzer semantics)."""
    # raw-tokenizer field: exact value with a space / parens / backslash
    assert parse_query(r"tool:my\ tool", CFG) == TermQuery("tool", "my tool")
    assert parse_query(r"role:\(user\)", CFG) == TermQuery("role", "(user)")
    assert parse_query(r"tool:a\\b", CFG) == TermQuery("tool", "a\\b")
    # escaped colon on a default-field term: analyzed literal "a:b" -> phrase
    assert parse_query(r"a\:b", CFG) == PhraseQuery("text", ("a", "b"))
    # escaped colon in the FIELD position keeps it one (unknown) field name
    with pytest.raises(QueryParserError, match="does not exist"):
        parse_query(r"title\:x:y", CFG)
    # escaped brackets are not ranges
    assert parse_query(r"tool:\[x\]", CFG) == TermQuery("tool", "[x]")
    with pytest.raises(QueryParserError, match="range"):
        parse_query("ts:[100 TO 200]", CFG)
    # escaped quote inside a phrase is literal (and analyzed away)
    assert parse_query(r'"a \" b"', CFG) == PhraseQuery("text", ("a", "b"))
    # NUL sentinel cannot be injected
    with pytest.raises(QueryParserError, match="NUL"):
        parse_query("a\x00b", CFG)


def test_unknown_field_rejected():
    with pytest.raises(QueryParserError):
        parse_query("nosuchfield:x", CFG)


def test_empty_rejected():
    with pytest.raises(QueryParserError):
        parse_query("   ", CFG)


def test_collect_terms():
    ast = parse_query('deploy role:tool "a b"', CFG)
    assert collect_terms(ast) == {
        ("text", "deploy"),
        ("role", "tool"),
        ("text", "a"),
        ("text", "b"),
    }


def test_tag_predicate():
    ast = parse_query("deploy role:assistant", CFG)
    pred = extract_tag_predicate(ast, ("role",))
    # split with the tag recorded and value present → keep
    assert pred({"role!", "role:assistant", "role:user"}, True)
    # tag recorded, value absent → prune (tag_pruning.rs:151-205)
    assert not pred({"role!", "role:user"}, True)
    # tags not recorded for the field (cardinality cap) → cannot prune
    assert pred(set(), False)
    # non-tag query is uninformative → keep
    ast2 = parse_query("deploy", CFG)
    assert extract_tag_predicate(ast2, ("role",))({"role!"}, True)
    # OR: keep if any branch may match
    ast3 = parse_query("role:alpha OR role:beta", CFG)
    p3 = extract_tag_predicate(ast3, ("role",))
    assert p3({"role!", "role:beta"}, True)
    assert not p3({"role!", "role:gamma"}, True)


def test_stacked_signs_compose():
    """Negation parity: 'NOT NOT x' requires x; '+' is a no-op marker, so
    '+-x' and '-+x' both exclude x (the old parser swallowed the inner
    sign, inverting every stacked form)."""
    from quickwit_spark.config import transcripts_config
    from quickwit_spark.search.parser import BoolQuery, parse_query

    cfg = transcripts_config()
    double_not = parse_query("error NOT NOT fatal", cfg)
    assert isinstance(double_not, BoolQuery)
    assert [t.term for t in double_not.must] == ["error", "fatal"]
    assert double_not.must_not == []
    for q in ("error +-fatal", "error -+fatal", "error NOT fatal"):
        ast = parse_query(q, cfg)
        assert [t.term for t in ast.must_not] == ["fatal"], q


def test_field_group_keeps_inner_explicit_scope():
    # tantivy's set_default_field fills MISSING fields only: an explicitly
    # scoped clause inside a field group keeps its own field
    ast = parse_query("text:(alpha OR role:assistant)", CFG)
    assert ast.should == [TermQuery("text", "alpha"), TermQuery("role", "assistant")]


def test_query_on_unindexed_field_rejected():
    # turn_idx is fast-only (indexed=False): bind-time error like tantivy's
    # FieldNotIndexed, not a silent zero-hit query
    with pytest.raises(QueryParserError, match="not indexed"):
        parse_query("turn_idx:5", CFG)


def test_phrase_bad_suffix_rejected():
    """A malformed phrase suffix must be a 400, never silently treated as
    an extra AND term (the tantivy 0.15 grammar would reject it)."""
    with pytest.raises(QueryParserError, match="suffix"):
        parse_query('"a b"^x', CFG)


def test_prefix_query_forms():
    """Trailing unescaped '*' marks a prefix clause (beyond-reference:
    Lucene scoring_boolean rewrite semantics, expanded at plan time)."""
    from quickwit_spark.search.parser import PrefixQuery

    assert parse_query("depl*", CFG) == PrefixQuery("text", "depl")
    assert parse_query("DEPL*", CFG) == PrefixQuery("text", "depl")  # lowercased
    assert parse_query("role:assi*", CFG) == PrefixQuery("role", "assi")
    assert parse_query("depl*^2", CFG) == PrefixQuery("text", "depl", boost=2.0)
    ast = parse_query("error AND depl*", CFG)
    assert ast.must[1] == PrefixQuery("text", "depl")
    # group boost distributes onto prefix leaves like any other leaf
    ast = parse_query("(depl* error)^3", CFG)
    assert ast.must[0] == PrefixQuery("text", "depl", boost=3.0)
    # escaped star is literal text; the analyzer strips it like punctuation
    assert parse_query("depl\\*", CFG) == TermQuery("text", "depl")
    # mid-term star is a WILDCARD, not a prefix marker (Lucene semantics)
    from quickwit_spark.search.parser import WildcardQuery

    assert parse_query("de*pl", CFG) == WildcardQuery("text", "de*pl")


def test_prefix_query_rejections():
    from quickwit_spark.search.parser import PrefixQuery  # noqa: F401

    # 'field:*' is now the ES exists query, not an empty prefix
    from quickwit_spark.search.parser import ExistsQuery

    assert parse_query("text:*", CFG) == ExistsQuery("text")
    assert parse_query("tool:*^2", CFG) == ExistsQuery("tool", boost=2.0)
    # the parenthesized form binds the field onto the inner star: exists,
    # NEVER match-all (a silently index-wide result would be a trap)
    assert parse_query("tool:(*)", CFG) == ExistsQuery("tool")
    assert parse_query("error OR tool:(*)", CFG).should[1] == ExistsQuery("tool")
    with pytest.raises(QueryParserError):
        parse_query("nosuch:*", CFG)  # unknown field
    with pytest.raises(QueryParserError, match="expansion|literal|prefix"):
        parse_query("text:**", CFG)  # double star: all-wildcard pattern
    with pytest.raises(QueryParserError, match="one token"):
        parse_query("text:spark-s*", CFG)
    with pytest.raises(QueryParserError):
        parse_query("ts:17*", CFG)  # non-text field (not indexed / typed)
    # unexpanded prefixes must never reach warmup planning
    with pytest.raises(ValueError, match="expand_prefixes"):
        collect_terms(parse_query("depl*", CFG))


def test_phrase_prefix_query_forms():
    """'"deploy fai*"' — ES match_phrase_prefix: fixed leading terms plus a
    last-position prefix, expanded at plan time like PrefixQuery."""
    from quickwit_spark.search.parser import PhrasePrefixQuery, PrefixQuery

    assert parse_query('"the err*"', CFG) == PhrasePrefixQuery("text", ("the",), "err")
    assert parse_query('"a b cd*"^2', CFG) == PhrasePrefixQuery(
        "text", ("a", "b"), "cd", boost=2.0
    )
    # a one-token quoted prefix degenerates to a plain prefix query
    assert parse_query('"fai*"', CFG) == PrefixQuery("text", "fai")
    # escaped star inside a phrase stays literal (analyzer strips it)
    assert parse_query('"the err\\*"', CFG) == PhraseQuery("text", ("the", "err"))
    with pytest.raises(ValueError, match="expand_prefixes"):
        collect_terms(parse_query('"the err*"', CFG))


def test_phrase_slop_forms():
    """'"a b"~2' — ordered sloppy phrase (ES match_phrase slop shape with
    documented ordered semantics: in-order positions, total slack <= slop);
    '~0' is the exact phrase; boost follows slop like Lucene ('"a b"~2^3')."""
    assert parse_query('"deploy failure"~2', CFG) == PhraseQuery(
        "text", ("deploy", "failure"), slop=2
    )
    assert parse_query('"deploy failure"~0', CFG) == PhraseQuery(
        "text", ("deploy", "failure")
    )
    assert parse_query('"a b c"~1^2', CFG) == PhraseQuery(
        "text", ("a", "b", "c"), boost=2.0, slop=1
    )
    with pytest.raises(QueryParserError, match="slop must be a number"):
        parse_query('"a b"~x', CFG)
    with pytest.raises(QueryParserError, match="cannot carry slop"):
        parse_query('"a b*"~1', CFG)
    with pytest.raises(QueryParserError, match="tokenized text field"):
        parse_query('role:"a b"~1', CFG)  # raw field: whole-value terms
    with pytest.raises(QueryParserError, match="invalid suffix"):
        parse_query('"a b"~1~2', CFG)


def test_wildcard_query_forms():
    """'*'/'?' anywhere in a term form a Lucene WildcardQuery (beyond-
    reference; ES query_string semantics), expanded at plan time against
    the term dictionary like PrefixQuery.  A single TRAILING star stays
    the cheaper PrefixQuery (anchored dictionary range read)."""
    from quickwit_spark.search.parser import WildcardQuery

    assert parse_query("d?plo*", CFG) == WildcardQuery("text", "d?plo*")
    assert parse_query("D?PLO*", CFG) == WildcardQuery("text", "d?plo*")  # lowercased
    assert parse_query("me*ge^2", CFG) == WildcardQuery("text", "me*ge", boost=2.0)
    # raw fields keep case, mid-pattern star allowed
    assert parse_query("role:assi*ant", CFG) == WildcardQuery("role", "assi*ant")
    # escaped wildcard chars stay literals in the canonical pattern
    assert parse_query("a\\*b?", CFG) == WildcardQuery("text", "a\\*b?")
    # '?'-only positions with at least one literal are fine
    assert parse_query("x??", CFG) == WildcardQuery("text", "x??")
    with pytest.raises(QueryParserError, match="literal character"):
        parse_query("??*", CFG)
    with pytest.raises(QueryParserError, match="combine"):
        parse_query("m?rge~1", CFG)
    with pytest.raises(QueryParserError):
        parse_query("ts:1?7", CFG)  # non-text field
    with pytest.raises(ValueError, match="expand_prefixes"):
        collect_terms(parse_query("d?plo*", CFG))


def test_regex_query_forms():
    """'field:/re/' — regex term query (ES query_string '/re/' form);
    full-matches dictionary terms, expanded at plan time."""
    from quickwit_spark.search.parser import RegexQuery

    assert parse_query("text:/mer(ge|ging)/", CFG) == RegexQuery(
        "text", "mer(ge|ging)"
    )
    assert parse_query("/err.r/^2", CFG) == RegexQuery("text", "err.r", boost=2.0)
    assert parse_query("/fail[a-z]+/", CFG) == RegexQuery("text", "fail[a-z]+")
    # regex escapes survive the query-language escaping layer
    assert parse_query(r"/a\d+/", CFG) == RegexQuery("text", r"a\d+")
    # escaped '/' inside the body is a literal slash
    assert parse_query(r"role:/a\/b/", CFG) == RegexQuery("role", r"a\/b")
    ast = parse_query("deploy /fail[a-z]+/", CFG)
    assert ast.must[1] == RegexQuery("text", "fail[a-z]+")
    with pytest.raises(QueryParserError, match="unterminated regex"):
        parse_query("text:/unterminated", CFG)
    with pytest.raises(QueryParserError, match="empty regex"):
        parse_query("text://", CFG)
    with pytest.raises(QueryParserError, match="invalid regex"):
        parse_query("text:/bad(/", CFG)
    with pytest.raises(QueryParserError, match="after regex close"):
        parse_query("/a/b", CFG)
    with pytest.raises(QueryParserError):
        parse_query("ts:/5/", CFG)  # non-text field (not indexed / typed)
    with pytest.raises(ValueError, match="expand_prefixes"):
        collect_terms(parse_query("/err.r/", CFG))


def test_wildcard_regex_literal_prefix_helpers():
    """The dictionary range-scan anchors must NEVER exclude a true match:
    alternation at depth 0 and quantified leading chars void the prefix."""
    from quickwit_spark.search.parser import (
        regex_literal_prefix,
        wildcard_literal_prefix,
    )

    assert wildcard_literal_prefix("depl*") == "depl"
    assert wildcard_literal_prefix("d?plo*") == "d"
    assert wildcard_literal_prefix("*ploy") == ""
    assert wildcard_literal_prefix("a\\*b*") == "a*b"
    assert regex_literal_prefix("mer(ge|ging)") == "mer"
    assert regex_literal_prefix("merge|split") == ""  # top-level alternation
    assert regex_literal_prefix("me?rge") == "m"  # '?' quantifies the 'e'
    assert regex_literal_prefix("m{2}erge") == ""
    assert regex_literal_prefix(".*err") == ""
    assert regex_literal_prefix("^abc.*") == "abc"
    assert regex_literal_prefix("[ab]cd") == ""
    assert regex_literal_prefix("a[]x]b") == "a"  # ']' literal-first class


def test_fuzzy_query_forms():
    """'term~' / 'term~N' — classic-Levenshtein fuzzy term (Lucene shape,
    no transpositions), expanded at plan time; '~0' is an exact term."""
    from quickwit_spark.search.parser import FuzzyQuery

    assert parse_query("deploy~", CFG) == FuzzyQuery("text", "deploy", 1)
    assert parse_query("deploy~2", CFG) == FuzzyQuery("text", "deploy", 2)
    assert parse_query("deploy~0", CFG) == TermQuery("text", "deploy")
    assert parse_query("role:asistant~1", CFG) == FuzzyQuery("role", "asistant", 1)
    assert parse_query("deploy~1^2", CFG) == FuzzyQuery("text", "deploy", 1, boost=2.0)
    # non-digit suffix: '~' is punctuation, the analyzer splits it into a
    # multi-token clause (positions recorded → phrase)
    assert parse_query("a~b", CFG) == PhraseQuery("text", ("a", "b"))
    with pytest.raises(QueryParserError, match="0-2"):
        parse_query("deploy~3", CFG)
    with pytest.raises(QueryParserError, match="combine"):
        parse_query("dep*~1", CFG)
    with pytest.raises(ValueError, match="expand_prefixes"):
        collect_terms(parse_query("deploy~1", CFG))


def test_search_field_weights():
    """searchField entries may carry per-field weights ('text^2' — the ES
    multi_match field^boost shape): unscoped clauses resolve once per field
    with the clause boost scaled by the field weight."""
    assert parse_query("deploy", CFG, ("text^2",)) == TermQuery("text", "deploy", 2.0)
    ast = parse_query("deploy", CFG, ("text^2", "role"))
    assert ast == BoolQuery(
        should=[TermQuery("text", "deploy", 2.0), TermQuery("role", "deploy", 1.0)]
    )
    # clause boost composes multiplicatively with the field weight
    assert parse_query("deploy^3", CFG, ("text^2",)) == TermQuery("text", "deploy", 6.0)
    with pytest.raises(QueryParserError, match="boost"):
        parse_query("deploy", CFG, ("text^0",))
    with pytest.raises(QueryParserError, match="invalid search-field"):
        parse_query("deploy", CFG, ("^2",))
