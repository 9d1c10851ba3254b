"""Randomized differential testing: Hypothesis-generated queries, engine vs
the pure-Python oracle (rank + score identity).

The fixed cases in test_search.py cover each query class once; this module
composes them randomly (boolean nesting, phrases, field scoping, time
bounds, offsets, fast-field sort) the way the reference's proptest suites
stress merge/demux invariants (merge_executor.rs:1111-1151)."""

import os
from dataclasses import replace as _dc_replace

import numpy as np
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from quickwit_spark.config import transcripts_config
from quickwit_spark.fixtures.transcripts import generate_transcripts
from quickwit_spark.index.builder import build_index
from quickwit_spark.search.executor import search
from quickwit_spark.search.oracle import OracleIndex
from quickwit_spark.search.request import SearchRequest

CFG = transcripts_config(split_num_docs_target=250, segment_num_docs_target=64)

# corpus epoch (fixtures start 2026-01-01 UTC; see FIXTURES.md)
EPOCH = 1767225600
DAY = 86400

_STATE: dict = {}


@pytest.fixture(scope="module", params=["fresh", "merged"])
def built(spark, tmp_path_factory, request):
    """Fresh-build layout AND post-merge layout: the same random queries
    must be rank+score identical to the oracle on both (merges remap docIDs
    and re-encode postings — the differential suite covers that path too)."""
    pdf = generate_transcripts(n_conversations=40, seed=7)
    index_dir = str(tmp_path_factory.mktemp(f"idx_rand_{request.param}"))
    cfg = (
        CFG
        if request.param == "fresh"
        else transcripts_config(
            split_num_docs_target=5000, segment_num_docs_target=64,
            merge_factor=3, max_merge_factor=4,
        )
    )
    build_index(spark, spark.createDataFrame(pdf), cfg, index_dir,
                n_splits=6 if request.param == "merged" else None)
    if request.param == "merged":
        from quickwit_spark.index.merge import garbage_collect, run_merge_pipeline

        assert run_merge_pipeline(spark, index_dir)
        garbage_collect(index_dir)
    from quickwit_spark.index.catalog import Catalog

    live = {s.split_id for s in Catalog(index_dir).splits()}
    docs = spark.read.parquet(f"{index_dir}/docs").toPandas()
    docs = docs[docs["split_id"].isin(live)]
    oracle = OracleIndex(docs, cfg)

    # vocabulary by document frequency: hot / mid / rare + unknowns, plus
    # real adjacent-word phrases so generated queries actually hit
    from collections import Counter

    df_count: Counter = Counter()
    phrases = []
    for t in docs["text"]:
        toks = [w for w in t.lower().split() if w.isalnum()]
        df_count.update(set(toks))
        if len(toks) >= 2:
            phrases.append(f'"{toks[0]} {toks[1]}"')
    by_df = [w for w, _ in df_count.most_common()]
    vocab = by_df[:4] + by_df[len(by_df) // 2 : len(by_df) // 2 + 8] + by_df[-4:]
    vocab += ["zzznotaword", "qqmissing"]
    roles = sorted(docs["role"].unique())
    _STATE.update(
        oracle=oracle,
        index_dir=index_dir,
        vocab=vocab,
        phrases=sorted(set(phrases[:40])),
        roles=roles,
    )
    return index_dir, oracle


def _phrase_prefix_of(p: str, n: int) -> str:
    """'"the error"' → '"the err*"': cut n chars off the last word (>= 1
    char kept) and mark it as a match_phrase_prefix."""
    words = p[1:-1].split(" ")
    last = words[-1][: max(1, len(words[-1]) - n)]
    return '"' + " ".join(words[:-1] + [last]) + '*"'


def _clauses():
    word = st.sampled_from(_STATE["vocab"])
    boost = st.sampled_from(["0.5", "2", "3.0"])
    return st.one_of(
        word,
        st.sampled_from(_STATE["phrases"]),
        # boosted leaves (tantivy '^' grammar): term, phrase, scoped term
        st.builds(lambda w, b: f"{w}^{b}", word, boost),
        st.builds(lambda p, b: f"{p}^{b}", st.sampled_from(_STATE["phrases"]), boost),
        st.builds(lambda w, b: f"text:{w}^{b}", word, boost),
        st.builds(lambda r: f"role:{r}", st.sampled_from(_STATE["roles"])),
        # exists clauses ('field:*' — ES exists; tool is empty on most
        # fixture rows, so these are selective, not match-all)
        st.just("tool:*"),
        st.builds(lambda b: f"tool:*^{b}", st.sampled_from(["0.5", "2"])),
        st.builds(lambda w: f"text:{w}", word),
        # prefix clauses (scoring_boolean expansion): word stems of 1-4
        # chars hit anywhere from one term to a wide disjunction
        st.builds(lambda w, n: f"{w[:n]}*", word, st.integers(1, 4)),
        st.builds(lambda w, n, b: f"{w[:n]}*^{b}", word, st.integers(2, 4), boost),
        # match_phrase_prefix: a real phrase with its last term cut to a
        # prefix ('"the err*"' shape; >=1 char of the last word kept)
        st.builds(_phrase_prefix_of, st.sampled_from(_STATE["phrases"]), st.integers(1, 3)),
        # ordered sloppy phrases: real adjacent pairs at slop 0-3 (slop 0 ==
        # exact) and REVERSED pairs (only sloppy in-order chains can match)
        st.builds(
            lambda p, s: f"{p}~{s}", st.sampled_from(_STATE["phrases"]), st.integers(0, 3)
        ),
        st.builds(
            lambda p, s: '"' + " ".join(reversed(p[1:-1].split(" "))) + f'"~{s}',
            st.sampled_from(_STATE["phrases"]),
            st.integers(1, 4),
        ),
        # fuzzy terms: appended char (distance-1 hit) and truncated tail
        st.builds(lambda w: f"{w}x~1", word),
        st.builds(
            lambda w, d: f"{w[:-1] if len(w) > 3 else w}~{d}", word, st.integers(1, 2)
        ),
        # wildcards: '?' punched into a real word (one-char wildcard),
        # leading-star suffix match (unanchored dictionary scan), and a
        # mid-star pattern spanning a word's head and tail
        st.builds(
            lambda w, i: (
                f"{w[: i % len(w)]}?{w[i % len(w) + 1 :]}" if len(w) >= 2 else f"{w}?"
            ),
            word,
            st.integers(0, 9),
        ),
        st.builds(
            lambda w: f"*{w[max(1, len(w) - 3):]}" if len(w) >= 2 else f"*{w}", word
        ),
        st.builds(
            lambda w: f"{w[:2]}*{w[-2:]}" if len(w) > 4 else f"{w}*", word
        ),
        # regex terms: alternation of two real words (voids the range
        # anchor), optional-tail pattern, and a char-class head
        st.builds(lambda a, b: f"/({a}|{b})/", word, word),
        st.builds(lambda w: f"/{w[:3]}[a-z]*/" if len(w) > 3 else f"/{w}.*/", word),
        st.builds(lambda w: f"/{w}x?/", word),
        st.builds(lambda p: f"text:{p}", st.sampled_from(_STATE["phrases"])),
        # one level of explicit grouping
        st.builds(
            lambda a, op, b: f"({a}{op}{b})",
            word,
            st.sampled_from([" AND ", " OR ", " "]),
            word,
        ),
        # field group with an explicitly scoped inner clause (the group
        # field fills only the unscoped side, tantivy set_default_field)
        st.builds(
            lambda w, r: f"text:({w} OR role:{r})",
            word,
            st.sampled_from(_STATE["roles"]),
        ),
    )


@st.composite
def _queries(draw):
    parts = [draw(_clauses())]
    for _ in range(draw(st.integers(0, 3))):
        op = draw(st.sampled_from([" AND ", " OR ", " ", " NOT ", " -"]))
        nxt = draw(_clauses())
        if op == " -" and nxt.startswith(('"', "role:", "text:")):
            op = " NOT "  # '-' prefix composes only with bare terms
        parts.append(op + (nxt if op != " -" else nxt))
    q = "".join(parts)
    if draw(st.booleans()):
        q = f"({q})" if draw(st.booleans()) else q
    return q


@st.composite
def _requests(draw):
    # max_hits=0 is the count-only request (reference count collector);
    # one query in ~12 is the match-all browse ('*', AllQuery)
    q = "*" if draw(st.integers(0, 11)) == 0 else draw(_queries())
    kw = dict(query=q, max_hits=draw(st.integers(0, 25)))
    if draw(st.booleans()):
        kw["start_offset"] = draw(st.integers(0, 8))
    if draw(st.booleans()):
        lo = draw(st.integers(0, 80))
        kw["start_timestamp"] = EPOCH + lo * DAY
        kw["end_timestamp"] = EPOCH + (lo + draw(st.integers(1, 40))) * DAY
    if draw(st.booleans()):
        kw["sort_by_field"] = "ts"
        kw["sort_asc"] = draw(st.booleans())
    if draw(st.integers(0, 3)) == 0:  # fast-field numeric range filter
        f_lo = draw(st.one_of(st.none(), st.integers(0, 25)))
        f_hi = draw(st.one_of(st.none(), st.integers(0, 40)))
        if f_lo is not None or f_hi is not None:
            kw["numeric_filters"] = (("turn_idx", f_lo, f_hi),)
    if draw(st.integers(0, 5)) == 0:
        # minimum_should_match: only valid on a top-level OR — engine and
        # oracle must REJECT non-disjunction queries identically (checked
        # in the test body), and agree on clause counting when valid
        kw["min_should_match"] = draw(st.integers(2, 3))
    return SearchRequest(**kw)


@settings(
    max_examples=int(os.environ.get("QW_FUZZ_EXAMPLES", "30")),
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(req=_requests())
def test_random_query_rank_identity(spark, built, req):
    index_dir, oracle = built
    try:
        resp = search(spark, index_dir, req)
    except ValueError as e:
        if "expands to" in str(e):
            # over-cap prefix expansion (e.g. 'w*' over the synthetic
            # vocabulary): the engine and the oracle must REJECT the same
            # queries, not just rank the accepted ones identically
            with pytest.raises(ValueError, match="expands to"):
                oracle.search(req)
            return
        if "top-level OR" in str(e):
            # minShouldMatch > 1 on a non-disjunction: reject parity
            with pytest.raises(ValueError, match="top-level OR"):
                oracle.search(req)
            return
        raise
    exp = oracle.search(req)
    assert resp.num_hits == exp["num_hits"], req
    got = [(h["split_id"], h["doc_id"]) for h in resp.hits]
    want = [(h["split_id"], h["doc_id"]) for h in exp["hits"]]
    assert got == want, f"req={req}\ngot:  {resp.hits}\nwant: {exp['hits']}"
    # sort-by-fast-field mode: the oracle reports the sort value as "score",
    # the engine reports it as "sort_value" (BM25 is not the sort key there)
    got_key = "sort_value" if req.sort_by_field is not None else "score"
    for g, w in zip(resp.hits, exp["hits"]):
        assert g[got_key] == pytest.approx(w["score"], rel=1e-6), req
    # cursor follow-up: page 2 via search_after from this page's last hit
    # must rank-match the oracle's cursor page (reference tiebreak only;
    # BM25 cursors need the exact engine score, so use the engine's value)
    if resp.hits and req.start_offset == 0 and req.tiebreak == "reference":
        last = resp.hits[-1]
        # each side gets ITS OWN score for the cursor: cursor equality is
        # exact-float (same engine recomputes the same value), but engine
        # and oracle BM25 sums differ in the last ulp — page-1 rank
        # identity above already proves the cursor doc is the same
        req2 = _dc_replace(
            req, search_after=(last[got_key], last["split_id"], last["doc_id"])
        )
        resp2 = search(spark, index_dir, req2)
        exp2 = oracle.search(
            _dc_replace(
                req,
                search_after=(
                    exp["hits"][-1]["score"],
                    last["split_id"],
                    last["doc_id"],
                ),
            )
        )
        assert resp2.num_hits == exp["num_hits"], req2
        got2 = [(h["split_id"], h["doc_id"]) for h in resp2.hits]
        want2 = [(h["split_id"], h["doc_id"]) for h in exp2["hits"]]
        assert got2 == want2, f"req={req2}\ngot:  {got2}\nwant: {want2}"
