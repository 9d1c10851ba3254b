"""Snippet / highlight generation (beyond-reference; search/snippet.py):
deterministic fragment selection + term wrapping, page-only driver-side."""

import pytest

from quickwit_spark.config import transcripts_config
from quickwit_spark.fixtures.transcripts import generate_transcripts
from quickwit_spark.index.builder import build_index
from quickwit_spark.search.executor import search
from quickwit_spark.search.request import SearchRequest
from quickwit_spark.search.snippet import generate_snippet

CFG = transcripts_config(split_num_docs_target=500, segment_num_docs_target=128)


@pytest.fixture(scope="module")
def snip_idx(spark, tmp_path_factory):
    pdf = generate_transcripts(n_conversations=20, seed=11)
    idx = str(tmp_path_factory.mktemp("snip") / "idx")
    build_index(spark, spark.createDataFrame(pdf), CFG, idx)
    return idx


def test_generate_snippet_wraps_matches():
    out = generate_snippet("Deploy failed; retry the deploy now", {"deploy"})
    assert out == "<b>Deploy</b> failed; retry the <b>deploy</b> now"


def test_generate_snippet_no_match_is_none():
    assert generate_snippet("nothing relevant here", {"deploy"}) is None
    assert generate_snippet("", {"deploy"}) is None
    assert generate_snippet("deploy", set()) is None


def test_generate_snippet_picks_densest_fragment():
    # two fragments under max_chars=20; the second has two distinct terms
    text = "alpha filler words here ... beta gamma end"
    out = generate_snippet(text, {"beta", "gamma"}, max_chars=20)
    assert "<b>beta</b> <b>gamma</b>" in out
    assert "alpha" not in out  # fragment, not the whole text


def test_generate_snippet_earliest_wins_ties():
    text = "one deploy here and later one deploy there"
    out = generate_snippet(text, {"deploy"}, max_chars=15)
    # both fragments score (1 distinct, 1 occurrence); earliest chosen
    assert out.startswith("one <b>deploy</b>")


def test_generate_snippet_case_preserved():
    out = generate_snippet("DEPLOY went fine", {"deploy"})
    assert out.startswith("<b>DEPLOY</b>")


def test_search_with_snippets(spark, snip_idx):
    resp = search(
        spark,
        snip_idx,
        SearchRequest("deploy", max_hits=5, snippet_fields=("text",)),
    )
    assert resp.hits
    for h in resp.hits:
        assert "snippets" in h
        snip = h["snippets"].get("text")
        assert snip is not None and "<b>" in snip
        # the wrapped token really is a query-term occurrence
        inner = snip.split("<b>")[1].split("</b>")[0].lower()
        assert inner == "deploy"
        # fragment honors the char budget (excluding the tags)
        plain = snip.replace("<b>", "").replace("</b>", "")
        assert len(plain) <= 150
        assert plain in h["text"]


def test_search_snippets_not_clause_never_highlights(spark, snip_idx):
    resp = search(
        spark,
        snip_idx,
        SearchRequest("deploy -failure", max_hits=5, snippet_fields=("text",)),
    )
    for h in resp.hits:
        snip = h["snippets"].get("text", "")
        assert "<b>failure</b>" not in snip.lower()


def test_snippet_field_validation(spark, snip_idx):
    with pytest.raises(ValueError, match="tokenized stored text"):
        search(
            spark,
            snip_idx,
            SearchRequest("deploy", max_hits=1, snippet_fields=("role",)),
        )
    with pytest.raises(ValueError, match="tokenized stored text"):
        search(
            spark,
            snip_idx,
            SearchRequest("deploy", max_hits=1, snippet_fields=("nosuch",)),
        )
