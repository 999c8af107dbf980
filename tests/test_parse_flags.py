"""Per-query parse flags (KNNQueryBuilder.java:64-81 contract):
ignore_unmapped — unmapped query fields contribute no hits instead of
raising; expand_nested — grouped search returns every child of a matched
group, not just the winner (ExpandNestedDocsQuery.java:1-141)."""

import pytest

from pysearch.build import build_index
from pysearch.config import IndexConfig
from pysearch.fixtures import generate_repo_files
from pysearch.query import Query, SearchIndex


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("flags_idx"))
    corpus = generate_repo_files(spark, 400, seed=11)
    build_index(spark, corpus, d, IndexConfig(segment_rows=128, term_buckets=8))
    return d


def test_ignore_unmapped_field_resolution(spark, idx):
    si = SearchIndex(spark, idx)
    mixed = {"content": 1.0, "no_such_field": 2.0}

    # default (False): unmapped field is a hard error
    with pytest.raises(ValueError, match="not indexed"):
        si.search(Query(text="license merge", k=5, fields=mixed))

    # True: the unmapped field silently contributes nothing -> identical
    # results to the mapped-only query
    got = si.search(
        Query(text="license merge", k=5, fields=mixed, ignore_unmapped=True)
    ).collect()
    want = si.search(
        Query(text="license merge", k=5, fields={"content": 1.0})
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in want
    ]

    # every field unmapped -> matches nothing (no error)
    empty = si.search(
        Query(
            text="license merge", k=5,
            fields={"nope": 1.0}, ignore_unmapped=True,
        )
    ).collect()
    assert empty == []

    # flags are validated as booleans
    with pytest.raises(ValueError, match="ignore_unmapped"):
        Query(text="x", k=5, ignore_unmapped="yes").validate()


def test_expand_nested_grouped_search(spark, idx):
    si = SearchIndex(spark, idx)
    q = Query(text="license merge", k=100)

    parents = si.search_grouped(q, group_col="repo", k_groups=2)
    prows = parents.collect()
    assert 0 < len(prows) <= 2
    # one winner row per group, carrying the group's best score
    assert len({r["repo"] for r in prows}) == len(prows)

    q_exp = Query(text="license merge", k=100, expand_nested=True)
    expanded = si.search_grouped(q_exp, group_col="repo", k_groups=2)
    erows = expanded.collect()
    # every child of each matched group comes back, not just the winner
    docmap = {
        r["repo"]: r["n"]
        for r in si.docmaps().groupBy("repo").count().withColumnRenamed(
            "count", "n"
        ).collect()
    }
    got_groups = {}
    for r in erows:
        got_groups.setdefault(r["repo"], 0)
        got_groups[r["repo"]] += 1
    assert set(got_groups) == {r["repo"] for r in prows}
    for g, n in got_groups.items():
        assert n == docmap[g], f"group {g}: {n} children != docmap {docmap[g]}"
    # each child row carries the parent's best score
    best = {r["repo"]: r["score"] for r in prows}
    assert all(r["parent_score"] == best[r["repo"]] for r in erows)


def test_term_stats_memo_big_dictionary_path(spark, idx):
    """The per-term df memo (Lucene term-dictionary-cache analog): on the
    big-dictionary path a term's stats are looked up via Spark ONCE per
    SearchIndex handle, including NEGATIVE entries for absent terms."""
    si = SearchIndex(spark, idx)
    si._df_cache = None  # force the big-dictionary (memoized) path
    first = si.global_term_stats(["license", "zzz_not_a_term"])
    assert "license" in first and first["license"] > 0
    assert "zzz_not_a_term" not in first  # absent -> omitted
    assert si._term_stats_memo["zzz_not_a_term"] == 0  # but negatively cached

    # repeated lookups must be served from the memo: break the Spark path
    # and ask again
    si._dictionary_df = None
    second = si.global_term_stats(["license", "zzz_not_a_term"])
    assert second == first

    # a genuinely new term now needs the dictionary -> fails loudly, which
    # proves the memo (not a silent fallback) served the repeat above
    with pytest.raises(AttributeError):
        si.global_term_stats(["merge"])
