"""Unit tests for operators/search.py (inverted-index retrieval)."""

from __future__ import annotations

from oeem_etl_spark.operators import search


def _docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b a b a"),
            (2, "b a b"),
            (3, "c c c"),
            (4, "a b"),
        ],
        "doc_id long, text string",
    )


def test_phrase_search_overlapping_and_repeated_terms(spark):
    p = search.build_postings(_docs(spark))
    # phrase with a REPEATED term: "a b a" occurs at 0 and 2 in doc 1
    got = {r["doc_id"]: r["n_matches"]
           for r in search.phrase_search(p, ["a", "b", "a"]).collect()}
    assert got == {1: 2}
    got2 = {r["doc_id"]: r["n_matches"]
            for r in search.phrase_search(p, ["b", "a"]).collect()}
    assert got2 == {1: 2, 2: 1}


def test_conjunctive_search_requires_all_terms(spark):
    p = search.build_postings(_docs(spark))
    got = {r["doc_id"]: r["n_occurrences"]
           for r in search.conjunctive_search(p, ["a", "b"]).collect()}
    assert got == {1: 5, 2: 3, 4: 2}
    assert search.conjunctive_search(p, ["a", "c"]).count() == 0


def test_phrase_filter_reaches_scan(spark, sf_dir):
    # the IN-list must be pushed into the parquet scan of documents...
    # postings come from a projection of the text column, so the check is
    # that the plan contains a Filter BELOW the first shuffle (no full
    # postings materialization before term filtering)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    p = search.build_postings(docs)
    plan = search.phrase_search(p, ["table", "hash"])._jdf.queryExecution() \
        .executedPlan().toString()
    first_exchange = plan.find("Exchange")
    assert "Filter" in plan[first_exchange:], plan[:500]
