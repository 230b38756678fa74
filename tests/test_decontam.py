"""Benchmark decontamination (operators/decontam.py) vs a plain
Python n-gram-overlap reference: hit accounting, the anti-join scrub,
short-document semantics, and the attested broadcast gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_azure_etl_spark.operators import decontam

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog today"),
    (1, "a completely different sentence with no overlap at all here"),
    # shares the 5-gram "quick brown fox jumps over" with doc 0
    (2, "she saw the quick brown fox jumps over a fence"),
    # shares nothing 5-gram-wide despite common words
    (3, "the quick red fox walks over a lazy dog now"),
    (4, "short doc"),
    (5, "short doc"),  # exact copy of the short eval doc
    (6, "unrelated filler text about weather patterns in the north"),
]


def _py_grams(text: str, n: int) -> set[str]:
    toks = text.split()
    if len(toks) < n:
        return {" ".join(toks)}
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _py_hits(docs, eval_ids, n):
    ev = set()
    for i, t in docs:
        if i in eval_ids:
            ev |= _py_grams(t, n)
    out = {}
    for i, t in docs:
        c = len(_py_grams(t, n) & ev)
        if c:
            out[i] = c
    return out


def _df(spark):
    return spark.createDataFrame(DOCS, "doc_id bigint, text string")


def test_hits_match_python_reference(spark):
    docs = _df(spark)
    eval_docs = docs.filter(F.col("doc_id").isin(0, 4))
    got = {r["doc_id"]: r["contam_hits"] for r in
           decontam.contamination_hits(docs, eval_docs, n=5,
                                       n_eval_grams=100).collect()}
    want = _py_hits(DOCS, {0, 4}, 5)
    assert got == want
    # the cross-doc overlap and the short-doc copy are both caught
    assert 2 in got and 5 in got
    # common words alone do not contaminate at n=5
    assert 3 not in got and 1 not in got


def test_decontaminate_is_exact_complement(spark):
    docs = _df(spark)
    eval_docs = docs.filter(F.col("doc_id").isin(0, 4))
    kept = {r["doc_id"] for r in
            decontam.decontaminate(docs, eval_docs, n=5,
                                   n_eval_grams=100,
                                   n_hit_docs=10).collect()}
    contaminated = set(_py_hits(DOCS, {0, 4}, 5))
    assert kept == {i for i, _ in DOCS} - contaminated
    assert kept.isdisjoint(contaminated) and 1 in kept


def test_probe_join_broadcasts_only_when_attested(spark):
    docs = _df(spark)
    eval_docs = docs.filter(F.col("doc_id") == 0)
    attested = decontam.contamination_hits(docs, eval_docs, n=5,
                                           n_eval_grams=100)
    plan = attested._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" in plan.lower()
    unattested = decontam.contamination_hits(docs, eval_docs, n=5,
                                             n_eval_grams=None)
    plan = unattested._jdf.queryExecution().optimizedPlan().toString()
    assert "broadcast" not in plan.lower()
    # both strategies agree
    assert sorted(attested.collect()) == sorted(unattested.collect())


def test_eval_gram_set_is_distinct_digests(spark):
    docs = _df(spark)
    ev = decontam.eval_gram_set(docs.filter(F.col("doc_id") == 0), n=5)
    rows = [r["gram"] for r in ev.collect()]
    assert len(rows) == len(set(rows))
    assert all(len(g) == 32 for g in rows)  # md5 hex digests
    assert len(rows) == len(_py_grams(DOCS[0][1], 5))
