"""TF-IDF term scoring (operators.text.tf_icf_top_terms / tfidf_score)
and windowed co-occurrence + PMI (cooccurrence_pairs / pmi) vs Python
references."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from snowflake_azure_etl_spark.operators import text

DOCS = [
    (1, "spark shuffles data and spark joins data"),
    (2, "duckdb scans data"),
    (3, "spark spark spark streams"),
    (4, "a lone document about nothing shared"),
    (5, "spark data streams"),   # df=3 terms: uneven integer division
]


def _py_top_terms(rows, k, scale=text.TFIDF_SCALE):
    n = len(rows)
    df = Counter()
    for _, t in rows:
        df.update(set(t.split(" ")))
    out = {}
    for did, t in rows:
        tf = Counter(t.split(" "))
        scored = sorted(
            (((c * n * scale) // df[w], w, c) for w, c in tf.items()),
            key=lambda x: (-x[0], x[1]))
        out[did] = [(w, c, df[w], s, i + 1)
                    for i, (s, w, c) in enumerate(scored[:k])]
    return out


def test_tf_icf_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    got = {}
    for r in text.tf_icf_top_terms(docs, k=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["token"], r["tf"], r["df"], r["score_scaled"], r["rnk"]))
    want = _py_top_terms(DOCS, k=2)
    for did in want:
        assert sorted(got[did], key=lambda x: x[4]) == want[did], did


def test_tf_icf_attested_n_matches_counted(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    a = sorted(map(tuple, text.tf_icf_top_terms(docs, k=1).collect()))
    b = sorted(map(tuple,
                   text.tf_icf_top_terms(docs, k=1,
                                         n_docs=len(DOCS)).collect()))
    assert a == b


def test_tfidf_score_matches_math_log(spark):
    df = spark.createDataFrame([(3, 2, 10)], "tf int, df int, n int")
    got = df.select(
        text.tfidf_score(F.col("tf"), F.col("df"), F.col("n"))
        .alias("s")).collect()[0]["s"]
    assert abs(got - 3 * (math.log(11 / 3) + 1)) < 1e-12


def _py_cooc(rows, window):
    c = Counter()
    for _, t in rows:
        toks = t.split(" ")
        for i in range(len(toks)):
            for j in range(1, window + 1):
                if i + j < len(toks):
                    a, b = sorted((toks[i], toks[i + j]))
                    c[f"{a}|{b}"] += 1
    return dict(c)


def test_cooccurrence_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string")
    for w in (1, 2, 3):
        got = {r["pair"]: r["n_cooc"]
               for r in text.cooccurrence_pairs(docs, window=w).collect()}
        assert got == _py_cooc(DOCS, w), w


def test_cooc_short_doc_yields_no_phantom_pairs(spark):
    docs = spark.createDataFrame([(1, "solo")], "doc_id bigint, text string")
    assert text.cooccurrence_pairs(docs, window=3).count() == 0


def test_pmi_matches_math_log(spark):
    df = spark.createDataFrame([(4, 8, 6, 100)],
                               "pc int, ca int, cb int, n int")
    got = df.select(text.pmi(F.col("pc"), F.col("ca"), F.col("cb"),
                             F.col("n")).alias("p")).collect()[0]["p"]
    assert abs(got - math.log(4 * 100 / (8 * 6))) < 1e-12
