"""Edit-distance candidate verification (operators.dedup.
edit_distance_verify): exact Levenshtein per candidate pair vs an
independent Python DP reference, the normalized-similarity contract
(incl. the empty-text pin), and DuckDB oracle parity of the exact
expression shape q52 ships."""

from __future__ import annotations

import pytest

from snowflake_azure_etl_spark.operators import dedup


def py_lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


DOCS = [(1, "the cat sat on the mat"),
        (2, "the cat sat on the hat"),
        (3, "a dog sat on a log"),
        (4, ""),
        (5, ""),
        (6, "the cat sat on the mat")]
PAIRS = [(1, 2), (1, 3), (1, 6), (4, 5), (2, 4)]


def test_edit_distance_matches_python_reference(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = spark.createDataFrame(PAIRS, "id_a long, id_b long")
    out = {(r["id_a"], r["id_b"]): (r["edit_dist"], r["edit_sim"])
           for r in dedup.edit_distance_verify(
               docs, pairs, n_docs=len(DOCS)).collect()}
    txt = dict(DOCS)
    for a, b in PAIRS:
        d = py_lev(txt[a], txt[b])
        m = max(len(txt[a]), len(txt[b]))
        want_sim = 1.0 if m == 0 else 1.0 - d / m
        assert out[(a, b)] == (d, want_sim), (a, b)
    # the pinned shapes: identical docs at distance 0 / sim 1.0, the
    # one-char neighbour at distance 1, and the empty-empty pair at
    # sim 1.0 (identical), never a 0/0 artifact
    assert out[(1, 6)] == (0, 1.0)
    assert out[(1, 2)][0] == 1
    assert out[(4, 5)] == (0, 1.0)
    # candidate columns ride through untouched, text sides dropped
    cols = set(dedup.edit_distance_verify(docs, pairs,
                                          n_docs=len(DOCS)).columns)
    assert cols == {"id_a", "id_b", "edit_dist", "edit_sim"}


def test_edit_distance_duckdb_parity(spark):
    """Spark's levenshtein == DuckDB's levenshtein over the same
    pairs, and the shared guard-then-divide expression shape yields
    bit-identical doubles — the q52 oracle contract."""
    duckdb = pytest.importorskip("duckdb")
    import pandas as pd
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = spark.createDataFrame(PAIRS, "id_a long, id_b long")
    got = {(r["id_a"], r["id_b"]): (r["edit_dist"], r["edit_sim"])
           for r in dedup.edit_distance_verify(
               docs, pairs, n_docs=len(DOCS)).collect()}
    con = duckdb.connect()
    con.register("d", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    con.register("p", pd.DataFrame(PAIRS, columns=["id_a", "id_b"]))
    rows = con.execute("""
        SELECT id_a, id_b,
               CAST(levenshtein(a.text, b.text) AS INT),
               CASE WHEN greatest(length(a.text), length(b.text)) = 0
                    THEN CAST(1.0 AS DOUBLE)
                    ELSE CAST(1.0 AS DOUBLE)
                         - CAST(levenshtein(a.text, b.text) AS DOUBLE)
                           / CAST(greatest(length(a.text),
                                           length(b.text)) AS DOUBLE)
               END
        FROM p JOIN d a ON a.doc_id = p.id_a
        JOIN d b ON b.doc_id = p.id_b""").fetchall()
    want = {(a, b): (dd, ss) for a, b, dd, ss in rows}
    assert got == want


def test_edit_distance_bounded_matches_exact_below_threshold(spark):
    """VERDICT r14 #2: `max_dist` rides the threshold-bounded banded
    DP — below the bound the values are identical to the exact form;
    beyond it edit_dist/edit_sim are NULL (fail-visible "not verified
    within bound"), never a silently clamped number."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = spark.createDataFrame(PAIRS, "id_a long, id_b long")
    exact = {(r["id_a"], r["id_b"]): (r["edit_dist"], r["edit_sim"])
             for r in dedup.edit_distance_verify(
                 docs, pairs, n_docs=len(DOCS)).collect()}
    bounded = {(r["id_a"], r["id_b"]): (r["edit_dist"], r["edit_sim"])
               for r in dedup.edit_distance_verify(
                   docs, pairs, n_docs=len(DOCS), max_dist=5).collect()}
    for k, (d, s) in exact.items():
        if d <= 5:
            assert bounded[k] == (d, s), k
        else:
            assert bounded[k] == (None, None), k
    # the planted far pair really exercised the NULL branch
    assert exact[(1, 3)][0] > 5 and bounded[(1, 3)] == (None, None)


@pytest.mark.slow
def test_edit_distance_bounded_is_cheap_on_long_documents(spark):
    """The whole point of the knob: two ~60k-char near-identical
    documents are ~3.6e9 DP cells unbounded; the banded DP at
    max_dist=8 is O(8·n) and must return promptly with the exact
    small distance."""
    import time
    base = ("the quick brown fox jumps over the lazy dog " * 1400)
    docs = spark.createDataFrame(
        [(1, base + "tail one"), (2, base + "tail 2!")],
        "doc_id long, text string")
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    t0 = time.perf_counter()
    row = dedup.edit_distance_verify(
        docs, pairs, n_docs=2, max_dist=8).collect()[0]
    dt = time.perf_counter() - t0
    assert row["edit_dist"] == py_lev("tail one", "tail 2!")
    assert dt < 30, f"bounded path took {dt:.1f}s — band not engaged?"


def test_edit_distance_is_code_point_based_and_duckdb_is_not(spark):
    """ADVICE r14 #2 pinned: Spark levenshtein counts CODE POINTS
    (matching the Python DP reference on non-ASCII), DuckDB's counts
    BYTES — the documented divergence the q52 oracle guards against
    by failing loud on non-ASCII text."""
    duckdb = pytest.importorskip("duckdb")
    cases = [("é", "a"), ("héllo", "hallo"), ("日本語", "日本"),
             ("naïve", "naive")]
    docs = spark.createDataFrame(
        [(i, t) for i, (x, y) in enumerate(cases) for t in ()]
        + [(2 * i + off, t) for i, (x, y) in enumerate(cases)
           for off, t in ((0, x), (1, y))],
        "doc_id long, text string")
    pairs = spark.createDataFrame(
        [(2 * i, 2 * i + 1) for i in range(len(cases))],
        "id_a long, id_b long")
    got = {r["id_a"] // 2: r["edit_dist"]
           for r in dedup.edit_distance_verify(
               docs, pairs, n_docs=2 * len(cases)).collect()}
    con = duckdb.connect()
    diverged = 0
    for i, (x, y) in enumerate(cases):
        assert got[i] == py_lev(x, y), (x, y)   # code-point exact
        duck = con.execute("SELECT levenshtein(?, ?)", [x, y]).fetchone()[0]
        diverged += duck != got[i]
    assert diverged > 0                          # the guard is earning
    assert con.execute("SELECT levenshtein('é','a')").fetchone()[0] == 2


@pytest.mark.parametrize("max_dist", [None, 8])
def test_edit_distance_evaluates_the_dp_exactly_once(spark, max_dist):
    """Plan-pin for the single-evaluation barrier (VERDICT r15 next #1,
    ADVICE #4): the optimized plan must contain exactly ONE
    levenshtein call. Both edit_dist and edit_sim consume the
    distance; without the non-collapsible projection CollapseProject
    inlines the DP into every consumer (2 evaluations exact, 4
    bounded — 4x measured wall clock on long documents). The
    F.rand(7) guard defeats that today by leaning on Catalyst's
    refusal to collapse nondeterministic projections — undocumented
    behavior a Spark upgrade could silently change; this test turns
    the measured property into a contract that fails loud instead."""
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    pairs = spark.createDataFrame(PAIRS, "id_a long, id_b long")
    df = dedup.edit_distance_verify(docs, pairs, n_docs=len(DOCS),
                                    max_dist=max_dist)
    optimized = df._jdf.queryExecution().optimizedPlan().toString()
    n = optimized.lower().count("levenshtein")
    assert n == 1, f"expected exactly 1 levenshtein in the optimized " \
                   f"plan, found {n}:\n{optimized}"
