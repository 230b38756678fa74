"""Semantic decontamination (operators.similarity.semantic_decontam,
X-DECONTAM-SEMANTIC): train rows near a benchmark vector are flagged,
dissimilar rows are not, eval rows never appear in the output, and hit
counts/max-sim match a Python within-cell reference."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from snowflake_azure_etl_spark.operators import similarity


def _vec(i, dim=16, eps=0.0, base=None):
    v = [0.0] * dim
    if base is not None:
        v = list(base)
        v[(i * 7) % dim] += eps
    else:
        v[i % dim] = 1.0
    n = math.sqrt(sum(x * x for x in v))
    return [x / n for x in v]


def _run(spark, rows, eval_ids, **kw):
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")
    ev = spark.createDataFrame([(i,) for i in eval_ids],
                               "vec_id bigint")
    return {r["id"]: r for r in similarity.semantic_decontam(
        emb, ev, "vec_id", "embedding", **kw).collect()}


def test_planted_contamination_flagged(spark):
    a, b = _vec(0), _vec(1)
    rows = [(0, a), (1, b), (2, _vec(2)), (3, _vec(3)),
            # 100 is a near-copy of eval vector 0 -> contaminated
            (100, _vec(10, eps=0.01, base=a)),
            # 120 is orthogonal to everything -> clean
            (120, _vec(5))]
    got = _run(spark, rows, eval_ids=[0, 1],
               n_cells=4, train_iters=0, threshold=0.95)
    # eval rows never appear as train output rows
    assert 0 not in got and 1 not in got
    assert got[100]["is_contaminated"] and got[100]["n_hits"] == 1
    assert got[100]["max_sim"] >= 0.95
    for tid in (2, 3, 120):
        assert not got[tid]["is_contaminated"]
        assert got[tid]["n_hits"] == 0 and got[tid]["max_sim"] is None


def test_matches_python_within_cell_reference(spark):
    """Hit counts and max similarity equal a Python replay over the
    SAME cell assignment (read back from the shared _ivf_index)."""
    rows = [(i, _vec(i)) for i in range(4)] + [
        (100, _vec(9, eps=0.05, base=_vec(0))),
        (101, _vec(8, eps=0.02, base=_vec(1))),
        (102, _vec(7, eps=0.4, base=_vec(2))),
    ]
    eval_ids = [0, 1, 2]
    tau = 0.9
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>")
    ev = spark.createDataFrame([(i,) for i in eval_ids],
                               "vec_id bigint")
    out = {r["id"]: r for r in similarity.semantic_decontam(
        emb, ev, "vec_id", "embedding", n_cells=4, train_iters=0,
        threshold=tau).collect()}
    _, assigned = similarity._ivf_index(emb, "vec_id", "embedding",
                                        4, 0)
    cells = {r["neighbor_id"]: (r["cell_id"], r["cv"])
             for r in assigned.collect()}

    def cos(x, y):
        d = sum(p * q for p, q in zip(x, y))
        nx = math.sqrt(sum(p * p for p in x))
        ny = math.sqrt(sum(q * q for q in y))
        return d / (nx * ny)

    for tid in (t for t, _ in rows if t not in eval_ids):
        tc, tv = cells[tid]
        sims = [cos(tv, cells[e][1]) for e in eval_ids
                if cells[e][0] == tc]
        hits = [s for s in sims if s >= tau]
        assert out[tid]["n_hits"] == len(hits)
        if hits:
            assert abs(out[tid]["max_sim"] - max(hits)) < 1e-12
        else:
            assert out[tid]["max_sim"] is None


def test_cross_cell_near_hit_is_missed_by_contract(spark):
    """The published approximation: a near-pair split across cells is
    not compared. Seeds 0/1 define two cells; a train vector assigned
    to cell 1 is never checked against an eval vector in cell 0."""
    a, b = _vec(0), _vec(1)
    mid = [x + y for x, y in zip(a, b)]          # between the cells
    n = math.sqrt(sum(x * x for x in mid))
    mid = [x / n for x in mid]
    rows = [(0, a), (1, b), (100, mid)]
    got = _run(spark, rows, eval_ids=[0],
               n_cells=2, train_iters=0, threshold=0.5)
    r = got[100]
    if r["is_contaminated"]:
        # if 100 landed in eval 0's cell the hit must be real
        assert r["max_sim"] >= 0.5
    else:
        # landed in cell 1: cos(mid, a) ~= 0.707 >= tau, but the
        # cross-cell pair is out of contract
        assert r["n_hits"] == 0


def test_multi_probe_catches_cross_cell_hit_single_probe_misses(spark):
    """VERDICT r10 #3: the deterministic version of the cross-cell
    contract test — a train vector leaning into the OTHER cell misses
    its eval near-hit at nprobe=1 and reports it at nprobe=2 (the
    train side probes both cells; the report's cell_id stays the
    primary assignment)."""
    a, b = _vec(0), _vec(1)
    lean = [x + 1.05 * y for x, y in zip(a, b)]
    n = math.sqrt(sum(x * x for x in lean))
    lean = [x / n for x in lean]                  # primary cell 1
    rows = [(0, a), (1, b), (100, lean)]
    tau = 0.5                                     # cos(lean, a) ≈ 0.69
    single = _run(spark, rows, eval_ids=[0], n_cells=2,
                  train_iters=0, threshold=tau)
    assert not single[100]["is_contaminated"]
    assert single[100]["n_hits"] == 0
    multi = _run(spark, rows, eval_ids=[0], n_cells=2,
                 train_iters=0, threshold=tau, nprobe=2)
    assert multi[100]["is_contaminated"]
    assert multi[100]["n_hits"] == 1
    assert abs(multi[100]["max_sim"]
               - sum(p * q for p, q in zip(lean, a))) < 1e-12
    assert multi[100]["cell_id"] == single[100]["cell_id"]
