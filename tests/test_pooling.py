"""Grouped vector pooling + normalization (operators/similarity.py:
mean_pool / normalize_vec) vs numpy references, including the
ragged-group guard and the bounded-state plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import PythonException

from snowflake_azure_etl_spark.operators import similarity


def _df(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, chunk_idx int, embedding array<double>")


def test_mean_pool_matches_numpy(spark):
    rng = np.random.RandomState(7)
    rows, want = [], {}
    for d in range(6):
        chunks = rng.randint(1, 5)
        vecs = rng.randn(chunks, 8)
        want[d] = vecs.mean(axis=0)
        rows += [(d, i, [float(x) for x in vecs[i]])
                 for i in range(chunks)]
    got = {r["doc_id"]: np.array(r["embedding"]) for r in
           similarity.mean_pool(_df(spark, rows), ["doc_id"]).collect()}
    assert set(got) == set(want)
    for d in want:
        np.testing.assert_allclose(got[d], want[d], rtol=1e-12)


def test_mean_pool_ragged_group_raises(spark):
    rows = [(0, 0, [1.0, 2.0]), (0, 1, [1.0, 2.0, 3.0])]
    with pytest.raises(Exception) as e:
        similarity.mean_pool(_df(spark, rows), ["doc_id"]).collect()
    assert "ragged" in str(e.value)


def test_mean_pool_single_member_identity(spark):
    rows = [(0, 0, [1.5, -2.5, 0.0])]
    out = similarity.mean_pool(_df(spark, rows), ["doc_id"]).collect()
    assert out[0]["embedding"] == [1.5, -2.5, 0.0]


def test_normalize_vec(spark):
    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0])],
        "id bigint, v array<double>")
    got = {r["id"]: r["n"] for r in
           df.select("id",
                     similarity.normalize_vec("v").alias("n")).collect()}
    np.testing.assert_allclose(got[1], [0.6, 0.8], rtol=1e-12)
    assert got[2] == [0.0, 0.0]  # zero vector passes through
    # unit norm after normalization
    assert abs(np.linalg.norm(got[1]) - 1.0) < 1e-12


def test_mean_pool_state_is_dim_bounded(spark):
    """The plan must never collect member vectors into one aggregate
    state: the only collect_list runs over per-dim averages (state =
    one output vector per group). Guard: a 1000-member group with dim
    4 completes and the first aggregate is keyed by (group, _dim)."""
    rows = [(0, i, [1.0, 2.0, 3.0, 4.0]) for i in range(1000)]
    out = similarity.mean_pool(_df(spark, rows), ["doc_id"])
    got = out.collect()
    assert got[0]["embedding"] == [1.0, 2.0, 3.0, 4.0]
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "_dim" in plan


def test_mean_pool_empty_vector_raises(spark):
    """An empty vector inside a group must trip the guard, not be
    silently skipped (posexplode would drop it without a trace)."""
    rows = [(0, 0, [1.0, 2.0]), (0, 1, [])]
    with pytest.raises(Exception) as e:
        similarity.mean_pool(_df(spark, rows), ["doc_id"]).collect()
    assert "empty" in str(e.value) or "ragged" in str(e.value)
    # a group that is ALL empty raises too, rather than vanishing
    with pytest.raises(Exception):
        similarity.mean_pool(_df(spark, [(1, 0, [])]),
                             ["doc_id"]).collect()
