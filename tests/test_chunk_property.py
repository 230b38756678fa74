"""Property-based checks of the chunk-window math (r6: the stride ≤
size overlap contract): for ANY (n_tokens, size, stride ≤ size), the
windows tile the document with no uncovered token, chunk i starts at
token i·stride, and n_chunks matches the closed form."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import pytest

from pyspark.sql import functions as F

from snowflake_azure_etl_spark.operators import text as T


@st.composite
def chunk_case(draw):
    size = draw(st.integers(min_value=1, max_value=40))
    stride = draw(st.integers(min_value=1, max_value=size))
    n = draw(st.integers(min_value=1, max_value=200))
    return n, size, stride


@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(case=chunk_case())
@pytest.mark.slow
def test_chunk_windows_cover_every_token(spark, case):
    n, size, stride = case
    toks = [f"t{i}" for i in range(n)]
    df = spark.createDataFrame([(" ".join(toks),)], ["text"])
    row = df.select(
        T.n_chunks("text", size, stride).alias("nc"),
        T.chunk_texts("text", size, stride).alias("chunks")).first()
    # closed form
    want_nc = 1 + max(0, -(-(n - size) // stride)) if n > size else 1
    assert row.nc == want_nc == len(row.chunks)
    seen = set()
    for i, chunk in enumerate(row.chunks):
        got = chunk.split(" ")
        start = i * stride
        assert got == toks[start:start + size]   # window contract
        assert got, "empty chunk emitted"
        seen.update(range(start, start + len(got)))
    assert seen == set(range(n))                 # full coverage, no gap


def test_chunk_rejects_gap_stride(spark):
    with pytest.raises(ValueError, match="must be <="):
        T.chunk_texts("text", size=8, stride=9)
    with pytest.raises(ValueError, match="must be <="):
        T.n_chunks("text", size=8, stride=9)
