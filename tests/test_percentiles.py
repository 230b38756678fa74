"""Exact vs approximate percentile contract (q11's A10 measures):
`F.percentile` is the exact interpolated aggregate the oracle checks;
`approx_percentile` is the bounded-state 100 TB path — same plan
shape, accuracy within its documented bound."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_exact_percentile_interpolates(spark):
    df = spark.createDataFrame([(float(v),) for v in range(1, 5)], "x double")
    row = df.agg(F.percentile("x", F.lit(0.5)).alias("m"),
                 F.percentile("x", F.lit(0.25)).alias("q1")).collect()[0]
    assert row["m"] == 2.5        # (2+3)/2 — continuous interpolation
    assert row["q1"] == 1.75


def test_approx_percentile_tracks_exact(spark, sf_dir):
    from snowflake_azure_etl_spark.sources.registry import load_tables
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    row = (li.agg(F.percentile("l_extendedprice", F.lit(0.5)).alias("exact"),
                  F.approx_percentile("l_extendedprice", F.lit(0.5),
                                      F.lit(10000)).alias("approx"))
           .collect()[0])
    # accuracy=10000 bounds rank error at n/10000; translate to a loose
    # value tolerance via the observed spread
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.02
