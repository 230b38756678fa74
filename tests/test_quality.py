"""Data-quality validation (warehouse/quality.py): each rule family
vs hand-counted fixtures, the one-scan plan contract, and validation
errors."""

from __future__ import annotations

import pytest

from snowflake_azure_etl_spark.warehouse.quality import Rule, validate

ROWS = [
    (1, "A", 0.00),
    (2, "A", 0.05),
    (2, "R", 0.10),      # duplicate key, out-of-range value
    (None, "X", -0.01),  # null key, bad segment, out-of-range value
    (4, None, 0.02),     # NULL segment: exempt from accepted_values
]


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        ROWS, "k bigint, seg string, disc double")


def test_each_rule_family(spark, df):
    got = {r["rule"]: (r["n_violations"], r["passed"]) for r in validate(
        df, [Rule("not_null", "k"),
             Rule("unique", "k"),
             Rule("accepted_values", "seg", values=("A", "N", "R")),
             Rule("in_range", "disc", lo=0.0, hi=0.05)]).collect()}
    assert got["k_not_null"] == (1, False)
    assert got["k_unique"] == (1, False)          # one extra '2'
    assert got["seg_accepted_values"] == (1, False)  # 'X'; NULL exempt
    assert got["disc_in_range"] == (2, False)     # 0.10 and -0.01


def test_all_pass_on_clean_table(spark):
    clean = spark.createDataFrame([(1, "A"), (2, "N")],
                                  "k bigint, seg string")
    out = validate(clean, [Rule("not_null", "k"), Rule("unique", "k"),
                           Rule("accepted_values", "seg",
                                values=("A", "N"))]).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in out)


def test_single_scan_plan(spark, df):
    """All rules compile into one aggregate over one scan — the plan
    must contain exactly one scan of the input and no join."""
    out = validate(df, [Rule("not_null", "k"), Rule("unique", "k"),
                        Rule("in_range", "disc", lo=0, hi=1)])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") == 1
    assert "Join" not in plan


def test_validation_errors(spark, df):
    with pytest.raises(ValueError):
        validate(df, [])
    with pytest.raises(ValueError):
        validate(df, [Rule("accepted_values", "seg")])
    with pytest.raises(ValueError):
        validate(df, [Rule("in_range", "disc", lo=0.0)])
    with pytest.raises(ValueError):
        validate(df, [Rule("bogus", "k")])
    with pytest.raises(ValueError):
        validate(df, [Rule("not_null", "k"), Rule("unique", "k",
                                                  name="k_not_null")])
