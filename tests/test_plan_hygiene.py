"""Catalog-wide physical-plan hygiene: EVERY registered query's
executed plan is checked for (a) zero row-at-a-time Python
(BatchEvalPython — the 10-100x slow path), (b) zero undeclared
cartesian products, and (c) BroadcastNestedLoopJoin / MapInPandas
only where the design declares them. A new query that slips a Python
UDF or an accidental cross join into the catalog fails here, not in a
100 TB run."""

from __future__ import annotations

import pathlib
import re

import pytest

import __spark_entry__ as entry
from snowflake_azure_etl_spark.plans import attest

#: Queries whose plan legitimately carries a BroadcastNestedLoopJoin:
#: the size-guarded theta join (q09), the interval range join (q45),
#: the declared brute-force ANN baseline (q54), and the ONE-ROW
#: broadcast attaches — centroid array (q63), token-frequency map
#: (q57), PageRank's per-round dangling-mass aggregate (q43 — visible
#: in the final plan since the fixed-3-round leg skips mid-loop
#: checkpoints), the funnel/retention denominators (q40 — the
#: one-row step-1 and total-users counts broadcast onto the leg rows),
#: and the r9 one-row stats rows: hourly anomaly moments (q41),
#: histogram total + quantile denominators (q47), BM25 corpus
#: stats (q58), and SQ8 per-dim bounds (q55). r11 adds q53 (the
#: substring index's one-row min_len provenance check, ADVICE r10)
#: and q50 (the DSIR importance model's one-row gram-total
#: normalizers riding the bucket-stats broadcast).
BNLJ_OK = {"q09_theta_or_isnull_join", "q45_range_join",
           "q54_ann_brute_force_topk", "q63_ann_ivf_topk",
           "q57_text_stats", "q43_events_json_props",
           "q40_events_tumbling_window", "q41_events_sliding_window",
           "q47_kmv_sketch", "q58_token_vocab",
           "q55_ann_lsh_bucketed_topk", "q53_dedup_simhash",
           "q50_dedup_exact"}

#: Queries whose plan legitimately carries Arrow-batched Python
#: (mapInPandas): the binary media pipeline.
ARROW_OK = {"q60_multimodal_pipeline"}


# --- broadcast attestation (VERDICT r11 #2) --------------------------------
# The r11 q50 defect class: a corpus-sized F.broadcast hint that no
# audit notices because it is invisible at test scale. Two structural
# guards make it impossible to write silently:
#  1. grep: no raw F.broadcast anywhere in the package — every hint
#     routes through plans.attest.bounded_broadcast, which demands a
#     measured n_rows or a declared construction bound, and caps the
#     declarable max at BROADCAST_MAX_ROWS (KEY_ONLY_MAX_ROWS for
#     narrow key-only projections).
#  2. verify: building every catalog query under attest.verify_mode()
#     counts each declared-bound side for real — a false "one-row
#     stats" claim fails the build, not a 100 TB run.

_PKG = pathlib.Path(__file__).resolve().parents[1] / "snowflake_azure_etl_spark"


def test_no_raw_broadcast_hints():
    offenders = []
    for py in sorted(_PKG.rglob("*.py")):
        if py.name == "attest.py" and py.parent.name == "plans":
            continue
        for i, line in enumerate(py.read_text().splitlines(), 1):
            code = line.split("#", 1)[0]
            # \bbroadcast( catches F.broadcast / sf.broadcast / a bare
            # `from pyspark.sql.functions import broadcast` call alike
            # (review finding r12: the literal substrings missed
            # aliased imports); bounded_/_maybe_ have a word char
            # before 'broadcast', so the sanctioned wrappers don't
            # match. No space allowed before '(' — prose in docstrings
            # says "broadcast (x)" but code calls broadcast(x).
            if re.search(r"\bbroadcast\(", code):
                offenders.append(f"{py.relative_to(_PKG)}:{i}: {line.strip()}")
    assert not offenders, (
        "raw broadcast hint(s) outside plans.attest — route through "
        "bounded_broadcast with an attested bound:\n" + "\n".join(offenders))


def test_bounded_broadcast_rejects_unattested_and_oversized(spark):
    df = spark.range(3).toDF("x")
    with pytest.raises(ValueError, match="unattested"):
        attest.bounded_broadcast(df)
    with pytest.raises(ValueError, match="cap"):
        attest.bounded_broadcast(df, bound="laundered",
                                 max_rows=10**12)
    # n_rows over the cap returns the side UNhinted (AQE decides)
    out = attest.bounded_broadcast(df, n_rows=attest.BROADCAST_MAX_ROWS + 1)
    assert "ResolvedHint" not in out._jdf.queryExecution().analyzed().toString()


def test_key_only_cap_rejects_wide_relations(spark):
    """VERDICT r12 #6: the KEY_ONLY 5M cap is for narrow key
    projections only — the width half of the claim is now a schema
    assertion on EVERY call (no job needed), so a wide or
    payload-typed relation cannot launder through the bigger cap."""
    from pyspark.sql import functions as F
    wide = spark.range(3).select(
        "id", F.col("id").alias("a"), F.col("id").alias("b"),
        F.col("id").alias("c"))                       # 4 columns
    with pytest.raises(ValueError, match="narrow key projection"):
        attest.bounded_broadcast(wide, bound="planted wide (4 cols)",
                                 key_only=True,
                                 max_rows=attest.KEY_ONLY_MAX_ROWS)
    payload = spark.range(3).select(
        "id", F.array(F.lit("x")).alias("toks"))      # array payload
    with pytest.raises(ValueError, match="non-key type"):
        attest.bounded_broadcast(payload, bound="planted payload col",
                                 key_only=True,
                                 max_rows=attest.KEY_ONLY_MAX_ROWS)
    # the measured form can't dodge the width check either
    with pytest.raises(ValueError, match="narrow key projection"):
        attest.bounded_broadcast(wide, n_rows=3, key_only=True)
    # a genuinely narrow key map still passes and hints — including
    # an int32 key (typeName 'integer'; r13 review: the whitelist
    # spelled it 'int' and falsely rejected every IntegerType column)
    keys = spark.range(3).select(F.col("id").cast("int").alias("k"),
                                 F.col("id").alias("sk"))
    ok = attest.bounded_broadcast(keys, bound="2-col key map",
                                  key_only=True,
                                  max_rows=attest.KEY_ONLY_MAX_ROWS)
    assert "ResolvedHint" in ok._jdf.queryExecution().analyzed().toString()


def test_verify_mode_is_red_on_a_false_bound(spark):
    # the planted corpus-side hint: claims one-row, is 3 rows
    df = spark.range(3).toDF("x")
    with attest.verify_mode():
        with pytest.raises(AssertionError, match="attestation .* FALSE"):
            attest.bounded_broadcast(df, bound="one-row (planted lie)",
                                     max_rows=1)
        # a true bound passes and hints
        ok = attest.bounded_broadcast(df, bound="3 literals", max_rows=3)
    assert "ResolvedHint" in ok._jdf.queryExecution().analyzed().toString()


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_catalog_broadcast_bounds_verified(spark, sf_dir, name):
    """Build each catalog query from its RAW builder (bypassing the
    prepared-statement cache) under verify_mode: every declared
    construction bound in the plan's broadcast sides is counted for
    real at this SF. A q50-class corpus-sized claim dies here."""
    from snowflake_azure_etl_spark.workload._registry import QUERIES
    with attest.verify_mode():
        df = QUERIES[name].raw(spark, sf_dir)
    assert df.columns  # plan built, all bounds held


@pytest.mark.parametrize("name", sorted(entry.queries()))
def test_catalog_plan_hygiene(spark, sf_dir, name):
    df = entry.queries()[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, \
        f"{name}: row-at-a-time Python UDF in the plan"
    assert "CartesianProduct" not in plan, \
        f"{name}: undeclared cartesian product"
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, \
            f"{name}: undeclared nested-loop join"
    if name not in ARROW_OK:
        assert "MapInPandas" not in plan and \
            "ArrowEvalPython" not in plan, \
            f"{name}: undeclared Python stage"
