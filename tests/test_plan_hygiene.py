"""Catalog-wide physical-plan hygiene: EVERY registered query's
executed plan is checked for (a) zero row-at-a-time Python
(BatchEvalPython — the 10-100x slow path), (b) zero undeclared
cartesian products, and (c) BroadcastNestedLoopJoin / MapInPandas
only where the design declares them. A new query that slips a Python
UDF or an accidental cross join into the catalog fails here, not in a
100 TB run."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

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
