"""Physical-plan shape tests (SCALE.md contract): the scale-critical
plan properties — pushdown, pruning, broadcast joins, shuffle-free
narrow ops, top-k operators — asserted on `.explain` output so a
regression that silently changes the plan (not the result) still fails
CI."""

from __future__ import annotations

import contextlib
import io

import pytest

from snowflake_azure_etl_spark.workload import QUERIES


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def plan_of(spark, sf_dir, name: str) -> str:
    return explain_str(QUERIES[name].fn(spark, sf_dir))


def test_filter_pushdown_and_column_pruning(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q02_scan_project_filter")
    assert "PushedFilters: [" in plan
    assert "IsNotNull" in plan          # predicate reached the scan
    pushed = plan.split("PushedFilters:")[1].splitlines()[0]
    assert "GreaterThan" in pushed
    # projection pruned to the 6 referenced columns, not all 16
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_comment" not in read_schema
    assert "l_extendedprice" in read_schema


def test_star_join_broadcasts_dims(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q01_sales_summary")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # fact side must never shuffle
    # partial + final HashAggregate around the exchange = map-side combine
    assert plan.count("HashAggregate") >= 2


def test_fact_build_broadcasts_all_dim_lookups(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q28_fact_sales_build")
    assert plan.count("BroadcastHashJoin") >= 3  # customer/supplier/part
    assert "SortMergeJoin" not in plan


def test_src_target_build_broadcasts_resolutions(spark, sf_dir):
    """q64: the store/reseller/channel name resolutions are broadcast
    left joins — the fact side must never shuffle for a dim lookup."""
    plan = plan_of(spark, sf_dir, "q64_fact_src_target_build")
    assert plan.count("BroadcastHashJoin") >= 5  # supplier/nation + 3 roles
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q18_topk_orders")
    assert "TakeOrderedAndProject" in plan  # no global sort for top-k


def test_theta_join_is_bnl(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q09_theta_or_isnull_join")
    assert "BroadcastNestedLoopJoin" in plan


def _assert_q57_plan_shape(plan: str, budget: int) -> None:
    # the per-doc feature computation stays a narrow projection over
    # the WIDE corpus row; every exchange belongs to a declared
    # bounded-or-narrow side stage — the one-row token-frequency map
    # (token-keyed), the r7 tf-icf relation's (doc, token) tf
    # aggregate + token df aggregate + doc-keyed top-term window,
    # (r12) the bigram-LM tier's training counts (token/bigram-keyed),
    # (doc, w1, w2) bag aggregate, model joins, and per-doc score
    # re-aggregate, and (r12 second pass) the trigram tier's
    # additions: the floored trigram counts (gram-keyed), the
    # (doc, w1, w2, w3) bag aggregate, its five gram-keyed model
    # joins, its per-doc re-aggregate, and the tercile distribution's
    # distinct-score groupBy — all over narrow projections,
    # re-attached via the footer-attested broadcast (the packing
    # join-back pattern) so the wide corpus row itself never
    # shuffles; rangepartitioning never appears (the packing prefix
    # sum AND the r13 tercile-cuts build take their single-window
    # small paths at test scale — the parallel twins are pinned in
    # test_packing.py / test_lm.py). Per-STATE budgets replace the
    # old any-state 32-with-headroom (ADVICE r12): cold plans 19
    # exchanges (estimates broadcast more sides), prewarmed plans 32
    # (real InMemoryRelation stats SMJ two narrow gram joins); each
    # state gets its observed envelope +1, and the harness asserts
    # build-to-build equality so a new shuffle must be consciously
    # re-budgeted in the state it appears in.
    assert plan.count("hashpartitioning") <= budget
    assert "rangepartitioning" not in plan
    assert "Python" not in plan         # no UDF tax in the hot path
    # the top-term and LM join-backs must be broadcast at test scale
    assert "BroadcastHashJoin" in plan
    # any merge join may only move NARROW LM relations — doc-keyed
    # (score join-backs) or gram-keyed (the score-per-gram join of
    # (id, w1..wn) positions against per-gram terms); the wide corpus
    # row (its `text` column) never sorts/shuffles. Whether a given
    # narrow join plans as broadcast or SMJ is cache-state dependent
    # (artifacts already materialized carry InMemoryRelation stats),
    # so both keys are admitted — the per-STATE determinism is what
    # the two-state harness asserts. The regex can also catch
    # `[codegen id : N]` annotations — skip those.
    import re
    for frag in re.findall(r"SortMergeJoin \[([^\]]*)\]", plan):
        if frag.startswith("codegen"):
            continue
        # anchored on the attribute-ref form `name#id` so an
        # unrelated column merely containing "w1" can't satisfy the
        # pin; any of the LM gram keys (w1/w2/w3) or the doc key
        # qualifies — which model join SMJs is cache-state dependent
        assert re.search(r"\b(doc_id|w[123])#", frag), frag
        assert "text#" not in frag


@pytest.mark.parametrize("state,budget", [("cold", 20), ("prewarmed", 32)])
def test_text_stats_no_shuffle_no_python(spark, sf_dir, state, budget):
    """The q57 pin, in a FIXED artifact-cache state (VERDICT r12 #5):
    the plan was session-cache-state sensitive (28 exchanges solo vs
    30 mid-suite on identical code — whatever an earlier test happened
    to materialize changed broadcast-vs-SMJ picks), so the pin
    admitted a family. Now each state is pinned deterministically:
    `clear_cache` fixes the COLD state; one forced execution fixes the
    PREWARMED state (every artifact materialized); in both, two
    consecutive RAW builds (bypassing the prepared-statement object)
    must produce the same exchange count and pass the shape
    assertions."""
    from snowflake_azure_etl_spark.operators._cache import clear_cache
    from snowflake_azure_etl_spark.workload._registry import QUERIES as REG

    clear_cache(spark)
    if state == "prewarmed":
        (REG["q57_text_stats"].raw(spark, sf_dir)
         .write.format("noop").mode("overwrite").save())
    plans = [explain_str(REG["q57_text_stats"].raw(spark, sf_dir))
             for _ in range(2)]
    for plan in plans:
        _assert_q57_plan_shape(plan, budget)
    assert (plans[0].count("hashpartitioning")
            == plans[1].count("hashpartitioning")), \
        f"{state}: plan not deterministic across consecutive builds"
    assert (plans[0].count("SortMergeJoin")
            == plans[1].count("SortMergeJoin")), \
        f"{state}: join strategy not deterministic across builds"


def test_exact_dedup_single_shuffle(spark, sf_dir):
    """The exact-dedup CORE is one uniform content-hash shuffle. The
    q50 catalog query now composes it with the decontamination leg
    (its own hit aggregation + keeper join), so the single-shuffle
    invariant is pinned on the operator itself."""
    from snowflake_azure_etl_spark.operators import dedup
    from snowflake_azure_etl_spark.sources.registry import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    groups = dedup.exact_dedup_groups(docs, "doc_id", "text")
    plan = groups._jdf.queryExecution().executedPlan().toString()
    assert plan.count("hashpartitioning") <= 2   # tree + detail block
    assert "hashpartitioning" in plan
    assert "rangepartitioning" not in plan
    # and the composed q50 stays free of range exchanges / UDFs
    q50 = plan_of(spark, sf_dir, "q50_dedup_exact")
    assert "rangepartitioning" not in q50
    assert "Python" not in q50


def test_lsh_pairs_no_pairset_shuffle(spark, sf_dir):
    """The candidate pair set must stream out of the band join — no
    distinct/exchange over the (quadratic) pair set; the only exchanges
    are on the doc-sized inputs."""
    plan = plan_of(spark, sf_dir, "q51_dedup_minhash_lsh")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    after_join = plan.split("BroadcastHashJoin", 1)[0]
    # formatted plan lists operators leaf-last; the pair-consuming side
    # (above the join in the tree prefix) must not re-aggregate
    assert "HashAggregate" not in after_join.split("Union")[0].split("(1)")[0]


def test_dedup_no_corpus_broadcast_above_threshold(spark, sf_dir):
    """VERDICT r3 #1: the per-doc sides of the near-dup pipeline (band
    keys, bucket-width guard, token sets) are corpus-sized, so they must
    NOT broadcast when the corpus exceeds the size attestation — the
    plan has to shuffle-equi-join instead (a corpus-sized broadcast is
    an OOM at 100 TB). auto-broadcast is disabled to simulate
    corpus-scale statistics; only explicit hints could broadcast here."""
    from snowflake_azure_etl_spark.operators import dedup
    from snowflake_azure_etl_spark.sources.registry import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        sig = dedup.minhash_signature_shingled(docs, "doc_id", "text")
        pairs = dedup.lsh_candidate_pairs(sig, "doc_id", bands=2, rows=4,
                                          n_docs=10**9)
        plan = explain_str(pairs)
        assert "BroadcastExchange" not in plan
        assert "BroadcastHashJoin" not in plan
        # hashed-array Jaccard path: zero broadcasts of any kind
        jac = dedup.exact_jaccard(docs, pairs, "doc_id", "text",
                                  bitset_max_vocab=0, n_docs=10**9)
        assert "BroadcastExchange" not in explain_str(jac)
        # the small-corpus attestation still broadcasts (the fast path)
        small = dedup.lsh_candidate_pairs(sig, "doc_id", bands=2, rows=4,
                                          n_docs=100)
        assert "BroadcastHashJoin" in explain_str(small)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_kmv_two_phase_no_window(spark, sf_dir):
    """VERDICT r3 #4: the KMV sketch must merge k-minima through
    aggregates (bucketed slice(array_sort(...)) partials), never sort
    the full distinct set through a per-group Window. Asserted on the
    kmv_mins RELATION itself (r9: the q47 union now also carries the
    histogram legs, whose 16-row cumulative windows are by-design and
    would false-positive a whole-query 'no Window' sweep)."""
    from pyspark.sql import functions as F

    from snowflake_azure_etl_spark.operators.sketches import kmv_mins
    from snowflake_azure_etl_spark.sources.registry import load_tables
    e = load_tables(spark, sf_dir, ("events",))["events"]
    h = e.select("event_type",
                 F.md5(F.col("user_id").cast("string")).alias("hv"))
    rel = kmv_mins(h, "event_type", "hv", 16, n_rows=10_000)
    plan = rel._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # two SHUFFLED aggregate phases (per-bucket + per-group merge), each
    # compiling to partial+final HashAggregate — a regression to one
    # un-bucketed groupBy(...).agg(collect_set(...)) would count only 2
    # (ADVICE r4: >= 2 couldn't tell the difference)
    assert plan.count("Aggregate") >= 4
    # and the bucketing column must actually be in the plan
    assert "pmod" in plan and "xxhash64" in plan


def test_multimodal_uses_arrow_map(spark, sf_dir):
    plan = plan_of(spark, sf_dir, "q60_multimodal_pipeline")
    assert "MapInPandas" in plan        # Arrow-batched, not row UDF
    assert "BatchEvalPython" not in plan


def test_window_after_aggregate(spark, sf_dir):
    """W1-W4 contract: the window runs over the aggregated frame, so a
    HashAggregate appears below the Window in the plan."""
    plan = plan_of(spark, sf_dir, "q30_window_rank_over_agg")
    assert "Window" in plan and "HashAggregate" in plan
    assert plan.index("Window") < plan.index("HashAggregate") or \
        "AdaptiveSparkPlan" in plan


@pytest.mark.parametrize("name", ["q44_asof_join"])
def test_asof_join_single_shuffle(spark, sf_dir, name):
    """The as-of union+window plan: exchanges only for the key
    partitioning (+ the right-side dedupe), never a range-join blowup."""
    plan = plan_of(spark, sf_dir, name)
    assert "Window" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ivf_probe_is_equi_join_not_cross(spark, sf_dir):
    """The ivf_topk probe's candidate generation must be an equi-join
    on cell_id with the probe side broadcast — never a corpus×queries
    cross join. The only nested-loop joins allowed are the ONE-ROW
    centroid-array attachments (fan-out ×1 — the broadcast-variable
    pattern), never a join of two multi-row relations. (Pinned on the
    operator plan, not the whole q63 — the unioned semdedup leg's
    within-cell pair join shuffles on cell_id by design; see
    test_semdedup_pair_join_is_equi.)"""
    from pyspark.sql import functions as F

    from snowflake_azure_etl_spark.operators import similarity
    from snowflake_azure_etl_spark.sources.registry import load_tables
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    plan = explain_str(similarity.ivf_topk(
        emb, queries, "vec_id", "embedding",
        k=3, n_cells=8, nprobe=2, train_iters=2))
    assert "BroadcastHashJoin" in plan   # candidates: equi-join on cell_id
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan   # corpus side must never shuffle
    # any BNLJ present must be the one-row packed-centroid attach: the
    # collect_list aggregate that builds it must be in the plan, and
    # the candidate path itself must still be the hash equi-join
    # (formatted output repeats nodes across the cached-index subtree,
    # so only the shape — not the node count — is stable)
    if "BroadcastNestedLoopJoin" in plan:
        assert "collect_list" in plan


def test_semdedup_pair_join_is_equi(spark, sf_dir):
    """semantic_dedup's within-cell pair stage must be an equi-join on
    cell_id (shuffle allowed — the bounded-cell contract), never a
    cartesian of two multi-row relations."""
    from snowflake_azure_etl_spark.operators import similarity
    from snowflake_azure_etl_spark.sources.registry import load_tables
    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    plan = explain_str(similarity.semantic_dedup(
        emb, "vec_id", "embedding", n_cells=8, train_iters=2,
        threshold=0.4))
    assert "CartesianProduct" not in plan
    # the one-row centroid attach is the only NL join allowed
    if "BroadcastNestedLoopJoin" in plan:
        assert "collect_list" in plan


def test_ivf_recall_vs_brute_force(spark, sf_dir):
    """IVF is approximate; assert its recall@3 against the exact
    brute-force baseline stays high on the test corpus (nprobe=2 of 8
    cells). A plan bug (wrong cell assignment, dropped probes) craters
    this; the honest recall loss of probing 2/8 cells does not."""
    from pyspark.sql import functions as F
    from snowflake_azure_etl_spark.operators import similarity
    from snowflake_azure_etl_spark.sources.registry import load_tables

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    exact = similarity.brute_force_topk(emb, queries, "vec_id", "embedding", k=3)
    approx = similarity.ivf_topk(emb, queries, "vec_id", "embedding",
                                 k=3, n_cells=8, nprobe=2)
    exact_pairs = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    approx_pairs = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(exact_pairs & approx_pairs) / len(exact_pairs)
    assert recall >= 0.5, f"IVF recall@3 collapsed: {recall:.2f}"


def test_q50_lang_rides_the_dedup_aggregate(spark, sf_dir):
    """VERDICT r11 #1 'done' criterion: the keeper's lang is carried
    THROUGH the content-hash aggregate (min_by beside the keeper
    selection), not attached by a second corpus join — so no plan
    revision can reintroduce the corpus-sized broadcast the r11 audit
    flagged (the attestation sweep guards the hint class; this pins
    the aggregate shape)."""
    plan = plan_of(spark, sf_dir, "q50_dedup_exact")
    assert "min_by" in plan
