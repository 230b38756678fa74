"""Right-to-be-forgotten cascade (operators.corpus.forget_documents /
forget_cascade, X-FORGET): row scrub, whole-group scrub for mixed
artifacts (packed sequences), cascade over real derived artifacts,
idempotency, and the broadcast no-corpus-shuffle plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from snowflake_azure_etl_spark.operators import corpus, dedup, text

DOCS = [(i, " ".join(f"w{i}t{j}" for j in range(12)), "en")
        for i in range(8)]


def _frames(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string, lang string")
    chunks = text.chunk_documents(docs, size=5, stride=5)
    index = dedup.exact_dedup_groups(docs, "doc_id", "text") \
        .select(F.col("keeper_id").alias("doc_id"), "content_hash")
    return docs, chunks, index


def test_row_scrub_removes_requested_docs(spark):
    docs, chunks, index = _frames(spark)
    req = spark.createDataFrame([(2,), (5,)], "doc_id bigint")
    out = corpus.forget_documents(docs, req, n_requests=2)
    left = {r["doc_id"] for r in out.collect()}
    assert left == {0, 1, 3, 4, 6, 7}


def test_group_scrub_drops_whole_contaminated_groups(spark):
    # artifact rows mix docs within a group (seq_id): forgetting doc 1
    # must drop every row of every group containing doc 1
    rows = [(0, 10), (1, 10), (2, 11), (3, 11), (1, 12)]
    art = spark.createDataFrame(rows, "doc_id bigint, seq_id bigint")
    req = spark.createDataFrame([(1,)], "doc_id bigint")
    out = corpus.forget_documents(art, req, group_col="seq_id",
                                  n_requests=1)
    got = sorted((r["doc_id"], r["seq_id"]) for r in out.collect())
    assert got == [(2, 11), (3, 11)]   # groups 10 and 12 gone whole


def test_cascade_scrubs_every_artifact_and_is_idempotent(spark):
    docs, chunks, index = _frames(spark)
    req = spark.createDataFrame([(0,), (7,)], "doc_id bigint")
    arts = {"docs": docs, "chunks": chunks, "index": index}
    out = corpus.forget_cascade(arts, req, n_requests=2)
    for name, df in out.items():
        ids = {r["doc_id"] for r in df.select("doc_id").collect()}
        assert not ids & {0, 7}, name
        assert ids, name                       # survivors remain
    again = corpus.forget_cascade(out, req, n_requests=2)
    for name in out:
        assert again[name].count() == out[name].count(), name


def test_forget_plan_never_shuffles_artifact(spark):
    docs = spark.createDataFrame(DOCS, "doc_id bigint, text string, lang string")
    req = spark.createDataFrame([(1,)], "doc_id bigint")
    plan = (corpus.forget_documents(docs, req, n_requests=1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # the only exchange allowed is the request side's tiny distinct —
    # the artifact side streams straight into the broadcast anti-join
    assert plan.count("Exchange hashpartitioning") <= 1
