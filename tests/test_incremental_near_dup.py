"""Incremental near-dup candidates (dedup.incremental_near_dup_candidates,
X-DEDUP-INCR-NEAR): batch-vs-index recall parity with the full-corpus
pipeline, intra-batch pairs, planted near-dups, and the broadcast
index-never-reshuffles plan."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from snowflake_azure_etl_spark.operators import dedup

BANDS, ROWS = 4, 2

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog tonight"),
    (2, "completely different content about spark execution plans"),
    (3, "yet another unrelated document mentioning window functions"),
]
BATCH = [
    (10, "the quick brown fox jumps over the lazy dog today"),   # near 1
    (11, "a fresh never seen before document about streaming"),
    (12, "a fresh never seen before document about streaming!"),  # near 11
]


def _index(spark, docs):
    corpus = spark.createDataFrame(docs, "doc_id bigint, text string")
    sig = dedup.minhash_signature_shingled(corpus, "doc_id", "text",
                                           k=BANDS * ROWS)
    return dedup.band_key_index(sig, "doc_id", BANDS, ROWS)


def _pairs(df):
    return {(r["id_new"], r["id_match"], r["source"]) for r in df.collect()}


def test_planted_near_dups_found(spark):
    batch = spark.createDataFrame(BATCH, "doc_id bigint, text string")
    got = _pairs(dedup.incremental_near_dup_candidates(
        batch, _index(spark, CORPUS), bands=BANDS, rows=ROWS,
        n_new=len(BATCH), n_index=len(CORPUS)))
    cross = {(a, b) for a, b, s in got if s == "index"}
    intra = {(a, b) for a, b, s in got if s == "batch"}
    assert (10, 1) in cross          # planted batch-vs-corpus near-dup
    assert (11, 12) in intra         # planted intra-batch near-dup
    # the unrelated corpus docs never pair with the fresh batch docs
    assert not {(11, 2), (11, 3), (12, 2), (12, 3)} & cross


def test_recall_parity_with_full_pipeline(spark):
    """Every (new, old) and (new, new) candidate the FULL-corpus LSH
    run finds must also be found incrementally (same bands/rows — the
    index path may not lose recall; first-match band assignment may
    differ, the SET may not)."""
    all_docs = CORPUS + BATCH
    full = spark.createDataFrame(all_docs, "doc_id bigint, text string")
    sig = dedup.minhash_signature_shingled(full, "doc_id", "text",
                                           k=BANDS * ROWS)
    full_pairs = {(r["id_a"], r["id_b"]) for r in
                  dedup.lsh_candidate_pairs(
                      sig, "doc_id", bands=BANDS, rows=ROWS,
                      n_docs=len(all_docs), cache_keys=False).collect()}
    new_ids = {d for d, _ in BATCH}
    want = {(a, b) for a, b in full_pairs if a in new_ids or b in new_ids}

    batch = spark.createDataFrame(BATCH, "doc_id bigint, text string")
    got = _pairs(dedup.incremental_near_dup_candidates(
        batch, _index(spark, CORPUS), bands=BANDS, rows=ROWS,
        n_new=len(BATCH), n_index=len(CORPUS)))
    got_norm = {tuple(sorted((a, b))) for a, b, _ in got}
    want_norm = {tuple(sorted(p)) for p in want}
    assert want_norm <= got_norm


def test_reingested_doc_does_not_pair_with_itself(spark):
    batch = spark.createDataFrame(CORPUS[:1], "doc_id bigint, text string")
    got = _pairs(dedup.incremental_near_dup_candidates(
        batch, _index(spark, CORPUS), bands=BANDS, rows=ROWS,
        n_new=1, n_index=len(CORPUS)))
    assert (1, 1, "index") not in got


def test_index_side_never_reshuffles_under_attestation(spark):
    batch = spark.createDataFrame(BATCH, "doc_id bigint, text string")
    plan = (dedup.incremental_near_dup_candidates(
                batch, _index(spark, CORPUS), bands=BANDS, rows=ROWS,
                n_new=len(BATCH), n_index=len(CORPUS))
            ._jdf.queryExecution().executedPlan().toString())
    # batch side broadcasts into every band probe; the only hash
    # exchanges belong to the batch/intra signature aggregates
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan

def test_active_guard_is_per_band_not_cumulative(spark):
    """An index doc over-wide in band 0 must still probe bands 1..n
    (review finding r7): the index is hand-built so docs 1 and 2 share
    the batch doc's band-0 key (TOTAL width 3 with the batch doc
    itself > max_bucket=2 ⇒ band 0 dropped) while ONLY doc 1 shares
    its band-1 key (total width 2 ⇒ kept). Per-band guarding finds
    (10, 1) via band 1; the cumulative left-semi chain would have
    evicted doc 1 from EVERY band at the band-0 filter and found
    nothing."""
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta one two three")],
        "doc_id bigint, text string")
    sig = dedup.minhash_signature_shingled(batch, "doc_id", "text",
                                           k=BANDS * ROWS)
    bk = dedup.band_key_index(sig, "doc_id", BANDS, ROWS).collect()[0]
    rows = [
        (1, bk["_k0"], bk["_k1"], 111, 112),   # shares bands 0 AND 1
        (2, bk["_k0"], 221, 222, 223),         # shares band 0 only
    ]
    idx = spark.createDataFrame(
        rows, "_id bigint, _k0 bigint, _k1 bigint, _k2 bigint, _k3 bigint")
    got = {(a, b) for a, b, s in _pairs(
        dedup.incremental_near_dup_candidates(
            batch, idx, bands=BANDS, rows=ROWS, max_bucket=2))
        if s == "index"}
    assert got == {(10, 1)}


@pytest.mark.slow
def test_guard_width_is_total_not_per_side(spark):
    """Parity under an ACTIVE guard with a straddling bucket (the r8
    fix for the r7 advisor finding): 5 identical docs — 3 in the
    index, 2 in the batch — share every band bucket, so each bucket's
    TOTAL width is 5. With max_bucket=4 a full run over the merged
    corpus drops every bucket (0 pairs); an incremental run guarding
    on index-only (3 ≤ 4) or batch-only (2 ≤ 4) widths would wrongly
    emit cross and intra pairs. With max_bucket=5 both runs keep the
    bucket, and the incremental set must equal exactly the full-run
    pairs touching a batch doc."""
    text = "same exact words in every single one of these documents"
    index_docs = [(i, text) for i in (1, 2, 3)]
    batch_docs = [(i, text) for i in (10, 11)]
    batch = spark.createDataFrame(batch_docs, "doc_id bigint, text string")

    def incr(mb):
        return {tuple(sorted((a, b))) for a, b, _ in _pairs(
            dedup.incremental_near_dup_candidates(
                batch, _index(spark, index_docs),
                bands=BANDS, rows=ROWS, max_bucket=mb))}

    def full(mb):
        sig = dedup.minhash_signature_shingled(
            spark.createDataFrame(index_docs + batch_docs,
                                  "doc_id bigint, text string"),
            "doc_id", "text", k=BANDS * ROWS)
        pairs = dedup.lsh_candidate_pairs(
            sig, "doc_id", bands=BANDS, rows=ROWS, max_bucket=mb,
            cache_keys=False).collect()
        return {tuple(sorted((r["id_a"], r["id_b"]))) for r in pairs
                if r["id_a"] >= 10 or r["id_b"] >= 10}

    assert incr(4) == full(4) == set()          # straddling bucket dropped
    kept = incr(5)
    assert kept == full(5)
    assert kept == {(1, 10), (2, 10), (3, 10),   # cross
                    (1, 11), (2, 11), (3, 11),
                    (10, 11)}                    # intra


def test_lsh_pairs_emit_at_first_surviving_band(spark):
    """Same surviving-band contract on the batch operator
    (dedup.lsh_candidate_pairs): docs A=1/B=2 share BOTH band keys and
    X=3 widens band 0's bucket past the cap — the pair (1,2) must
    emit via band 1 (width 2 <= cap) even though its FIRST matching
    band was guard-dropped."""
    sig = spark.createDataFrame(
        [(1, "x", "y"), (2, "x", "y"), (3, "x", "z")],
        "doc_id bigint, h0 string, h1 string")
    got = {(r["id_a"], r["id_b"]) for r in dedup.lsh_candidate_pairs(
        sig, "doc_id", bands=2, rows=1, max_bucket=2,
        cache_keys=False).collect()}
    assert got == {(1, 2)}
    # guard inactive: band 0's width-3 bucket is allowed, so all three
    # docs pair through it — and each pair exactly once
    got2 = [tuple(r) for r in dedup.lsh_candidate_pairs(
        sig, "doc_id", bands=2, rows=1, max_bucket=100, n_docs=3,
        cache_keys=False).select("id_a", "id_b").collect()]
    assert sorted(got2) == [(1, 2), (1, 3), (2, 3)]
