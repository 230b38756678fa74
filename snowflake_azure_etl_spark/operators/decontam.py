"""Benchmark decontamination (X-DECONTAM): drop training documents
that share an n-gram with an evaluation/benchmark set.

Training-corpus hygiene standard practice (GPT-3 App. C / PaLM /
Llama report decontamination): a training document is *contaminated*
when any of its word n-grams (n≈8-13 published; parameterized here)
also occurs in a held-out benchmark, because even partial overlap
inflates eval scores. The reference repo has no analog (it is a
Snowflake retail ETL); this module is part of the engine's
LLM-data-pipeline tier beside `operators.dedup` / `operators.corpus`.

100 TB design:

- The benchmark side is structurally BOUNDED: eval suites are
  ~10^4-10^6 grams no matter how big the training corpus is, so the
  distinct eval-gram relation is always the broadcast side of the
  probe join — the corpus never shuffles to discover contamination.
  The bound is still attested, never assumed: callers pass
  ``n_eval_grams`` (or the eval-doc count upper bound) and the join
  falls back to a shuffle equi-join above
  ``dedup.BROADCAST_MAX_ROWS``, mirroring `dedup._maybe_broadcast`.
- The probe side is one linear explode of per-doc distinct n-grams —
  no corpus self-join anywhere; grams are compared as fixed-width md5
  digests so the join key never carries n·avg_word bytes of text.
- The hit aggregation (`groupBy(doc_id)`) shuffles ONLY matched gram
  rows. Contamination is rare by construction (benchmarks are tiny vs
  the corpus), so this shuffle is hit-proportional, not
  corpus-proportional.
- `decontaminate` finishes with a LEFT ANTI join of the corpus
  against the contaminated-id relation — broadcastable exactly when
  the hit relation is attested small, else a shuffle anti-join.

Everything is JVM-side Catalyst expressions (the shingle unit is
`dedup.word_shingles`, the same zip_with chain the MinHash stack
uses), so the whole pipeline is oracle-expressible in ANSI SQL and is
hash-checked by the driver as a q50 leg.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import BROADCAST_MAX_ROWS, _maybe_broadcast, word_shingles

#: Published decontamination filters use 8-13 word n-grams; 8 is the
#: conservative (highest-recall) end of that range.
DECONTAM_N = 8

#: Generous per-document distinct-gram cap for deriving an eval-side
#: row bound from an eval DOC count (callers who materialized the gram
#: set attest its exact count instead). A doc has fewer n-grams than
#: tokens; benchmark items are prompts/questions, far under this.
MAX_GRAMS_PER_DOC = 4096


def _gram_digests(df: DataFrame, id_col: str, text_col: str,
                  n: int) -> DataFrame:
    """(id, gram-digest) pairs: one row per distinct word n-gram per
    document, as fixed-width md5 digests (hash-once discipline —
    `dedup.md5_digest_seeded`'s rationale)."""
    return df.select(
        F.col(id_col),
        F.explode(F.transform(word_shingles(text_col, n), F.md5))
        .alias("gram"))


def eval_gram_set(eval_docs: DataFrame, text_col: str = "text",
                  n: int = DECONTAM_N) -> DataFrame:
    """The distinct benchmark n-gram relation (column ``gram``):
    the bounded artifact a production pipeline materializes ONCE per
    benchmark release and reuses across every training-corpus sweep."""
    return (eval_docs
            .select(F.explode(F.transform(word_shingles(text_col, n),
                                          F.md5)).alias("gram"))
            .distinct())


def contamination_hits(docs: DataFrame, eval_docs: DataFrame,
                       id_col: str = "doc_id", text_col: str = "text",
                       n: int = DECONTAM_N,
                       n_eval_grams: int | None = None,
                       broadcast_max_rows: int = BROADCAST_MAX_ROWS
                       ) -> DataFrame:
    """Per-contaminated-document overlap accounting:
    (id, contam_hits = number of distinct doc n-grams present in the
    benchmark). Documents with zero overlap do NOT appear — the
    relation is hit-proportional, the anti-join input for
    `decontaminate` and the audit artifact a pipeline logs.

    ``n_eval_grams``: attested upper bound on the benchmark gram count
    (eval-doc count × max grams/doc is a fine bound); under
    ``broadcast_max_rows`` the probe join broadcasts the benchmark
    side, otherwise it shuffle-equi-joins on the digest."""
    return contamination_hits_against(
        docs, eval_gram_set(eval_docs, text_col, n), id_col, text_col,
        n, n_eval_grams, broadcast_max_rows)


def contamination_hits_against(docs: DataFrame, eval_grams: DataFrame,
                               id_col: str = "doc_id",
                               text_col: str = "text",
                               n: int = DECONTAM_N,
                               n_eval_grams: int | None = None,
                               broadcast_max_rows: int =
                               BROADCAST_MAX_ROWS) -> DataFrame:
    """`contamination_hits` against an already-MATERIALIZED benchmark
    gram relation (column ``gram`` — the `eval_gram_set` artifact a
    pipeline persists once per benchmark release): the probe path for
    callers that must not re-derive the gram set per use — the
    streaming per-micro-batch sink (`streaming.ingest
    .decontam_ingest_sink`) and multi-corpus sweeps."""
    ev = _maybe_broadcast(eval_grams.select("gram"),
                          n_eval_grams, broadcast_max_rows)
    grams = _gram_digests(docs, id_col, text_col, n)
    return (grams.join(ev, "gram")
            .groupBy(id_col)
            .agg(F.count("*").alias("contam_hits")))


def decontaminate(docs: DataFrame, eval_docs: DataFrame,
                  id_col: str = "doc_id", text_col: str = "text",
                  n: int = DECONTAM_N,
                  n_eval_grams: int | None = None,
                  n_hit_docs: int | None = None) -> DataFrame:
    """The scrub: training corpus minus every document sharing an
    n-gram with the benchmark — a LEFT ANTI equi-join on the id.

    ``n_hit_docs`` attests the contaminated-id relation small enough
    to broadcast (callers that ran `contamination_hits` for the audit
    log know the exact count; an upper bound is fine)."""
    hits = contamination_hits(docs, eval_docs, id_col, text_col, n,
                              n_eval_grams).select(id_col)
    return docs.join(_maybe_broadcast(hits, n_hit_docs),
                     id_col, "left_anti")
