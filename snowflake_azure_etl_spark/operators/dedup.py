"""Deduplication operators for LLM training-data pipelines.

Beyond the reference surface (north-star extension): exact dedup,
MinHash + LSH near-dup candidate generation, exact-Jaccard verification,
and SimHash — all as compositions of built-in Catalyst expressions (no
Python UDFs; the hash primitive is md5(), which is JVM-side in Spark and
identical in DuckDB, making every stage oracle-checkable).

Scale design (100 TB of documents):
- every stage is embarrassingly parallel until the band-bucket self-join;
  that join shuffles on the band key, whose cardinality grows with the
  corpus, so buckets stay small for non-degenerate data;
- bucket-size guard: `lsh_candidate_pairs` caps bucket width
  (max_bucket) so one degenerate bucket (all-identical boilerplate docs)
  cannot produce a quadratic pair explosion — the standard production
  mitigation, applied before the pair join, and deterministic (overflow
  buckets are dropped whole, not sampled);
- md5 is used for portability with the DuckDB oracle; swap
  `xxhash64(...)` (cheaper, also built-in) via `hash_fn` at scale.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ws_tokens(text: Column | str) -> Column:
    """Whitespace tokens; single-space split matches the oracle's
    string_split(text, ' ') exactly (no regex dialect drift)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def md5_seeded(seed: int, token: Column) -> Column:
    """Portable seeded hash: md5('<seed>:' || token)."""
    return F.md5(F.concat(F.lit(f"{seed}:"), token))


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup via content-hash group-by: one row per distinct
    content with the keeper (min id) and the duplicate count.
    Hash-groupBy is the 100 TB-safe exact method: one shuffle on a
    uniformly distributed 128-bit key."""
    return (df.groupBy(F.md5(F.col(text_col)).alias("content_hash"))
            .agg(F.min(id_col).alias("keeper_id"),
                 F.count("*").alias("n_copies")))


def minhash_signature(df: DataFrame, id_col: str, text_col: str,
                      k: int = 8,
                      hash_fn: Callable[[int, Column], Column] = md5_seeded
                      ) -> DataFrame:
    """k-permutation MinHash over distinct whitespace shingles.

    Explode distinct tokens, then k min-aggregates of seeded hashes —
    one shuffle on the doc id, k JVM-side min(md5) aggregations. The
    min of a hex string is the min of the hash value (fixed-width hex),
    so signatures are totally portable across engines.
    """
    toks = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(ws_tokens(text_col))).alias("tok"))
    aggs = [F.min(hash_fn(i, F.col("tok"))).alias(f"h{i}") for i in range(k)]
    return toks.groupBy(id_col).agg(*aggs)


def lsh_band_keys(sig: DataFrame, id_col: str, bands: int, rows: int) -> DataFrame:
    """Signature -> (id, band_idx, band_key) with band_key = concat of the
    band's signature components."""
    out = []
    for b in range(bands):
        cols = [F.col(f"h{b * rows + r}") for r in range(rows)]
        out.append(sig.select(F.col(id_col), F.lit(b).alias("band"),
                              F.concat(*cols).alias("band_key")))
    res = out[0]
    for o in out[1:]:
        res = res.unionByName(o)
    return res


def lsh_candidate_pairs(sig: DataFrame, id_col: str, bands: int = 2,
                        rows: int = 4, max_bucket: int = 10000,
                        salt: int = 32) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b) sharing any band bucket.

    Buckets wider than max_bucket are dropped whole (deterministic guard
    against quadratic blowup on degenerate corpora — see module doc).

    Skew handling: a wide bucket generates O(width²) pairs from a single
    join key, which lands on a single task (and AQE, seeing a *small
    input*, may coalesce the whole join to one partition). The b-side is
    therefore salted on id % salt and the a-side replicated `salt` ways —
    the pair set is identical, but each bucket's quadratic work spreads
    over `salt` tasks. Input inflation is salt× on the (tiny) key list,
    output is unchanged.
    """
    keys = lsh_band_keys(sig, id_col, bands, rows)
    sizes = keys.groupBy("band", "band_key").agg(F.count("*").alias("_bw"))
    keys = (keys.join(sizes, ["band", "band_key"])
            .filter(F.col("_bw") <= max_bucket).drop("_bw"))
    a = (keys.select(F.col("band"), F.col("band_key"),
                     F.col(id_col).alias("id_a"))
         .withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))))
    b = keys.select(F.col("band"), F.col("band_key"),
                    F.col(id_col).alias("id_b"),
                    (F.col(id_col) % salt).cast("int").alias("_salt"))
    return (a.join(b, ["band", "band_key", "_salt"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())


def exact_jaccard(df: DataFrame, candidates: DataFrame, id_col: str,
                  text_col: str) -> DataFrame:
    """Exact token-set Jaccard for candidate pairs.

    Joins the (compact) per-doc distinct-token arrays onto the pair list
    and intersects per pair with array_intersect — per-pair work is
    O(|A|+|B|), no exploded-token shuffle. The token-array side is a
    projection of the corpus (id + small array): broadcast when it fits
    (it always does for the dedup use case where candidates, not docs,
    are the big side); the candidate list itself never re-shuffles.
    """
    # Token sets as 64-bit hashes: the per-pair intersect then compares
    # longs, not strings (~10× cheaper). Counts are identical to the
    # string-set intersect barring a 64-bit collision inside one pair's
    # ~10² tokens (P ≈ 1e-15 — far below float-comparison noise).
    toks = df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(F.transform(ws_tokens(text_col),
                                     lambda t: F.xxhash64(t))).alias("_toks"))
    a = toks.select(F.col("_id").alias("id_a"), F.col("_toks").alias("_ta"))
    b = toks.select(F.col("_id").alias("id_b"), F.col("_toks").alias("_tb"))
    shared = F.size(F.array_intersect(F.col("_ta"), F.col("_tb")))
    return (candidates.join(F.broadcast(a), "id_a").join(F.broadcast(b), "id_b")
            .select("id_a", "id_b", shared.alias("shared"),
                    F.size("_ta").alias("size_a"),
                    F.size("_tb").alias("size_b"))
            .withColumn("jaccard",
                        F.col("shared").cast("double")
                        / (F.col("size_a") + F.col("size_b") - F.col("shared"))))


def simhash32(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """32-bit SimHash over whitespace tokens.

    Token hash = first 8 hex chars of md5 as a 32-bit unsigned int
    (conv(hex,16,10) — JVM-side); per-bit ±1 votes summed per doc; sign
    of each vote is the output bit. One explode + one group-by with 32
    conditional-sum aggregates — all codegen'd, no UDF.
    """
    toks = df.select(F.col(id_col),
                     F.explode(F.array_distinct(ws_tokens(text_col))).alias("tok"))
    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 8), 16, 10).cast("long")
    toks = toks.withColumn("_h", h)
    votes = [
        F.sum(F.when(F.shiftright(F.col("_h"), i).bitwiseAND(1) == 1, 1)
              .otherwise(-1)).alias(f"v{i}")
        for i in range(32)
    ]
    sig = toks.groupBy(id_col).agg(*votes)
    bit_terms = [
        F.when(F.col(f"v{i}") > 0, F.lit(2 ** i).cast("long"))
        .otherwise(F.lit(0).cast("long"))
        for i in range(32)
    ]
    total = bit_terms[0]
    for t in bit_terms[1:]:
        total = total + t
    return sig.select(F.col(id_col), total.alias("simhash"))
