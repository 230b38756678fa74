"""Similarity search over embedding columns (north-star extension).

Brute-force cosine top-k as the exactness baseline, and a
sign-bucket LSH variant as the scale path. The embedding column is
array<float>; all arithmetic is element-cast to double and folded
sequentially (F.aggregate / zip_with), which matches DuckDB's
list_dot_product over DOUBLE[] bit-for-bit — no UDF, no nondeterminism.

Scale design (billions of vectors):
- brute force is O(Q·N·d) — only for small Q (broadcast the queries);
  the plan broadcasts the query set so the big side never shuffles;
- the sign-bucket LSH (axis-aligned hyperplanes, deterministic choice of
  the first b dimensions) partitions the corpus into 2^b buckets;
  candidates only join within their bucket — the shuffle key is the
  bucket id. Swap in learned/random hyperplanes by replacing
  `sign_bucket` — the plan shape is unchanged.
- For IVF-style search, replace sign_bucket with a coarse-centroid
  assignment (a broadcast join against k centroids) — same plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def as_double_vec(c: Column | str) -> Column:
    col = F.col(c) if isinstance(c, str) else c
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential-fold dot product — order-stable across engines."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def sign_bucket(vec: Column, bits: int = 8) -> Column:
    """Deterministic LSH bucket: concatenated sign bits of the first
    `bits` dimensions (axis-aligned random-hyperplane family with a
    fixed choice of planes — portable to the SQL oracle)."""
    parts = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ]
    return F.concat(*parts)


def brute_force_topk(emb: DataFrame, queries: DataFrame, id_col: str,
                     vec_col: str, k: int = 3) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    `queries` (small) is broadcast; candidates never move. Self-matches
    excluded; ties broken by neighbor id for determinism.
    """
    from pyspark.sql import Window
    q = queries.select(F.col(id_col).alias("query_id"),
                       as_double_vec(vec_col).alias("qv"))
    c = emb.select(F.col(id_col).alias("neighbor_id"),
                   as_double_vec(vec_col).alias("cv"))
    scored = (c.crossJoin(F.broadcast(q))
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      cosine(F.col("qv"), F.col("cv")).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id", "cos_sim",
                    F.col("rn").cast("int").alias("rn")))


def lsh_bucketed_topk(emb: DataFrame, queries: DataFrame, id_col: str,
                      vec_col: str, k: int = 3, bits: int = 8) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's sign
    bucket. The candidate join is an equi-join on the bucket key — at
    billions of vectors this shuffles each side once on a 2^bits-ary
    key instead of cross-joining."""
    from pyspark.sql import Window
    q = queries.select(F.col(id_col).alias("query_id"),
                       as_double_vec(vec_col).alias("qv"),
                       sign_bucket(F.col(vec_col), bits).alias("bucket"))
    c = emb.select(F.col(id_col).alias("neighbor_id"),
                   as_double_vec(vec_col).alias("cv"),
                   sign_bucket(F.col(vec_col), bits).alias("bucket"))
    scored = (c.join(F.broadcast(q), "bucket")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      cosine(F.col("qv"), F.col("cv")).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id", "cos_sim",
                    F.col("rn").cast("int").alias("rn")))


#: Above this many cells the coarse quantizer is kept as a broadcast
#: DataFrame (data), below it as inlined plan literals (a narrow
#: shuffle-free projection). 10^4 cells x 128 dims as literals would
#: blow up the expression tree; 64 cells is comfortably inside codegen.
LITERAL_CENTROID_BUDGET = 64


def _centroid_literals(emb: DataFrame, id_col: str, vec_col: str,
                       n_cells: int) -> list[tuple[int, Column]]:
    """Deterministic seed centroids: the `n_cells` lowest-id vectors,
    fetched once to the driver (bounded, cells-not-corpus sized) and
    inlined as literal arrays — the coarse quantizer is metadata, like
    an IVF index's trained centroids. Swap in k-means-trained centroids
    by replacing this function; every plan downstream is unchanged.

    Only used up to LITERAL_CENTROID_BUDGET cells; above that the
    centroids stay distributed (`_centroid_frame`) and assignment goes
    through a broadcast join — plan size stays O(1) in n_cells."""
    rows = (emb.select(F.col(id_col).cast("long").alias("i"),
                       as_double_vec(vec_col).alias("v"))
            .filter(F.col("i") < n_cells).orderBy("i").collect())
    return [(int(r.i), F.array(*[F.lit(float(x)) for x in r.v]))
            for r in rows]


def _centroid_frame(emb: DataFrame, id_col: str, vec_col: str,
                    n_cells: int) -> DataFrame:
    """The coarse quantizer as a relation: (cell_id, ctv). Cell-count
    sized — always broadcastable, never a plan literal."""
    return (emb.select(F.col(id_col).cast("long").alias("cell_id"),
                       as_double_vec(vec_col).alias("ctv"))
            .filter(F.col("cell_id") < n_cells)
            .withColumn("cell_id", F.col("cell_id").cast("int")))


def _best_cells_join(side: DataFrame, id_alias: str, vec_alias: str,
                     cents_df: DataFrame, n_best: int) -> DataFrame:
    """Nearest `n_best` cells per vector via broadcast-join + rank:
    side x broadcast(centroids) scored row-locally, then per-vector
    top-n. For n_best=1 the rank is an aggregate argmax (max of a
    (score, -cell_id, …) struct — partial map-side, one corpus-row
    shuffle); for n_best>1 (query probes — the small side) a window.
    Ties resolve to the smaller cell id, matching the literal path."""
    scored = (side.crossJoin(F.broadcast(cents_df))
              .withColumn("_s", cosine(F.col(vec_alias), F.col("ctv"))))
    if n_best == 1:
        best = (scored.groupBy(id_alias)
                .agg(F.max(F.struct(
                    F.col("_s").alias("s"),
                    (-F.col("cell_id")).alias("nid"),
                    F.col(vec_alias).alias("v"))).alias("_m")))
        return best.select(
            F.col(id_alias), F.col("_m.v").alias(vec_alias),
            (-F.col("_m.nid")).cast("int").alias("cell_id"))
    from pyspark.sql import Window
    w = Window.partitionBy(id_alias).orderBy(F.desc("_s"), F.asc("cell_id"))
    return (scored.withColumn("_crn", F.row_number().over(w))
            .filter(F.col("_crn") <= n_best)
            .select(id_alias, vec_alias, "cell_id"))


def _cell_scores(vec: Column, cents: list[tuple[int, Column]]) -> Column:
    """Array of (cos_sim, -cell_id) structs — one per centroid, computed
    row-locally (no shuffle, no join; the centroid norms constant-fold).
    Max = best cell with ties to the smallest cell id."""
    return F.array(*[
        F.struct(cosine(vec, cv).alias("s"), F.lit(-cid).alias("nid"))
        for cid, cv in cents
    ])


def assign_cells(emb: DataFrame, id_col: str, vec_col: str,
                 cents: list[tuple[int, Column]]) -> DataFrame:
    """IVF cell assignment: argmax-cosine centroid per vector, as a pure
    projection — at 100 TB this is a narrow map over the corpus."""
    v = as_double_vec(vec_col)
    return emb.select(
        F.col(id_col).alias("neighbor_id"), v.alias("cv"),
        (-F.array_max(_cell_scores(v, cents)).getField("nid"))
        .cast("int").alias("cell_id"))


def ivf_topk(emb: DataFrame, queries: DataFrame, id_col: str, vec_col: str,
             k: int = 3, n_cells: int = 8, nprobe: int = 2,
             literal_budget: int = LITERAL_CENTROID_BUDGET) -> DataFrame:
    """IVF-style approximate top-k: corpus partitioned into `n_cells`
    centroid cells, each query probes its `nprobe` nearest cells, and
    only those cells' vectors are scored.

    The scale shape (the IVF trade): the candidate join is an equi-join
    on cell_id (queries broadcast), so per-query work drops from O(N)
    to O(N·nprobe/n_cells). `n_cells` ↗ ⇒ recall ↘ cost ↘ — same knob
    family as the sign-bucket LSH variant, but with data-adaptive
    (trainable) partitions.

    Two assignment strategies, switched on `literal_budget`:

    - **n_cells ≤ budget**: centroids inline as plan literals —
      assignment is a shuffle-free narrow projection (`assign_cells`);
    - **n_cells > budget**: centroids stay a DataFrame (`_centroid_frame`,
      cell-count sized) broadcast-joined against the corpus, argmax'd
      with a map-side-partial aggregate — ONE corpus-row shuffle, plan
      size independent of n_cells (a 10⁴-cell × 128-dim quantizer as
      literals would explode the expression tree; as data it is a ~5 MB
      broadcast). Identical output, including smaller-cell-id
      tie-breaks.
    """
    from pyspark.sql import Window

    from ._cache import cached_build, plan_key
    # The centroid set + assigned corpus ARE the IVF index: built once,
    # probed by every query. Cache both per (session, corpus plan) the
    # way any vector store persists its index — repeat searches pay only
    # the probe, not the index build.
    spark = emb.sparkSession
    as_literals = n_cells <= literal_budget
    key = ("ivf_index", plan_key(emb), id_col, vec_col, n_cells,
           as_literals)

    def build():
        if as_literals:
            cents = _centroid_literals(emb, id_col, vec_col, n_cells)
            assigned = assign_cells(emb, id_col, vec_col, cents).persist()
        else:
            cents = _centroid_frame(emb, id_col, vec_col, n_cells).persist()
            corpus = emb.select(F.col(id_col).alias("neighbor_id"),
                                as_double_vec(vec_col).alias("cv"))
            assigned = _best_cells_join(corpus, "neighbor_id", "cv",
                                        cents, 1).persist()
        assigned.count()  # materialize the index eagerly, once
        return cents, assigned

    cents, assigned = cached_build(spark, key, build)
    qv = as_double_vec(vec_col)
    if as_literals:
        probes = (queries.select(
            F.col(id_col).alias("query_id"), qv.alias("qv"),
            # ascending struct sort ⇒ the last `nprobe` entries are the
            # best cells (ties resolved to the smaller cell id via -id)
            F.slice(F.array_sort(_cell_scores(qv, cents)), -nprobe, nprobe)
            .alias("best"))
            .select("query_id", "qv",
                    F.explode(F.transform("best", lambda s: -s.getField("nid")))
                    .alias("cell_id"))
            .withColumn("cell_id", F.col("cell_id").cast("int")))
    else:
        q = queries.select(F.col(id_col).alias("query_id"), qv.alias("qv"))
        probes = _best_cells_join(q, "query_id", "qv", cents, nprobe)
    scored = (assigned.join(F.broadcast(probes), "cell_id")
              .filter(F.col("neighbor_id") != F.col("query_id"))
              .select("query_id", "neighbor_id",
                      cosine(F.col("qv"), F.col("cv")).alias("cos_sim")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id", "cos_sim",
                    F.col("rn").cast("int").alias("rn")))


def embedding_near_dups(emb: DataFrame, id_col: str, vec_col: str,
                        threshold: float = 0.95, bits: int = 8) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within sign buckets
    (id_a < id_b, cosine >= threshold) — the embedding leg of the
    dedup suite."""
    c = emb.select(F.col(id_col).alias("_id"),
                   as_double_vec(vec_col).alias("v"),
                   sign_bucket(F.col(vec_col), bits).alias("bucket"))
    a = c.select(F.col("bucket"), F.col("_id").alias("id_a"),
                 F.col("v").alias("va"))
    b = c.select(F.col("bucket"), F.col("_id").alias("id_b"),
                 F.col("v").alias("vb"))
    return (a.join(b, "bucket")
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    cosine(F.col("va"), F.col("vb")).alias("cos_sim"))
            .filter(F.col("cos_sim") >= threshold))
