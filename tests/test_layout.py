"""Data-layout tests (plans/layout.py): bucketed co-located joins,
directory-partition pruning, and skew salting — the SCALE.md levers,
asserted both for correctness and for the physical-plan shape that
makes them worth having."""

from __future__ import annotations

import contextlib
import io
import uuid

import pytest
from pyspark.sql import functions as F

from snowflake_azure_etl_spark.plans import layout
from snowflake_azure_etl_spark.sources.registry import load_tables


def explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@contextlib.contextmanager
def conf(spark, key: str, value: str):
    old = spark.conf.get(key, None)
    spark.conf.set(key, value)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, old)


# ---------------------------------------------------------------- bucketing

def test_bucketed_join_is_shuffle_free_and_correct(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("lineitem", "orders"))
    li_tbl = f"li_b_{uuid.uuid4().hex[:8]}"
    o_tbl = f"o_b_{uuid.uuid4().hex[:8]}"
    try:
        layout.land_bucketed(
            t["lineitem"].select("l_orderkey", "l_extendedprice"),
            li_tbl, "l_orderkey", buckets=4)
        layout.land_bucketed(
            t["orders"].select("o_orderkey", "o_orderstatus"),
            o_tbl, "o_orderkey", buckets=4)
        # broadcast disabled: the point is the co-located sort-merge path
        with conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
            joined = layout.bucketed_join(spark, li_tbl, o_tbl,
                                          "l_orderkey", "o_orderkey")
            plan = explain_str(joined)
            assert "SortMergeJoin" in plan
            assert "Exchange" not in plan       # the whole point
            n = joined.count()
        expected = t["lineitem"].join(
            t["orders"], t["lineitem"].l_orderkey == t["orders"].o_orderkey
        ).count()
        assert n == expected
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {li_tbl}")
        spark.sql(f"DROP TABLE IF EXISTS {o_tbl}")


# ------------------------------------------------------- partition pruning

def test_partitioned_landing_prunes_directories(spark, sf_dir, tmp_path):
    li = load_tables(spark, sf_dir, ("lineitem",))["lineitem"]
    path = str(tmp_path / "li_by_year")
    layout.land_partitioned(
        li.select("l_orderkey", "l_extendedprice",
                  F.year("l_shipdate").alias("ship_year")),
        path, ["ship_year"])
    back = spark.read.parquet(path).filter(F.col("ship_year") == 1996)
    plan = explain_str(back)
    # the year predicate is resolved at planning time against the
    # directory layout, not row-by-row after the scan
    assert "PartitionFilters" in plan
    pf = plan.split("PartitionFilters:")[1].splitlines()[0]
    assert "1996" in pf
    years = [r.ship_year for r in
             back.select("ship_year").distinct().collect()]
    assert years == [1996]


# ---------------------------------------------------------------- salting

def test_salted_join_matches_plain_join(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    big = t["lineitem"].select(F.col("l_suppkey").alias("suppkey"),
                               "l_orderkey", "l_linenumber")
    small = t["supplier"].select(F.col("s_suppkey").alias("suppkey"),
                                 "s_nationkey")
    salted = layout.salted_join(big, small, ["suppkey"], salt=8)
    plain = big.join(small, ["suppkey"], "inner")
    assert salted.count() == plain.count()
    got = sorted(tuple(r) for r in salted.collect())
    want = sorted(tuple(r) for r in plain.collect())
    assert got == want


def test_salted_left_join_preserves_unmatched_big_rows(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    big = t["lineitem"].select(F.col("l_suppkey").alias("suppkey"),
                               "l_orderkey")
    # empty small side: every big row must survive exactly once
    small = (t["supplier"].select(F.col("s_suppkey").alias("suppkey"))
             .filter(F.lit(False)))
    out = layout.salted_join(big, small, ["suppkey"], how="left", salt=8)
    assert out.count() == big.count()


def test_salted_join_partitions_on_key_plus_salt(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    big = t["lineitem"].select(F.col("l_suppkey").alias("suppkey"))
    small = t["supplier"].select(F.col("s_suppkey").alias("suppkey"),
                                 "s_nationkey")
    with conf(spark, "spark.sql.autoBroadcastJoinThreshold", "-1"):
        plan = explain_str(
            layout.salted_join(big, small, ["suppkey"], salt=8))
        # the shuffle key is (suppkey, _salt) — a hot suppkey spreads
        # over 8 reducers; the salt is a deterministic row hash
        part = plan.split("hashpartitioning(")[1].splitlines()[0]
        assert "suppkey" in part and "_salt" in part
        assert "xxhash64" in plan


def test_salted_join_rejects_small_side_outer(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    with pytest.raises(ValueError):
        layout.salted_join(t["lineitem"], t["supplier"], ["x"], how="right")


def test_guarded_theta_join_allows_dim_refuses_fact(spark, sf_dir):
    """The BNL quadratic-blowup guard (SURVEY §7 hard-parts): a
    dim-sized build side plans and matches the plain theta join; an
    over-limit build side is refused before any join is planned."""
    import pytest
    from pyspark.sql import functions as F
    from snowflake_azure_etl_spark.plans.layout import guarded_theta_join
    from snowflake_azure_etl_spark.sources.registry import load_tables

    t = load_tables(spark, sf_dir, ("supplier", "nation", "lineitem"))
    s, n = t["supplier"], t["nation"]
    cond = (s.s_nationkey == n.n_nationkey) | s.s_nationkey.isNull()
    got = guarded_theta_join(s, n, cond, "left").count()
    want = s.join(F.broadcast(n), cond, "left").count()
    assert got == want > 0

    with pytest.raises(ValueError, match="quadratic"):
        guarded_theta_join(s, t["lineitem"],
                           s.s_suppkey == t["lineitem"].l_suppkey,
                           max_build_rows=100)


def test_land_sorted_rowgroups_are_disjoint(spark, sf_dir, tmp_path):
    """Range-clustered landing must produce parquet footers whose
    per-row-group [min, max] spans of the sort key do not overlap
    across files — the property that makes min/max stats skip data.
    A random layout fails this (every file spans ~the full domain)."""
    import pyarrow.parquet as pq

    t = load_tables(spark, sf_dir, ("orders",))
    df = t["orders"].select("o_orderkey", "o_totalprice")
    path = str(tmp_path / "orders_sorted")
    layout.land_sorted(df, path, ["o_orderkey"], num_files=4)

    spans = []
    import glob
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)
            assert col.path_in_schema == "o_orderkey"
            spans.append((col.statistics.min, col.statistics.max))
    assert len(spans) >= 2
    spans.sort()
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2  # disjoint, in key order

    # and the scan actually prunes: a point predicate far outside one
    # file's span still answers correctly
    back = spark.read.parquet(path)
    want = df.filter(F.col("o_orderkey") == df.agg(
        F.max("o_orderkey")).collect()[0][0]).count()
    got = back.filter(
        F.col("o_orderkey") == back.agg(
            F.max("o_orderkey")).collect()[0][0]).count()
    assert got == want > 0


def test_prefilter_semi_is_broadcast_and_exact(spark, sf_dir):
    """The explicit runtime filter: plan shows a broadcast left-semi
    join ahead of the scan's consumer, and the filtered result equals
    the plain join's distinct big-side slice."""
    t = load_tables(spark, sf_dir, ("lineitem", "supplier"))
    filtered_dim = t["supplier"].filter(F.col("s_nationkey") == 3)
    big = t["lineitem"].select(F.col("l_suppkey").alias("s_suppkey"),
                               "l_orderkey")
    pruned = layout.prefilter_semi(big, filtered_dim, ["s_suppkey"])
    plan = explain_str(pruned)
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    want = (big.join(filtered_dim.select("s_suppkey").distinct(),
                     "s_suppkey").count())
    assert pruned.count() == want > 0


def test_prefilter_semi_guards_oversize_keys(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("lineitem",))
    big = t["lineitem"].select(F.col("l_orderkey"))
    with pytest.raises(ValueError, match="bloom"):
        layout.prefilter_semi(big, t["lineitem"].select("l_orderkey"),
                              ["l_orderkey"], max_filter_rows=10)


def test_land_zorder_bounds_both_dims(spark, tmp_path):
    """Z-order landing must leave every file covering a small
    rectangle of the 2-D domain: per-file min/max spans are narrow on
    BOTH columns, where a 1-D sort leaves the second column's per-file
    span at ~the full domain. Data is a deterministic 2-D uniform grid
    (hash-scattered), so the assertion is stable."""
    import glob

    import pyarrow.parquet as pq

    df = (spark.range(1 << 14)
          .withColumn("x", (F.col("id") % 256).cast("long"))
          .withColumn("y", F.pmod(F.hash("id"), F.lit(256)).cast("long")))

    def spans(path, col_idx):
        out = []
        for f in glob.glob(path + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            lo = min(md.row_group(rg).column(col_idx).statistics.min
                     for rg in range(md.num_row_groups))
            hi = max(md.row_group(rg).column(col_idx).statistics.max
                     for rg in range(md.num_row_groups))
            out.append((hi - lo) / 255.0)
        return out

    zpath = str(tmp_path / "z")
    layout.land_zorder(df.select("id", "x", "y"), zpath, ["x", "y"],
                       bounds=[(0, 255), (0, 255)], bits=8,
                       num_files=16)
    # schema order in the file: id, x, y -> x is col 1, y col 2
    zx, zy = spans(zpath, 1), spans(zpath, 2)
    assert len(zx) >= 8
    assert sum(zx) / len(zx) <= 0.5 and sum(zy) / len(zy) <= 0.5, \
        (sum(zx) / len(zx), sum(zy) / len(zy))

    spath = str(tmp_path / "s")
    layout.land_sorted(df.select("id", "x", "y"), spath, ["x"],
                       num_files=16)
    sy = spans(spath, 2)
    assert sum(sy) / len(sy) > 0.9  # 1-D sort: y stats are useless

    # round-trip correctness + both-dim predicate answers
    back = spark.read.parquet(zpath)
    assert back.count() == df.count()
    want = df.filter((F.col("x") == 3) & (F.col("y") == 7)).count()
    assert back.filter((F.col("x") == 3) & (F.col("y") == 7)).count() \
        == want


def test_zorder_key_validation(spark):
    with pytest.raises(ValueError):
        layout.zorder_key(["a"], [(0, 1)])
    with pytest.raises(ValueError):
        layout.zorder_key(["a", "b"], [(0, 1)])
    with pytest.raises(ValueError):
        layout.zorder_key(["a", "b"], [(0, 1), (0, 1)], bits=32)


def test_land_zorder_unboundable_column_raises(spark, tmp_path):
    empty = spark.createDataFrame([], "x long, y long")
    with pytest.raises(ValueError) as e:
        layout.land_zorder(empty, str(tmp_path / "z0"), ["x", "y"])
    assert "bounds" in str(e.value)
    allnull = spark.createDataFrame([(1, None), (2, None)],
                                    "x long, y long")
    with pytest.raises(ValueError) as e:
        layout.land_zorder(allnull, str(tmp_path / "z1"), ["x", "y"])
    assert "'y'" in str(e.value)


def test_compact_landing_merges_small_files(spark, tmp_path):
    """X-COMPACT: a many-small-file landing is rewritten into the
    byte-targeted file count with rows preserved exactly."""
    path = str(tmp_path / "frag")
    df = spark.range(10_000).select(
        F.col("id"), (F.col("id") % 7).alias("k"))
    df.repartition(40).write.parquet(path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    stats = layout.compact_landing(spark, path,
                                   target_file_bytes=1 << 30)
    assert stats["files_before"] == 40
    assert stats["files_after"] == 1
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert after == before


def test_compact_landing_preserves_sorted_skipping(spark, tmp_path):
    """Compacting with sort_cols must keep the land_sorted property:
    per-file [min, max] spans of the sort key stay disjoint."""
    import glob
    import pyarrow.parquet as pq
    path = str(tmp_path / "sorted_frag")
    df = spark.range(20_000).select(F.col("id"))
    df.repartition(30).write.parquet(path)
    layout.compact_landing(spark, path, target_file_bytes=40_000,
                           sort_cols=["id"])
    spans = []
    for f in glob.glob(path + "/*.parquet"):
        md = pq.ParquetFile(f).metadata
        col = [md.row_group(i).column(0).statistics
               for i in range(md.num_row_groups)]
        spans.append((min(s.min for s in col), max(s.max for s in col)))
    spans.sort()
    assert len(spans) > 1          # actually split into several files
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 < lo2           # disjoint => min/max stats skip
    assert spark.read.parquet(path).count() == 20_000


def test_compact_landing_failure_leaves_original(spark, tmp_path,
                                                 monkeypatch):
    """The temp-dir + rename swap: the rewrite is fully written BEFORE
    the original is touched, so a failure at the swap point (injected
    into os.rename) leaves the original landing intact and readable."""
    path = str(tmp_path / "guarded")
    spark.range(100).write.parquet(path)

    def boom(*_a):
        raise OSError("injected swap failure")

    monkeypatch.setattr(layout, "_swap_dirs", boom)
    with pytest.raises(OSError, match="injected"):
        layout.compact_landing(spark, path)
    monkeypatch.undo()
    assert spark.read.parquet(path).count() == 100
