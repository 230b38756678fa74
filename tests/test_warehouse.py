"""End-to-end warehouse build + DDL/COPY engine features (SURVEY §7
Phase B/D): golden counts, unknown members, derived measures,
idempotency, COPY accounting with ON_ERROR=CONTINUE, catalog surface.

Mirrors the reference's own acceptance style — row-count accounting and
sample verification (SURVEY §5) — but automated, with DuckDB computing
the expected counts from the same inputs."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from snowflake_azure_etl_spark.warehouse import copy_loader, ddl, runner
from snowflake_azure_etl_spark.warehouse.runner import (
    EtlRun, EtlStepError, run_warehouse_build)
from snowflake_azure_etl_spark.warehouse.star_build import UNKNOWN_KEY

DB = "wh_test"


@pytest.fixture(scope="module")
def report(spark, sf_dir):
    return run_warehouse_build(spark, sf_dir, database=DB)


@pytest.fixture(scope="module")
def expected(sf_dir):
    con = duckdb.connect()
    g = lambda q: con.sql(q).fetchone()[0]  # noqa: E731
    pq = lambda t: f"read_parquet('{sf_dir}/{t}.parquet')"  # noqa: E731
    return {
        "customers": g(f"SELECT count(*) FROM {pq('customer')}"),
        "suppliers": g(f"SELECT count(*) FROM {pq('supplier')}"),
        "parts": g(f"SELECT count(*) FROM {pq('part')}"),
        "lineitems": g(f"SELECT count(*) FROM {pq('lineitem')}"),
        "locations": g(f"""
            SELECT count(DISTINCT n_nationkey) FROM {pq('nation')} n
            WHERE n_nationkey IN (SELECT c_nationkey FROM {pq('customer')})
               OR n_nationkey IN (SELECT s_nationkey FROM {pq('supplier')})"""),
        "years": g(f"""
            SELECT year(max(o_orderdate)) - year(min(o_orderdate)) + 1
            FROM {pq('orders')}"""),
        "target_rows": g(f"""
            SELECT count(*) FROM (
              SELECT l_partkey, year(o_orderdate)
              FROM {pq('lineitem')} l JOIN {pq('orders')} o
                ON l.l_orderkey = o.o_orderkey
              GROUP BY 1, 2)"""),
        "channels": g(f"SELECT count(*) FROM {pq('nation')}"),
        "src_target_rows": g(f"""
            SELECT count(*) FROM (
              SELECT l_suppkey, year(o_orderdate)
              FROM {pq('lineitem')} l JOIN {pq('orders')} o
                ON l.l_orderkey = o.o_orderkey
              GROUP BY 1, 2)"""),
    }


def test_golden_counts(spark, report, expected):
    """Dim counts = business-key count + 1 unknown member; fact count =
    source grain count (same acceptance the reference logs — FIXTURES §2)."""
    counts = report.table_counts
    assert counts[f"{DB}.dim_customer"] == expected["customers"] + 1
    assert counts[f"{DB}.dim_supplier"] == expected["suppliers"] + 1
    assert counts[f"{DB}.dim_part"] == expected["parts"] + 1
    assert counts[f"{DB}.dim_location"] == expected["locations"] + 1
    assert counts[f"{DB}.dim_channel"] == expected["channels"] + 1
    assert counts[f"{DB}.fact_sales"] == expected["lineitems"]
    assert counts[f"{DB}.fact_sales_target"] == expected["target_rows"]
    assert counts[f"{DB}.fact_src_sales_target"] == expected["src_target_rows"]


def test_dim_date_spans_whole_years(spark, report):
    n = report.table_counts[f"{DB}.dim_date"]
    assert n % 365 in (0, 1, 2)  # whole years incl. leap days
    assert n >= 365


def test_unknown_members_seeded(spark, report):
    for dim, name_col in [("dim_customer", "customer_name"),
                          ("dim_supplier", "supplier_name"),
                          ("dim_part", "part_name"),
                          ("dim_location", "nation_name"),
                          ("dim_channel", "channel_name")]:
        row = (spark.table(f"{DB}.{dim}")
               .filter(F.col(f"{dim}_id") == UNKNOWN_KEY).collect())
        assert len(row) == 1, f"{dim} missing unknown member"
        assert row[0][name_col] == "Unknown"


def test_surrogate_keys_unique_and_offset(spark, report):
    dim = spark.table(f"{DB}.dim_customer")
    n = dim.count()
    assert dim.select("dim_customer_id").distinct().count() == n
    assert dim.agg(F.min("dim_customer_id")).collect()[0][0] == UNKNOWN_KEY


def test_fact_measures_consistent(spark, report):
    """Derived-measure contract: sale_amount = gross×(1-disc) ≥ 0,
    unit_price×qty ≈ sale_amount (the reference's SaleUnitPrice =
    Amount/Quantity — FIXTURES §2 spot check 418.50/30 = 13.95)."""
    bad = (spark.table(f"{DB}.fact_sales")
           .filter(F.col("sale_quantity") > 0)
           .filter(F.abs(F.col("sale_unit_price") * F.col("sale_quantity")
                         - F.col("sale_amount")) > 1e-6).count())
    assert bad == 0


def test_src_target_name_resolution(spark, report):
    """Fact_SRCSalesTarget semantics (SURVEY §2.10): every target row
    name-resolves through EXACTLY one of the store/reseller roles; the
    other side falls back to unknown member 1 (reference log
    dim_etl_run:262-271), and the channel always resolves."""
    f = spark.table(f"{DB}.fact_src_sales_target")
    assert f.count() > 0
    one_side = ((F.col("dim_store_id") == UNKNOWN_KEY)
                != (F.col("dim_reseller_id") == UNKNOWN_KEY))
    assert f.filter(~one_side).count() == 0
    assert f.filter(F.col("dim_channel_id") == UNKNOWN_KEY).count() == 0
    # target date keys are Jan-1 YYYYMMDD ints, joinable to dim_date
    dd = spark.table(f"{DB}.dim_date")
    assert f.join(dd, f.dim_target_date_id == dd.date_pkey,
                  "left_anti").count() == 0


def test_fact_date_key_is_yyyymmdd(spark, report):
    """SURVEY §1.4.1: engine standardizes on YYYYMMDD int keys, joinable
    to dim_date.date_pkey (the reference's latent YYMMDD bug fixed)."""
    fact = spark.table(f"{DB}.fact_sales")
    dd = spark.table(f"{DB}.dim_date")
    unmatched = (fact.join(dd, fact.dim_sale_date_id == dd.date_pkey,
                           "left_anti").count())
    assert unmatched == 0


def test_passthrough_views(spark, report):
    """All 10 reference pass-through views (create_views.py:19-134):
    each exists, carries exactly its declared column list, and returns
    the full base-table row count."""
    from snowflake_azure_etl_spark.warehouse.runner import PASSTHROUGH_VIEWS
    assert len(PASSTHROUGH_VIEWS) == 10
    for view, (table, cols) in PASSTHROUGH_VIEWS.items():
        vw = spark.table(f"{DB}.{view}")
        assert vw.columns == cols, f"{view} column list drifted"
        assert vw.count() == spark.table(f"{DB}.{table}").count(), view
    # the two supplier role views expose disjoint role attributes
    assert "store_label" in spark.table(f"{DB}.vw_dim_store").columns
    assert "supplier_name" in spark.table(f"{DB}.vw_dim_reseller").columns


def test_idempotent_rerun(spark, sf_dir, report):
    """R6: CREATE OR REPLACE everywhere — a second run must succeed and
    produce identical counts."""
    again = run_warehouse_build(spark, sf_dir, database=DB)
    assert again.table_counts == report.table_counts


def test_abort_on_failure():
    run = EtlRun("boom")
    with pytest.raises(EtlStepError):
        run.step("explode", lambda: (_ for _ in ()).throw(ValueError("x")))
    assert run.report.steps == []  # failed step not recorded as success


def test_catalog_surface(spark, report):
    assert ddl.database_exists(spark, DB)
    tables = ddl.list_tables(spark, DB)
    assert "fact_sales" in tables and "dim_date" in tables
    desc = ddl.describe_table(spark, f"{DB}.fact_sales")
    assert "sale_amount" in [r.col_name for r in desc.collect()]
    assert ddl.engine_version(spark) == spark.version
    rows, n = ddl.sample_table(spark, f"{DB}.dim_part", n=5)
    assert len(rows) == 5 and n == spark.table(f"{DB}.dim_part").count()


# ---------------------------------------------------------------- COPY --

CSV_SCHEMA = T.StructType([
    T.StructField("id", T.IntegerType()),
    T.StructField("name", T.StringType()),
    T.StructField("amount", T.DoubleType()),
])


@pytest.fixture()
def stage_dir(spark):
    with tempfile.TemporaryDirectory() as d:
        with open(os.path.join(d, "part1.csv"), "w") as f:
            f.write("id,name,amount\n1,alpha,10.5\n2,NULL,20.0\n"
                    "3,null,30.25\n4,,7.75\n")
        with open(os.path.join(d, "part2.csv"), "w") as f:
            # row 'oops' is malformed for the int id column
            f.write("id,name,amount\n5,echo,1.0\noops,not,an_int,extra\n"
                    "6,fox,2.0\n")
        yield d


def test_list_stage(spark, stage_dir):
    listing = copy_loader.list_stage(spark, f"{stage_dir}/*.csv")
    assert len(listing) == 2
    assert all(size > 0 for _, size in listing)
    assert copy_loader.list_stage(spark, f"{stage_dir}/*.parquet") == []


def test_copy_on_error_continue(spark, stage_dir):
    """S3: malformed rows are counted and dropped, clean rows load; NULL
    semantics ('NULL'/'null'/empty → NULL) applied."""
    ddl.create_table(spark, "copy_test", CSV_SCHEMA)
    rep = copy_loader.load_stage_if_present(
        spark, f"{stage_dir}/*.csv", CSV_SCHEMA, "copy_test")
    assert rep is not None
    assert rep.rows_loaded == 6
    assert rep.rows_rejected == 1
    got = spark.table("copy_test")
    assert got.count() == 6
    # NULL_IF both cases + empty-field-as-null
    assert got.filter(F.col("name").isNull()).count() == 3


def test_copy_skip_if_empty(spark, stage_dir):
    assert copy_loader.load_stage_if_present(
        spark, f"{stage_dir}/*.tsv", CSV_SCHEMA, "copy_test") is None


# ---------------------------------------------------------- incremental --

def test_incremental_append(spark, sf_dir, report):
    """Appends insert only unseen business keys, keyed above the current
    max; re-presenting known keys is a no-op (insert-only contract)."""
    from snowflake_azure_etl_spark.warehouse.incremental import (
        append_new_members)

    table = f"{DB}.dim_customer"
    before = spark.table(table)
    n_before = before.count()
    max_before = before.agg(F.max("dim_customer_id")).collect()[0][0]

    # 3 known members + 2 genuinely new business keys
    known = before.filter(F.col("custkey").isNotNull()).limit(3)
    new = (known.limit(2)
           .withColumn("custkey", F.col("custkey") + 1_000_000)
           .withColumn("customer_name", F.lit("New Member")))
    rep = append_new_members(spark, table, known.unionByName(new),
                             "dim_customer_id", ["custkey"])
    assert rep.candidates == 5 and rep.inserted == 2 and rep.skipped == 3

    after = spark.table(table)
    assert after.count() == n_before + 2
    added = after.filter(F.col("custkey") >= 1_000_000)
    assert added.count() == 2
    assert added.agg(F.min("dim_customer_id")).collect()[0][0] > max_before
    # keys still unique; second run is a no-op
    assert after.select("dim_customer_id").distinct().count() == after.count()
    rep2 = append_new_members(spark, table, known.unionByName(new),
                              "dim_customer_id", ["custkey"])
    assert rep2.inserted == 0


# ---------------------------------------------------- analytical views --

def test_analytical_views_run(spark, report):
    """All 7 analytical views exist and evaluate (lazy until queried —
    same behavior as Snowflake view expansion)."""
    from snowflake_azure_etl_spark.warehouse.runner import ANALYTICAL_VIEWS
    for view in ANALYTICAL_VIEWS:
        n = spark.table(f"{DB}.{view}").count()
        assert n > 0, f"{view} returned no rows"


def test_analytical_view_matches_dataframe_equivalent(spark, report):
    """vw_sales_performance_summary == the same plan written with the
    DataFrame API (view layer adds no semantic drift)."""
    vw = spark.table(f"{DB}.vw_sales_performance_summary")
    f = spark.table(f"{DB}.fact_sales")
    p = spark.table(f"{DB}.dim_part")
    d = spark.table(f"{DB}.dim_date")
    df = (f.join(p, "dim_part_id").join(d, f.dim_sale_date_id == d.date_pkey)
          .groupBy("year_num", "quarter_num", "brand")
          .agg(F.count("*").alias("n_lines")))
    got = {(r.sale_year, r.sale_quarter, r.brand): r.n_lines
           for r in vw.select("sale_year", "sale_quarter", "brand",
                              "n_lines").collect()}
    want = {(r.year_num, r.quarter_num, r.brand): r.n_lines
            for r in df.collect()}
    assert got == want


def test_target_vs_actual_joins_both_target_facts(spark, report):
    """The reference's VW_TargetVsActualPerformance joins BOTH target
    facts off the date spine (create_views.py:244-259); the analog must
    surface product targets AND SRC channel targets in one view."""
    vw = spark.table(f"{DB}.vw_target_vs_actual")
    assert {"target_qty", "src_target_amount", "channel_name",
            "actual_qty", "qty_achievement_pct"} <= set(vw.columns)
    assert vw.filter(F.col("target_qty").isNotNull()).count() > 0
    assert vw.filter(F.col("src_target_amount").isNotNull()).count() > 0


def test_sample_all_views_sweep(spark, report):
    """The all-views ✓/✗ verification sweep (reference
    view_sample_views.py): every one of the 17 views samples and counts
    successfully."""
    from snowflake_azure_etl_spark.warehouse.runner import sample_all_views
    tally = sample_all_views(spark, DB)
    assert len(tally) == 17  # 10 pass-through + 7 analytical
    bad = [v.view for v in tally if not v.ok]
    assert not bad, f"views failed the sweep: {bad}"
    assert all(v.rows > 0 for v in tally)
    assert all(len(v.sample) <= 5 for v in tally)


def test_rank_window_view_sane(spark, report):
    vw = spark.table(f"{DB}.vw_product_bonus")
    top = vw.filter(F.col("sales_rank") == 1)
    years = vw.select("year_num").distinct().count()
    assert top.count() == years  # exactly one rank-1 brand per year
    shares = (vw.groupBy("year_num")
              .agg(F.sum("revenue_share_pct").alias("s")).collect())
    assert all(abs(r.s - 100.0) < 0.5 for r in shares)


def test_stage_registry_reads_json_and_orc(spark, sf_dir, tmp_path):
    """The Stage record is format-generic (CREATE STAGE ... FILE_FORMAT
    analog): the same registry resolves JSON and ORC stages with
    declared schemas, not just the parquet/CSV used elsewhere."""
    from snowflake_azure_etl_spark.sources.registry import (Stage,
                                                            SourceRegistry,
                                                            load_tables)
    nat = load_tables(spark, sf_dir, ("nation",))["nation"]
    jdir, odir = str(tmp_path / "nation_json"), str(tmp_path / "nation_orc")
    nat.write.mode("overwrite").json(jdir)
    nat.write.mode("overwrite").orc(odir)
    reg = SourceRegistry()
    reg.register(Stage(name="nation_json", path=jdir, format="json",
                       schema=nat.schema))
    reg.register(Stage(name="nation_orc", path=odir, format="orc"))
    want = {r.n_nationkey for r in nat.collect()}
    for st in ("nation_json", "nation_orc"):
        got = {r.n_nationkey for r in reg.read(spark, st).collect()}
        assert got == want, st


def test_copy_with_history_skips_loaded_files(spark, stage_dir):
    """Snowflake COPY load-history semantics: a rerun loads nothing, a
    newly staged file loads alone, FORCE reloads everything."""
    hist = "copy_hist_test_history"
    spark.sql(f"DROP TABLE IF EXISTS {hist}")
    spark.sql("DROP TABLE IF EXISTS copy_hist_test")
    ddl.create_table(spark, "copy_hist_test", CSV_SCHEMA)

    rep1 = copy_loader.copy_with_history(
        spark, f"{stage_dir}/*.csv", CSV_SCHEMA, "copy_hist_test",
        history_table=hist)
    assert rep1 is not None and rep1.rows_loaded == 6

    # rerun: all files in history -> nothing to load, table unchanged
    assert copy_loader.copy_with_history(
        spark, f"{stage_dir}/*.csv", CSV_SCHEMA, "copy_hist_test",
        history_table=hist) is None
    assert spark.table("copy_hist_test").count() == 6

    # a new staged file loads alone
    with open(os.path.join(stage_dir, "part3.csv"), "w") as f:
        f.write("id,name,amount\n7,golf,3.5\n")
    rep3 = copy_loader.copy_with_history(
        spark, f"{stage_dir}/*.csv", CSV_SCHEMA, "copy_hist_test",
        history_table=hist)
    assert rep3 is not None and rep3.rows_loaded == 1
    assert len(rep3.files) == 1
    assert spark.table("copy_hist_test").count() == 7

    # FORCE reloads every staged file (double rows, like Snowflake)
    repf = copy_loader.copy_with_history(
        spark, f"{stage_dir}/*.csv", CSV_SCHEMA, "copy_hist_test",
        history_table=hist, force=True)
    assert repf is not None and repf.rows_loaded == 7
    assert spark.table("copy_hist_test").count() == 14
    # ...without duplicating history rows for already-recorded files
    hrows = spark.table(hist).filter(
        F.col("table_name") == "copy_hist_test").collect()
    assert len(hrows) == len({(r["file_path"], r["file_size"])
                              for r in hrows}) == 3
    os.remove(os.path.join(stage_dir, "part3.csv"))


def test_copy_match_by_column_name(spark):
    """X-COPY-EVOLVE: header-driven COPY survives stage-schema drift —
    reordered columns map by name (case-insensitively), a missing
    column lands NULL, extra file columns are ignored, and a
    cast-failing row is rejected with ON_ERROR=CONTINUE accounting."""
    from snowflake_azure_etl_spark.sources.csv_format import (
        copy_into_match_by_name)
    schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("amount", T.DoubleType()),
    ])
    with tempfile.TemporaryDirectory() as d:
        # reordered + extra column, uppercase headers
        with open(os.path.join(d, "drifted.csv"), "w") as f:
            f.write("AMOUNT,EXTRA,ID,NAME\n1.5,x,1,alpha\n"
                    "2.5,y,2,NULL\nnot_a_number,z,3,carol\n")
        # a file missing the amount column entirely
        with open(os.path.join(d, "narrow.csv"), "w") as f:
            f.write("id,name\n9,zed\n")
        ddl.create_table(spark, "copy_evolve_test", schema)
        rep = copy_into_match_by_name(
            spark, f"{d}/*.csv", schema, "copy_evolve_test")
    assert rep.rows_loaded == 3 and rep.rows_rejected == 1
    got = {r["id"]: r for r in spark.table("copy_evolve_test").collect()}
    assert got[1]["amount"] == 1.5 and got[1]["name"] == "alpha"
    assert got[2]["name"] is None          # NULL_IF applied through drift
    assert got[9]["amount"] is None        # missing column -> NULL
    assert 3 not in got                    # cast failure rejected
    assert "EXTRA" not in spark.table("copy_evolve_test").columns
