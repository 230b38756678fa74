"""Source registry — the engine-side analog of Snowflake external stages.

The reference registers one named stage per entity pointing at an Azure
Blob container with a shared CSV file format
(/root/reference/rahil/create_stages.py:23-30,45-49). Here a `Stage` is a
named (path, format, schema, options) record; `SourceRegistry` resolves a
stage to a DataFrame read. The CSV semantics of the reference's
FILE_FORMAT (skip 1 header row, ','-delimited, NULL/'null'/empty -> NULL)
are reproduced by `csv_format.snowflake_csv_options`.

At scale the path is an abfss:// / s3:// URI and the same registry drives
a 1000-executor read; the testdata helper below just points stages at the
local parquet star.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

STAR_TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def _fix_events_ts(df: DataFrame) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects; with
    spark.sql.legacy.parquet.nanosAsLong=true it surfaces as a long.
    Convert to a microsecond timestamp by integer division (`div`, not
    `/`: ns-since-epoch exceeds double's 53-bit mantissa) — truncation
    matches DuckDB's ns->us behavior exactly."""
    from pyspark.sql import functions as F  # local: avoid cycle at import
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return df


TABLE_FIXUPS = {"events": _fix_events_ts}


@dataclass(frozen=True)
class Stage:
    """A named pointer to external data + how to read it."""
    name: str
    path: str
    format: str = "parquet"
    schema: T.StructType | None = None
    options: dict = field(default_factory=dict)


class SourceRegistry:
    """entity name -> Stage; the engine's CREATE STAGE / LIST / read surface."""

    def __init__(self) -> None:
        self._stages: dict[str, Stage] = {}

    def register(self, stage: Stage) -> None:
        # CREATE OR REPLACE semantics (reference: create_stages.py:46)
        self._stages[stage.name] = stage

    def stages(self) -> list[str]:
        """SHOW STAGES analog (reference: create_stages.py:59)."""
        return sorted(self._stages)

    def get(self, name: str) -> Stage:
        return self._stages[name]

    def read(self, spark: SparkSession, name: str) -> DataFrame:
        st = self._stages[name]
        reader = spark.read.format(st.format).options(**st.options)
        if st.schema is not None:
            reader = reader.schema(st.schema)
        df = reader.load(st.path)
        fix = TABLE_FIXUPS.get(name)
        return fix(df) if fix else df

    @classmethod
    def for_star_dir(cls, sf_dir: str,
                     tables: Iterable[str] = STAR_TABLES) -> "SourceRegistry":
        reg = cls()
        for t in tables:
            reg.register(Stage(name=t, path=f"{sf_dir}/{t}.parquet"))
        return reg


def load_tables(spark: SparkSession, sf_dir: str,
                tables: Iterable[str] = STAR_TABLES) -> dict[str, DataFrame]:
    """Read the testdata star as DataFrames keyed by table name.

    Resolved DataFrames (plans, not data) are cached on the session —
    the engine's relation-catalog cache. Resolving a parquet relation
    costs a driver-side footer read per table; a workload of dozens of
    queries over the same stages would otherwise pay it per query. The
    cache dies with the session, so a restarted session (tests) never
    sees stale plans.
    """
    cache: dict = getattr(spark, "_sae_relation_cache", None) or {}
    if not hasattr(spark, "_sae_relation_cache"):
        spark._sae_relation_cache = cache
    # Engine date/timestamp semantics are UTC (SURVEY session posture;
    # oracle timestamps are naive-UTC). get_spark pins this for its own
    # sessions, but the workload also runs on DRIVER-provided sessions
    # whose tz may differ — year()/date_trunc()/window() over LTZ
    # columns are session-tz dependent, so pin it here, at relation
    # resolution, the one gate every query passes through
    # (runtime-settable conf, like nanosAsLong below).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    out: dict[str, DataFrame] = {}
    for t in tables:
        key = (sf_dir, t)
        if key not in cache:
            if t == "events":
                # runtime-settable; required to read nanos-timestamp parquet
                spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            reg = SourceRegistry.for_star_dir(sf_dir, (t,))
            cache[key] = reg.read(spark, t)
        out[t] = cache[key]
    return out


def stage_row_count(sf_dir: str, table: str) -> int | None:
    """Exact row count from parquet footer metadata — no Spark job, no
    data read. This is what a lake catalog/metastore hands out for free;
    operators that need a corpus-size attestation (broadcast gating in
    `operators.dedup`) use it instead of running a count() job per
    query. Returns None when the source isn't local parquet (caller
    falls back to count())."""
    import os

    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked in
        return None
    path = f"{sf_dir}/{table}.parquet"
    try:
        if os.path.isdir(path):
            return sum(
                pq.read_metadata(os.path.join(root, f)).num_rows
                for root, _, files in os.walk(path)
                for f in files if f.endswith(".parquet"))
        return pq.read_metadata(path).num_rows
    except (OSError, ValueError):
        return None


#: Only inputs this small are ever rebalanced — above it, the natural
#: splits are the right parallelism and a blind repartition would be a
#: full-table shuffle.
REBALANCE_MAX_BYTES = 256 * 1024 * 1024


def stage_scan_splits(sf_dir: str, table: str) -> tuple[int, int] | None:
    """(row_groups, bytes) from the parquet footer — the scan's REAL
    parallelism bound: Spark assigns byte-range splits, but a split
    only materializes row groups whose midpoint it covers, so a
    single-row-group file is read by exactly one task no matter how
    many splits the planner cuts. None for non-local/non-parquet."""
    import os

    try:
        import pyarrow.parquet as pq
    except ImportError:  # pragma: no cover - pyarrow is baked in
        return None
    path = f"{sf_dir}/{table}.parquet"
    try:
        return (pq.read_metadata(path).num_row_groups,
                os.path.getsize(path))
    except (OSError, ValueError):
        return None


def rebalance_single_split(spark: SparkSession, df: DataFrame,
                           sf_dir: str, table: str,
                           max_bytes: int = REBALANCE_MAX_BYTES) -> DataFrame:
    """Round-robin-rebalance a SMALL stage relation whose parquet layout
    caps scan parallelism below the cluster (testdata files are written
    as one row group, so every downstream map-stage operator — joins,
    expands, partial aggregates — runs in ONE task while 31 cores
    idle). The exchange moves only the pruned/pushed-down scan output
    once, and the explicit partition count keeps AQE from coalescing
    it back to one. Footer-attested and size-gated: inputs with proper
    row-group layout, or above `max_bytes`, keep their natural splits
    — at 100 TB this helper is a no-op by construction, the way a real
    engine's adaptive split compaction only kicks in on pathological
    small-file/monolith layouts.

    The rebalanced relation is persisted via the session relation
    cache (the warehouse-landing-table analog: compact once, reuse):
    the serial single-split scan is paid once per session, and every
    later use reads the already-balanced in-memory partitions. Safe by
    the same size gate that allows the rebalance at all."""
    meta = stage_scan_splits(sf_dir, table)
    if meta is None:
        return df
    row_groups, nbytes = meta
    par = spark.sparkContext.defaultParallelism
    if row_groups >= par or nbytes > max_bytes:
        return df
    from ..operators._cache import cached_relation
    return cached_relation(df.repartition(par), "rebalanced_stage", table,
                           eager=False)


def register_star_views(spark: SparkSession, sf_dir: str,
                        tables: Iterable[str] = STAR_TABLES) -> dict[str, DataFrame]:
    """Load the star and register each table as a temp view (SQL surface)."""
    dfs = load_tables(spark, sf_dir, tables)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
