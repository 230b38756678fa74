"""Time-series regularization (north-star extension, X-TS-GAPFILL):
resample irregular observations onto a fixed step grid with forward
fill — the hypertable `time_bucket_gapfill` / `locf` operation, and the
preprocessing every downstream window/forecast consumer assumes.

Plan shape: the same union+window trick as `operators.asof` (a gap-fill
IS an as-of join of the grid against the observations): per-key bounds
→ row-local spine explode → union spine with observations → ONE
key-partitioned window carrying the latest observation forward. One
shuffle on the key; no time-range join, no per-grid-point probe; the
grid fan-out is sequence()+explode, row-local.

Scale notes (100 TB of events): the window partitions by series key —
corpus-parallel across keys; per-key state inside the window is one
running (value, src_ts) pair, not the history. Grid density is the only
fan-out lever: bound `step` so rows-per-key stays sane (a 1s grid over
a year is 31M rows per key — that is a data-modeling bug, not an
operator task). Keys whose observations all fall in one step produce a
single grid row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _spine_union(obs: DataFrame, key_cols: list[str], time_col: str,
                 value_col: str, step: int) -> DataFrame:
    """Shared grid machinery of both resamplers: per-key bounds → the
    step-aligned spine explode (marker _o=1, NULL value/src) unioned
    with the observation points (_o=0). A NULL-VALUED observation is
    no observation: its _src is NULLed alongside _val so the carried
    (value, src_ts) pair can never desynchronize — without this, a
    NULL-valued obs would advance src_ts while the value came from an
    earlier row, and interpolation would extrapolate with a wrong
    slope."""
    t = F.col(time_col)
    bounds = obs.groupBy(*key_cols).agg(
        F.min(t).alias("_lo"), F.max(t).alias("_hi"))
    spine = bounds.select(
        *key_cols,
        F.explode(F.sequence(
            F.expr(f"_lo div {step}") * step,
            F.expr(f"_hi div {step}") * step,
            F.lit(step).cast("long"))).alias("_t"),
    ).select(*key_cols, F.col("_t"),
             F.lit(1).alias("_o"),
             F.lit(None).cast("long").alias("_src"),
             F.lit(None).cast("double").alias("_val"))
    val = F.col(value_col).cast("double")
    points = obs.select(*key_cols, t.cast("long").alias("_t"),
                        F.lit(0).alias("_o"),
                        F.when(val.isNotNull(), t.cast("long"))
                        .alias("_src"),
                        val.alias("_val"))
    return points.unionByName(spine)


def resample_ffill(obs: DataFrame, key_cols: list[str], time_col: str,
                   value_col: str, step: int) -> DataFrame:
    """(key..., grid_ts, src_ts, value): for every key, a step-aligned
    grid spanning floor(min obs / step)·step .. floor(max obs / step)·
    step, each point carrying the latest observation at-or-before it
    (forward fill / last-observation-carried-forward).

    `time_col` is a NON-NEGATIVE numeric instant (epoch seconds/micros
    — the caller picks the scale; tz-portable by construction;
    non-negative because grid alignment uses integer `div`, which
    truncates toward zero — for pre-epoch instants it would disagree
    with floor alignment). Grid points before
    the key's first observation fill NULL (the leading-edge contract —
    only the floor-aligned first point can be one). Observations must
    be unique per (key, time): pre-dedupe ties (`asof.dedupe_right` /
    max_by) — same contract as the as-of join, and the same reason:
    a tie has no defined "latest"."""
    w = (Window.partitionBy(*key_cols)
         .orderBy("_t", "_o")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    filled = (_spine_union(obs, key_cols, time_col, value_col, step)
              .withColumn("value", F.last("_val", ignorenulls=True).over(w))
              .withColumn("src_ts", F.last("_src", ignorenulls=True).over(w)))
    return (filled.filter(F.col("_o") == 1)
            .select(*key_cols, F.col("_t").alias("grid_ts"),
                    "src_ts", "value"))


def resample_interp(obs: DataFrame, key_cols: list[str], time_col: str,
                    value_col: str, step: int) -> DataFrame:
    """Linear-interpolation sibling of `resample_ffill`: each grid
    point between two observations gets the straight-line value

        prev + (next - prev) · (g - t_prev) / (t_next - t_prev)

    Grid points at-or-after the key's last observation carry it
    forward (no extrapolation); points before the first observation
    are NULL — the same edge contracts as the LOCF variant, same
    union+ONE-window plan shape with a bounded forward state
    (value, src_ts) carried each way. ln/pow-free arithmetic, but the
    division makes values float-path; cross-engine attestation uses
    the exact-integer LOCF twin (q44), interpolation is pytest-pinned
    — the mean_token_freq/unigram_logprob split, again."""
    back = (Window.partitionBy(*key_cols).orderBy("_t", "_o")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    fwd = (Window.partitionBy(*key_cols).orderBy("_t", "_o")
           .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    u = (_spine_union(obs, key_cols, time_col, value_col, step)
         .withColumn("_pv", F.last("_val", ignorenulls=True).over(back))
         .withColumn("_pt", F.last("_src", ignorenulls=True).over(back))
         .withColumn("_nv", F.first("_val", ignorenulls=True).over(fwd))
         .withColumn("_nt", F.first("_src", ignorenulls=True).over(fwd)))
    interp = F.when(
        F.col("_nt").isNull() | (F.col("_nt") == F.col("_pt")),
        F.col("_pv"),
    ).otherwise(
        F.col("_pv") + (F.col("_nv") - F.col("_pv"))
        * (F.col("_t") - F.col("_pt")).cast("double")
        / (F.col("_nt") - F.col("_pt")).cast("double"))
    return (u.filter(F.col("_o") == 1)
            .select(*key_cols, F.col("_t").alias("grid_ts"),
                    interp.alias("value")))
