"""Incremental dimension loading (SURVEY §4.3.2's append contract).

The reference's IDENTITY-keyed dims renumber if ever reloaded; the
documented contract for this engine is stronger: appends assign new
surrogate keys strictly above the current maximum, existing members
keep their keys, and re-presenting known business keys is a no-op
(SCD type-0/insert-only semantics — the pattern the reference's
unknown-member + stable-key design implies but its tooling can't do).

Scale: the anti-join against existing members broadcasts the (small)
business-key projection of the dim; the max-key probe is one scalar
aggregate. New members per batch are dim-sized, so the surrogate
window stays cheap.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.attest import KEY_ONLY_MAX_ROWS, bounded_broadcast

from ..plans.surrogate import with_surrogate_key


@dataclass
class AppendReport:
    table: str
    candidates: int
    inserted: int

    @property
    def skipped(self) -> int:
        return self.candidates - self.inserted


def append_new_members(spark: SparkSession, table: str,
                       candidates: DataFrame, key_col: str,
                       business_keys: list[str],
                       order_by: list[str] | None = None) -> AppendReport:
    """Insert members whose business key is not yet in `table`, keyed
    from max(existing key) upward; returns the accounting."""
    from pyspark.sql import Observation

    existing = spark.table(table)
    max_key = existing.agg(F.max(key_col).alias("m")).collect()[0]["m"] or 0
    # accounting rides the write job as observations (r16): the
    # candidate count and the inserted count were separate driver
    # actions, and the inserted-count action re-executed the whole
    # anti-join + surrogate window before the write ran it a second
    # time — three jobs where one suffices. Observation metrics
    # count only successful tasks, so retries can't double-count.
    # A batch with zero new members now appends an empty file set
    # instead of skipping the write; the table contents (and the
    # no-op re-present contract) are unchanged.
    obs_cand = Observation()
    obs_new = Observation()
    fresh = (candidates
             .observe(obs_cand, F.count(F.lit(1)).alias("n"))
             .join(
        bounded_broadcast(
            existing.select(*business_keys).distinct(),
            bound="dim-grain distinct business keys (key-only projection)",
            key_only=True, max_rows=KEY_ONLY_MAX_ROWS),
        business_keys, "left_anti"))
    keyed = with_surrogate_key(
        fresh, key_col, order_by=order_by or business_keys,
        offset=max_key)
    keyed = keyed.select(*existing.columns)  # column order of the table
    keyed = keyed.observe(obs_new, F.count(F.lit(1)).alias("n"))
    keyed.write.mode("append").format("parquet").insertInto(table)
    return AppendReport(table=table, candidates=int(obs_cand.get["n"]),
                        inserted=int(obs_new.get["n"]))
