"""Custom stateful streaming operator via applyInPandasWithState
(north-star extension — the reference has no streaming surface,
SURVEY §2.11; this is the Spark-idiomatic escape hatch for operators
Structured Streaming lacks natively).

`running_user_totals` keeps per-user running aggregates across
micro-batches — the canonical arbitrary-stateful-processing shape
(counters, feature accumulators, online dedup state). State is a typed
tuple per group key; Spark snapshots it in the checkpoint and feeds
each micro-batch's rows as Arrow-backed pandas frames.

Scale notes: state lives in the state store partitioned by the group
key (one shuffle to co-locate); per-key state here is O(1) so 10⁹ users
is bounded by key count, not event count. Use GroupStateTimeout +
state.remove() for keys that must expire (sessionization); NoTimeout
keeps counters alive for the job's lifetime.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_totals(key: tuple, pdfs: Iterator[Any],
                   state: GroupState) -> Iterable[Any]:
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                        "total_value": [total]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) emitted every micro-batch the
    user appears in; state persists across batches."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals, OUTPUT_SCHEMA, STATE_SCHEMA, "Update",
        GroupStateTimeout.NoTimeout)
