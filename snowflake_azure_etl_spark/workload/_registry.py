"""Query registry plumbing shared by all workload modules."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class WorkloadQuery:
    name: str
    covers: tuple[str, ...]   # SURVEY §2 operator ids this query exercises
    doc: str
    fn: QueryFn
    oracle: str | None        # DuckDB SQL over views region/nation/.../embeddings


QUERIES: dict[str, WorkloadQuery] = {}


def query(name: str, covers: tuple[str, ...] | list[str],
          oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = WorkloadQuery(
            name=name, covers=tuple(covers), doc=(fn.__doc__ or "").strip(),
            fn=fn, oracle=oracle)
        return fn
    return deco
