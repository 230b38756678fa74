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
    raw: QueryFn              # fn without the prepared-statement cache wrapper
    prepared: bool            # whether fn session-caches the built plan


QUERIES: dict[str, WorkloadQuery] = {}


def query(name: str, covers: tuple[str, ...] | list[str],
          oracle: str | None = None,
          prepared: bool = False) -> Callable[[QueryFn], QueryFn]:
    """Register a workload query.

    ``prepared=True`` session-caches the query's RETURNED DataFrame —
    a prepared statement (VERDICT r10 #2): the object is an
    UNMATERIALIZED logical plan, so repeat invocations skip the
    driver-side py4j construction cost (measured 0.3–1.2 s/query,
    constant in data size) while every invocation still EXECUTES the
    full DAG (nothing in the plan persists result rows; artifact
    relations inside follow their own session-cache rules, exactly as
    when the plan is rebuilt). Only for PURE plan builders over the
    sf_dir parquet: a query that writes tables, eagerly checkpoints a
    per-invocation result, or reads session-managed tables must keep
    ``prepared=False`` so each invocation re-runs its build."""
    def deco(fn: QueryFn) -> QueryFn:
        run = fn
        if prepared:
            def run(spark: SparkSession, sf_dir: str,
                    _fn: QueryFn = fn, _name: str = name) -> DataFrame:
                from ..operators._cache import cached_build
                return cached_build(spark, ("prepared_query", _name,
                                            sf_dir),
                                    lambda: _fn(spark, sf_dir))
        QUERIES[name] = WorkloadQuery(
            name=name, covers=tuple(covers), doc=(fn.__doc__ or "").strip(),
            fn=run, oracle=oracle, raw=fn, prepared=prepared)
        return fn
    return deco
