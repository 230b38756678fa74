"""The named query catalog — SURVEY §2 coverage as (Spark plan, oracle) pairs.

Every operator row in SURVEY §2 is exercised by >= 1 named query here.
Each entry carries:
- a Spark callable (spark, sf_dir) -> DataFrame — the engine's plan;
- a DuckDB-runnable ANSI-SQL oracle producing the identical result
  (same column names, deterministic values — see functions.scalar for
  the exact-decimal determinism discipline), or None for ops that SQL
  cannot express (the driver then records a weaker rows-only check).

Importing this package populates the registry.
"""

from ._registry import QUERIES, WorkloadQuery, query

from . import star_queries  # noqa: E402,F401
from . import warehouse_queries  # noqa: E402,F401
from . import window_queries  # noqa: E402,F401
from . import pipeline_queries  # noqa: E402,F401
from . import events_queries  # noqa: E402,F401
from . import etl_queries  # noqa: E402,F401
from . import extension_queries  # noqa: E402,F401

__all__ = ["QUERIES", "WorkloadQuery", "query"]
