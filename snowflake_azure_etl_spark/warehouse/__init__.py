"""Warehouse layer: DDL, COPY-style loading, the star-schema build DAG,
and the orchestrated three-phase runner (SURVEY §2.1 S2-S9, §2.10,
§2.12 R1-R6 — the engine features the workload queries alone don't
exercise)."""

from . import copy_loader, ddl, runner, star_build  # noqa: F401
