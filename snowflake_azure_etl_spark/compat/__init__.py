"""Snowflake→Spark SQL dialect compatibility (SURVEY §4.3.1)."""

from .snowflake_sql import translate_script, translate_statement  # noqa: F401
