"""Stage listing + COPY orchestration (SURVEY §2.1 S2, S3).

The reference lists stage files (`LIST @stage` —
/root/reference/rahil/load_data.py:32-38) before each
`COPY INTO tbl FROM @stage ON_ERROR='CONTINUE'` and sums per-file
`rows_loaded` from the COPY result (load_data.py:41-59). The COPY
semantics themselves (PERMISSIVE read + corrupt-record accounting)
live in sources.csv_format; this module adds the listing and the
list-then-load-else-skip flow.

Scale: the listing is one namenode/object-store call; the CSV scan
parallelizes by file/split exactly like the warehouse-side COPY.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import types as T

from ..sources.csv_format import LoadReport, copy_into  # noqa: F401  (re-export)


def list_stage(spark: SparkSession, path_glob: str) -> list[tuple[str, int]]:
    """LIST @stage analog (S2): (path, size_bytes) per staged file.

    Uses the Hadoop FS API (the same listing executors read from), so it
    works unchanged for file://, abfss://, s3a:// stages.
    """
    sc = spark.sparkContext
    hconf = sc._jsc.hadoopConfiguration()
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path_glob)
    fs = jpath.getFileSystem(hconf)
    statuses = fs.globStatus(jpath)
    if statuses is None:
        return []
    return sorted((str(s.getPath().toString()), int(s.getLen()))
                  for s in statuses)


def load_stage_if_present(spark: SparkSession, path_glob: str,
                          schema: T.StructType, table: str,
                          entity: str | None = None) -> LoadReport | None:
    """The reference's per-entity flow: LIST, skip-if-empty, else COPY
    with accounting (load_data.py:22-74). Returns None when the stage
    has no files (reported as a skipped entity, not a failure)."""
    if not list_stage(spark, path_glob):
        return None
    return copy_into(spark, path_glob, schema, table, entity=entity)
