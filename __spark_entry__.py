"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``moira_spark.harness`` (one module per operator
family, SURVEY.md §2.2); this file only adapts it to the contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the full transcript quality-filter pipeline over a
    deterministic synthetic transcripts table, plus a smoke read of the
    sf0.001 documents parquet through the text-rule operators."""
    from moira_spark.harness.text import doc_length_rule

    # touch the driver-provided sf0.001 data (scan + native rules)...
    doc_length_rule(spark, "/root/testdata/sf0.001").count()
    # ...and return the flagship pipeline result.
    from moira_spark.harness.transcripts import transcripts_pipeline

    return transcripts_pipeline(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from moira_spark import harness

    return harness.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for every SQL-expressible query."""
    from moira_spark import harness

    return harness.oracle_sql()
