"""Driver-contract query registry.

``REGISTRY`` maps query name -> (spark_callable, oracle_sql_or_None).
Callables take (spark, sf_dir) and return a DataFrame; oracle SQL is ANSI
SQL DuckDB runs on the same parquet tables (views pre-registered by the
driver).  Names and column aliases MUST match between the two sides — the
driver compares row count + schema + order-insensitive value hash.

Float-safety conventions used throughout (see tests/test_harness.py):
- money sums: cast to DECIMAL(18,2/4) first (exact, order-independent),
  then cast the sum to double — bit-identical on both engines;
- raw-double sums: integerize first (round(x*1000) -> bigint);
- any ranking on a float: rank on the ROUNDED value with an id tiebreak.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, tuple[SparkQuery, str | None]] = {}


def register(name: str, sql: str | None):
    def deco(fn: SparkQuery) -> SparkQuery:
        REGISTRY[name] = (fn, sql)
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


# Import for registration side effects.
from moira_spark.harness import (  # noqa: E402,F401
    dedup,
    jobs,
    multimodal,
    relational,
    similarity,
    streaming,
    text,
    transcripts,
)


def queries() -> dict[str, SparkQuery]:
    return {name: fn for name, (fn, _) in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: sql for name, (_, sql) in REGISTRY.items() if sql is not None}
