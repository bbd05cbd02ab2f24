"""Fast in-pytest guard over the driver-contract harness.

Runs a representative subset of the SQL-checked queries at sf0.001 against
DuckDB with the same row-count/columns/value-hash compare the driver uses
(the full 40-query sweep lives in scripts/check_correctness.py).
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from scripts.check_correctness import TABLES, value_hash

SF_DIR = "/root/testdata/sf0.001"

SUBSET = [
    "q1_pricing_summary",
    "top_customers_having",
    "sessionize_events",
    "doc_length_rule",
    "doc_scrub_emails",
    "dedup_exact",
    "embedding_cosine_topk",
    "events_rollup",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_duckdb(spark, duck, name):
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    sdf = qs[name](spark, SF_DIR).toPandas()
    ddf = duck.execute(osql[name]).df()
    assert len(sdf) == len(ddf), (len(sdf), len(ddf))
    assert sorted(sdf.columns) == sorted(ddf.columns)
    assert value_hash(sdf) == value_hash(ddf)


def test_every_query_has_unique_columns():
    """Column aliases must be unambiguous for the driver's sorted compare."""
    qs = entrymod.queries()
    assert len(qs) >= 40
    osql = entrymod.oracle_sql()
    assert set(osql) <= set(qs)


def test_entry_contract(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert [f.name for f in df.schema.fields][:3] == ["conv_id", "turn_idx", "keep"]
