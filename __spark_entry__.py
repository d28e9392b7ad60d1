"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementations live in dx/queries.py (+ dx/pipelines/*); this file
is the thin registry the driver imports.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the CDC MERGE replay collapse on sf0.001 — treat
    `events` as a changelog (event_id ≡ LSN, user_id ≡ key), dedup to
    the latest change per key, and upsert into `customer` (the target
    table), exactly the engine's X2+X3 pipeline shape."""
    from dx.queries import QUERIES

    return QUERIES["cdc_merge_upsert"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    training-data pipeline ops). Each callable takes (spark, sf_dir)
    and returns a DataFrame with oracle-matching column names."""
    from dx.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query key. Keys absent here are
    genuinely non-SQL-expressible ops (driver records rows-only)."""
    from dx.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
