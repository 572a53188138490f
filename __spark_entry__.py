"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query smoke check on sf0.001.
queries()     — every implemented operator from SURVEY.md §2 + north-star
                extensions, as (spark, sf_dir) -> DataFrame callables.
oracle_sql()  — DuckDB-equivalent ANSI SQL per query (omitted only for
                genuinely non-SQL-expressible ops: approximate sketches and
                stateful folds, which get rows-only checks).

Implementation lives in tegallega_spark.queries — one registry colocating
each Spark program with its oracle SQL.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from tegallega_spark.queries import ORACLE_SQL, SPARK_QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H Q1-style pricing summary at sf0.001."""
    return SPARK_QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(SPARK_QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(ORACLE_SQL)
