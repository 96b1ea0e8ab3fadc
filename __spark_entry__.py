"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship parse→enrich→route pipeline at sf0.001.
queries()     — operator catalog (beats_spark/queries.py), one entry
                per implemented SURVEY.md §2 operator group.
oracle_sql()  — DuckDB twins over the same testdata views.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from beats_spark.flagship import route_counts

    return route_counts(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from beats_spark.queries import catalog

    return catalog()


def oracle_sql() -> dict[str, str]:
    from beats_spark.queries import oracles

    return oracles()
