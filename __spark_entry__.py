"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship query: full BFS over the heterogeneous
                customer/nation/order/part graph at sf0.001.
queries()     — one entry per implemented operator (SURVEY.md §2),
                each (spark, sf_dir) -> DataFrame.
oracle_sql()  — DuckDB-equivalent SQL for every SQL-expressible entry.

The registries live in graph500_spark.plans.queries.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: deterministic BFS predecessor tree (vertex, pred,
    depth) from the nation-1 vertex over the multi-table graph."""
    from graph500_spark.plans.queries import q_bfs_full

    return q_bfs_full(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from graph500_spark.plans.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from graph500_spark.plans.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
