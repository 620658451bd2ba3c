"""Parquet sources for the driver's TPC-H-ish test tables, plus the
edge-view derivations (FIXTURES.md §2) that turn relational tables into
``DataFrame[src: long, dst: long]`` inputs for the graph operators.

The derivations are plain SQL-expressible projections so the DuckDB
oracle can reproduce them exactly; offsets keep the two id spaces
disjoint (bipartite graphs with no accidental id collisions).

Scale notes: these are narrow projections of a parquet scan — column
pruning reaches the reader (only 2 columns read), no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver testdata stores micros TIMESTAMP (arrives as
    # TIMESTAMP_NTZ; functions/eventtime.py owns the epoch conversion).
    # The legacy conf only matters if an input ever carries
    # TIMESTAMP(NANOS): it reads as int64 nanos, which eventtime.py's
    # integral branch (`div 1000`) handles with the same micros
    # convention.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


# ---------------------------------------------------------------------------
# Edge views (mirrored 1:1 by SQL strings in EDGE_VIEW_SQL for the oracle)
# ---------------------------------------------------------------------------

def edges_cust_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite customer→nation edges."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").cast("long").alias("src"),
        (F.col("c_nationkey").cast("long") + F.lit(1000000)).alias("dst"),
    )


def edges_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bipartite customer→order edges (larger, skewed by customer)."""
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_custkey").cast("long").alias("src"),
        (F.col("o_orderkey").cast("long") + F.lit(2000000)).alias("dst"),
    )


def edges_supp_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    return s.select(
        F.col("s_suppkey").cast("long").alias("src"),
        (F.col("s_nationkey").cast("long") + F.lit(1000000)).alias("dst"),
    )


def edges_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """user→event-bucket edges from the events stream table.

    events has no session column; bucket events by (user_id, value sign
    + event_type hash) is nondeterministic across engines, so use the
    deterministic pair (user_id, event_id % 1024) which DuckDB computes
    identically.
    """
    e = load_table(spark, sf_dir, "events")
    return e.select(
        F.col("user_id").cast("long").alias("src"),
        ((F.col("event_id") % F.lit(1024)).cast("long") + F.lit(3000000)).alias("dst"),
    )


EDGE_VIEWS = {
    "edges_cust_nation": edges_cust_nation,
    "edges_orders": edges_orders,
    "edges_supp_nation": edges_supp_nation,
    "edges_events": edges_events,
}

# DuckDB-equivalent SQL for each edge view; used to compose oracle_sql()
# strings. Table names are the driver's pre-registered views.
EDGE_VIEW_SQL = {
    "edges_cust_nation": (
        "SELECT CAST(c_custkey AS BIGINT) AS src,"
        " CAST(c_nationkey AS BIGINT) + 1000000 AS dst FROM customer"
    ),
    "edges_orders": (
        "SELECT CAST(o_custkey AS BIGINT) AS src,"
        " CAST(o_orderkey AS BIGINT) + 2000000 AS dst FROM orders"
    ),
    "edges_supp_nation": (
        "SELECT CAST(s_suppkey AS BIGINT) AS src,"
        " CAST(s_nationkey AS BIGINT) + 1000000 AS dst FROM supplier"
    ),
    "edges_events": (
        "SELECT CAST(user_id AS BIGINT) AS src,"
        " CAST(event_id % 1024 AS BIGINT) + 3000000 AS dst FROM events"
    ),
}
