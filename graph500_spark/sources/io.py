"""Edge-table storage helpers (SURVEY.md S6) with the cluster-scale
layout options Spark gives for free.

The reference's answer to data placement is a hand-built 2D process
grid with owner functions (graph_constructor.hpp:18-22) and chunked
MPI-IO spill files (graph_generator.hpp:35-319). The Spark-first
answers, in increasing strength:

  * plain parquet — chunk ≈ row-group/partition, spill is automatic;
  * hash-partitioned write (``repartition(src)``) — co-locates a
    single downstream shuffle;
  * **bucketed** table (``bucketBy(src)``) — persists the hash
    partitioning in the metastore so *every future* equi-join or
    aggregation on src runs exchange-free: the physical analog of the
    reference keeping its CSR permanently 2D-partitioned in memory.

``write_bucketed_edges``/``read_table`` are thin, but the point is the
contract: at 100 TB the adjacency table is written bucketed once, and
every BFS/SSSP/CC run joins against it without reshuffling the edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_edges_parquet(
    edges: DataFrame, path: str, partition_by_src_hash: int | None = None
) -> None:
    """Plain (optionally pre-hash-partitioned) parquet edge list."""
    out = edges
    if partition_by_src_hash:
        out = edges.repartition(partition_by_src_hash, "src")
    out.write.mode("overwrite").parquet(path)


def read_edges_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


# Interchange formats a migrating user's edge data may arrive in.
# Parquet/ORC carry their schema; CSV/JSON reads take the schema
# EXPLICITLY — schema inference is a second full scan of the data,
# unacceptable at 100 TB (and type-unstable for empty partitions).
EDGE_FORMATS = ("parquet", "orc", "csv", "json")
EDGE_SCHEMA_DDL = "src long, dst long"
WEIGHTED_EDGE_SCHEMA_DDL = "src long, dst long, weight int"


def write_edges(
    edges: DataFrame, path: str, format: str = "parquet"
) -> None:
    """Edge list to any supported interchange format."""
    if format not in EDGE_FORMATS:
        raise ValueError(f"unsupported edge format: {format}")
    w = edges.write.mode("overwrite").format(format)
    if format == "csv":
        w = w.option("header", "true")
    w.save(path)


def read_edges(
    spark: SparkSession,
    path: str,
    format: str = "parquet",
    weighted: bool = False,
) -> DataFrame:
    """Edge list from any supported format, schema-explicit (no
    inference scan) and column-ordered identically across formats."""
    if format not in EDGE_FORMATS:
        raise ValueError(f"unsupported edge format: {format}")
    ddl = WEIGHTED_EDGE_SCHEMA_DDL if weighted else EDGE_SCHEMA_DDL
    r = spark.read.format(format)
    if format in ("csv", "json"):
        r = r.schema(ddl)
        if format == "csv":
            r = r.option("header", "true")
    df = r.load(path)
    cols = ["src", "dst"] + (["weight"] if weighted else [])
    return df.select(*[df[c].cast(t) for c, t in zip(
        cols, ["long", "long", "int"]
    )])


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    num_buckets: int = 32,
    sort_by_dst: bool = True,
) -> None:
    """Persist the edge list bucketed (and per-bucket sorted) by src —
    subsequent joins/aggregations on src are exchange-free, and the
    per-bucket dst sort gives CSR-like adjacency locality."""
    spark = edges.sparkSession
    # a previous session's managed-table directory may survive while
    # the (in-memory) metastore entry did not; clear both so overwrite
    # semantics hold across sessions
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    path = jvm.org.apache.hadoop.fs.Path(warehouse, table.lower())
    fs = path.getFileSystem(jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)

    w = edges.write.mode("overwrite").bucketBy(num_buckets, "src")
    if sort_by_dst:
        w = w.sortBy("dst")
    w.saveAsTable(table, format="parquet")


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


# ---------------------------------------------------------------------------
# Document-corpus interchange (the text-pipeline sibling of the edge
# formats): corpora arrive as JSONL dumps or CSV exports as often as
# parquet. Same contract as read_edges — schema-EXPLICIT (inference is
# a second full scan, type-unstable on empty partitions), identical
# column order and types across formats, so every text operator
# composes over any source format unchanged. json here is JSON-lines
# (one document object per line), the standard corpus dump layout and
# the only splittable JSON shape at 100 TB.
# ---------------------------------------------------------------------------

DOC_FORMATS = ("parquet", "orc", "csv", "json")
DOC_SCHEMA_DDL = (
    "doc_id long, text string, lang string, source string, n_chars long"
)
_DOC_COLS = ("doc_id", "text", "lang", "source", "n_chars")
_DOC_TYPES = ("long", "string", "string", "string", "long")


def write_documents(
    docs: DataFrame, path: str, format: str = "parquet"
) -> None:
    """Document corpus to any supported interchange format."""
    if format not in DOC_FORMATS:
        raise ValueError(f"unsupported document format: {format}")
    w = docs.select(*_DOC_COLS).write.mode("overwrite").format(format)
    if format == "csv":
        # corpus text contains arbitrary separators/newlines: quote
        # everything and escape quotes so the round trip is lossless
        w = w.option("header", "true").option("quoteAll", "true").option(
            "escape", '"'
        )
    w.save(path)


def read_documents(
    spark: SparkSession, path: str, format: str = "parquet"
) -> DataFrame:
    """Document corpus from any supported format, schema-explicit and
    column-identical across formats."""
    if format not in DOC_FORMATS:
        raise ValueError(f"unsupported document format: {format}")
    r = spark.read.format(format)
    if format in ("csv", "json"):
        r = r.schema(DOC_SCHEMA_DDL)
        if format == "csv":
            r = r.option("header", "true").option("quote", '"').option(
                "escape", '"'
            )
    df = r.load(path)
    return df.select(
        *[df[c].cast(t) for c, t in zip(_DOC_COLS, _DOC_TYPES)]
    )


# ---------------------------------------------------------------------------
# Partitioned layouts (hive-style directory partitioning): the THIRD
# placement option alongside plain and bucketed, and the standard
# 100 TB layout for naturally-keyed data — corpora by source, events
# by day. A query filtering on the partition column never lists, let
# alone reads, the other directories (PartitionFilters in the scan,
# asserted by tests/test_io_partitioning.py). Partitioning and
# bucketing compose: partition by the coarse human key, bucket inside
# by the join key.
#
# Cardinality contract: partition columns must be LOW-cardinality
# (sources, days — thousands, not millions). A high-cardinality
# partition key explodes the file count and kills the listing phase;
# that's what bucketing is for.
# ---------------------------------------------------------------------------


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    format: str = "parquet",
) -> None:
    """Hive-style partitioned write of any frame. One output task per
    (task, partition-value) pair — callers with many partition values
    per task should repartition on the partition columns first so each
    task writes few files."""
    (
        df.write.mode("overwrite")
        .format(format)
        .partitionBy(*partition_cols)
        .save(path)
    )


def write_partitioned_corpus(docs: DataFrame, path: str) -> None:
    """Document corpus partitioned by source — the dataset-card layout:
    per-source reprocessing (re-score one crawl, drop one license
    bucket) touches exactly one directory."""
    write_partitioned(
        docs.select(*_DOC_COLS).repartition("source"), path, ["source"]
    )


def write_partitioned_events(events: DataFrame, path: str) -> None:
    """Event stream partitioned by UTC day (derived from ts via the
    shared epoch-micros helper — tz-independent): the time-series
    layout where date-range queries prune to the matching day
    directories and late-data backfills rewrite single days."""
    from pyspark.sql import functions as F

    from graph500_spark.functions.eventtime import event_micros

    day_us = 86_400_000_000
    with_day = events.withColumn(
        "day", (event_micros(events, "ts") / day_us).cast("long")
    )
    write_partitioned(with_day.repartition("day"), path, ["day"])


def read_partitioned(
    spark: SparkSession, path: str, format: str = "parquet"
) -> DataFrame:
    """Read a partitioned layout; the partition column comes back as a
    real column recovered from the directory names."""
    return spark.read.format(format).load(path)


def write_bucketed_table(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
) -> None:
    """Generalized bucketed persist (the edge writer's relational
    twin): bucket any table by its join key so co-bucketed fact-fact
    joins (orders ⋈ lineitem on orderkey at 100 TB) run with ZERO
    exchange on either side — the metastore carries the hash
    partitioning across jobs."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    jvm = spark.sparkContext._jvm
    jsc = spark.sparkContext._jsc
    warehouse = spark.conf.get("spark.sql.warehouse.dir")
    path = jvm.org.apache.hadoop.fs.Path(warehouse, table.lower())
    fs = path.getFileSystem(jsc.hadoopConfiguration())
    if fs.exists(path):
        fs.delete(path, True)
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .saveAsTable(table, format="parquet")
    )
