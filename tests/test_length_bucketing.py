"""Length-bucketed batching: the padding-waste property that
justifies the layout — bucketing by length must waste fewer padding
tokens than batching in arrival order."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

SF_DIR = "/root/testdata/sf0.001"


def test_bucketing_reduces_padding_waste(spark):
    from graph500_spark.operators.traindata import (
        LENGTH_BATCH,
        SPARK_TOKENS,
        length_bucketed_batches,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    bucketed = length_bucketed_batches(docs)
    b = bucketed.agg(
        F.sum(F.col("n_docs") * F.col("max_tokens")).alias("padded"),
        F.sum("sum_tokens").alias("real"),
    ).collect()[0]
    bucketed_waste = (b["padded"] - b["real"]) / b["padded"]

    # baseline: same batch size, arrival (doc_id) order, no bucketing
    toks = docs.select(
        "doc_id", F.size(F.expr(SPARK_TOKENS)).alias("n_tokens")
    )
    w = Window.orderBy("doc_id")
    base = (
        toks.withColumn(
            "batch",
            F.floor((F.row_number().over(w) - 1) / F.lit(LENGTH_BATCH)),
        )
        .groupBy("batch")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("n_tokens").alias("max_tokens"),
            F.sum("n_tokens").alias("sum_tokens"),
        )
        .agg(
            F.sum(F.col("n_docs") * F.col("max_tokens")).alias("padded"),
            F.sum("sum_tokens").alias("real"),
        )
        .collect()[0]
    )
    naive_waste = (base["padded"] - base["real"]) / base["padded"]
    assert bucketed_waste < naive_waste, (bucketed_waste, naive_waste)


def test_batches_respect_size_and_cover_all_docs(spark):
    from graph500_spark.operators.traindata import (
        LENGTH_BATCH,
        length_bucketed_batches,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = length_bucketed_batches(docs).collect()
    assert sum(r["n_docs"] for r in out) == docs.count()
    assert all(1 <= r["n_docs"] <= LENGTH_BATCH for r in out)
    assert all(0 <= r["waste_ppm"] < 1_000_000 for r in out)
