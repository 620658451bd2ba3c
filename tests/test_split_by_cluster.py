"""Leakage-safe splitting: near-duplicate clusters never straddle the
train/test boundary."""

from __future__ import annotations

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def test_clusters_never_straddle_split(spark):
    from graph500_spark.operators.corpus import split_by_cluster

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = split_by_cluster(spark, docs).persist()
    try:
        straddlers = (
            out.groupBy("cluster")
            .agg(F.countDistinct("split").alias("n_splits"))
            .filter(F.col("n_splits") > 1)
            .count()
        )
        assert straddlers == 0
        # every doc assigned exactly once, both splits populated
        assert out.count() == docs.count()
        assert out.select("doc_id").distinct().count() == docs.count()
        splits = {r["split"] for r in out.select("split").distinct().collect()}
        assert splits == {"train", "test"}
    finally:
        out.unpersist()


def test_near_dup_pairs_share_split(spark):
    from graph500_spark.operators import dedup as dd
    from graph500_spark.operators.corpus import split_by_cluster

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    pairs = dd.minhash_near_duplicates(docs)
    out = split_by_cluster(spark, docs)
    a = out.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa"))
    b = out.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb"))
    mismatched = (
        pairs.join(a, "doc_a").join(b, "doc_b")
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert mismatched == 0
    assert pairs.count() > 0  # the property is non-vacuous on this data
