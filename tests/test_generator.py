"""Generator tests (S1/S2/S3): spec invariants + partitioning
invariance (the property that makes it correct on any cluster layout)."""

from __future__ import annotations

import numpy as np

from graph500_spark.sources import generator


def test_rmat_partition_invariance_numpy():
    full_s, full_d = generator.rmat_edges_numpy(10, np.arange(512))
    a_s, a_d = generator.rmat_edges_numpy(10, np.arange(100))
    b_s, b_d = generator.rmat_edges_numpy(10, np.arange(100, 512))
    assert np.array_equal(np.concatenate([a_s, b_s]), full_s)
    assert np.array_equal(np.concatenate([a_d, b_d]), full_d)


def test_kronecker_spark_matches_numpy(spark):
    scale, ef = 8, 4
    df = generator.generate_kronecker_edges(
        spark, scale, ef, num_partitions=7
    )
    rows = df.orderBy("src", "dst").collect()
    n = (1 << scale) * ef
    assert len(rows) == n
    src, dst = generator.rmat_edges_numpy(scale, np.arange(n))
    expect = sorted(zip(src.tolist(), dst.tolist()))
    got = [(r["src"], r["dst"]) for r in rows]
    assert got == expect


def test_kronecker_edge_count_and_range(spark):
    scale, ef = 10, 16
    df = generator.generate_kronecker_edges(spark, scale, ef)
    from pyspark.sql import functions as F

    agg = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("src").alias("mn"),
        F.max(F.greatest("src", "dst")).alias("mx"),
    ).collect()[0]
    assert agg["n"] == (1 << scale) * ef
    assert agg["mn"] >= 0
    assert agg["mx"] < (1 << scale)


def test_weighted_edges(spark):
    df = generator.generate_kronecker_edges(
        spark, 6, 4, weighted=True, max_weight=255
    )
    from pyspark.sql import functions as F

    agg = df.agg(F.min("weight").alias("mn"), F.max("weight").alias("mx")).collect()[0]
    assert 1 <= agg["mn"] and agg["mx"] <= 255


def test_initial_edges_binary_tree(spark):
    df = generator.generate_initial_edges(spark, 6, "binary_tree")
    assert df.count() == (1 << 6) - 1


def test_random_generator_range(spark):
    df = generator.generate_random_edges(spark, 8, 2)
    from pyspark.sql import functions as F

    agg = df.agg(
        F.count(F.lit(1)).alias("n"), F.max(F.greatest("src", "dst")).alias("mx")
    ).collect()[0]
    assert agg["n"] == (1 << 8) * 2
    assert agg["mx"] < (1 << 8)
