"""Deterministic sketch properties: KMV mergeability + estimator
identities, count-min never undercounts."""

from __future__ import annotations

from graph500_spark.operators.sketches import (
    cms_heavy_tokens,
    kmv_distinct_users,
    kmv_source_sketches,
)

EV_SCHEMA = "event_id long, user_id long, ts long, event_type string, value double"
DOC_SCHEMA = "doc_id long, text string, source string"


def test_kmv_exact_when_sketch_undersized(spark):
    # 10 distinct users < k=64 → the sketch IS the set, estimate exact.
    ev = spark.createDataFrame(
        [(i, i % 10, i * 1000, "a", 0.0) for i in range(100)], EV_SCHEMA
    )
    row = kmv_distinct_users(ev, k=64).collect()[0]
    assert row["est_distinct"] == row["exact_distinct"] == 10
    assert row["abs_err_ppm"] == 0


def test_kmv_estimate_reasonable_when_sampling(spark):
    # 2000 distinct users, k=64 → estimator stderr ≈ 1/√(k−2) ≈ 13%;
    # assert within 4σ (deterministic given the fixed md5 hash).
    ev = spark.createDataFrame(
        [(i, i, i * 1000, "a", 0.0) for i in range(2000)], EV_SCHEMA
    )
    row = kmv_distinct_users(ev, k=64).collect()[0]
    assert row["exact_distinct"] == 2000
    assert 2000 * 0.5 <= row["est_distinct"] <= 2000 * 1.5
    assert row["abs_err_ppm"] <= 500_000


def test_kmv_union_row_equals_direct_sketch_of_union(spark):
    # KMV mergeability: k smallest of the per-source sketch union ==
    # the sketch of the full corpus → identical estimates.
    docs = spark.createDataFrame(
        [(i, f"text number {i}", f"src{i % 3}") for i in range(300)],
        DOC_SCHEMA,
    )
    rows = {r["source"]: r for r in kmv_source_sketches(docs, k=16).collect()}
    assert set(rows) == {"src0", "src1", "src2", "__union__"}
    from pyspark.sql import functions as F

    direct = {
        r["source"]: r
        for r in kmv_source_sketches(
            docs.withColumn("source", F.lit("all")), k=16
        ).collect()
    }
    # the single-source direct sketch of everything == the merged row
    merged = rows["__union__"]
    whole = [v for kk, v in direct.items() if kk != "__union__"][0]
    assert merged["kth_hash"] == whole["kth_hash"]
    assert merged["est_distinct"] == whole["est_distinct"]


def test_cms_never_undercounts_and_hits_exact_without_collisions(spark):
    docs = spark.createDataFrame(
        [(i, "alpha beta gamma " + ("alpha " * (i % 4)), "s") for i in range(50)],
        DOC_SCHEMA,
    )
    out = cms_heavy_tokens(docs, top=3).collect()
    assert len(out) == 3
    for r in out:
        assert r["cms_estimate"] >= r["exact_count"]
        assert r["overcount"] == r["cms_estimate"] - r["exact_count"]
    # 3 distinct tokens in a 4×1024 table: collisions impossible →
    # estimates are exact
    assert all(r["overcount"] == 0 for r in out)
