"""Bloom-prefiltered decontamination: row-identical to the exact
form (no false negatives), with a measured shuffle-volume reduction —
the property that makes it the 100 TB shape."""

from __future__ import annotations

import pyspark.sql.functions as F

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_bloom_matches_exact(spark):
    from graph500_spark.operators.corpus import (
        decontaminate,
        decontaminate_bloom,
    )

    exact = {
        (r["train_doc"], r["eval_doc"], r["n_shared"])
        for r in decontaminate(_docs(spark)).collect()
    }
    bloom = {
        (r["train_doc"], r["eval_doc"], r["n_shared"])
        for r in decontaminate_bloom(_docs(spark)).collect()
    }
    assert bloom == exact


def test_bloom_prefilter_reduces_shuffle_volume(spark):
    """The train side surviving the Bloom probe must be a small
    fraction of all train grams — that delta is exactly the exchange
    volume the pre-filter saves."""
    from graph500_spark.operators import dedup as dd
    from graph500_spark.operators.corpus import DECON_N, EVAL_MOD

    from graph500_spark.operators.corpus import _bloom_filtered_grams

    docs = _docs(spark)
    grams = docs.select(
        "doc_id",
        F.explode(F.expr(dd.spark_shingle_hashes(DECON_N))).alias("g"),
    )
    n_train = grams.filter(~(F.col("doc_id") % EVAL_MOD == 0)).count()
    train_surv, ev = _bloom_filtered_grams(
        docs, DECON_N, EVAL_MOD, 1 << 18, 4
    )
    n_surv = train_surv.count()
    # survivors = true hits + fpp tail; both are tiny next to the
    # full train gram stream — the saved exchange volume
    assert n_surv < n_train * 0.1, (n_surv, n_train)
    # and no false negatives: every true hit survives
    true_hits = (
        grams.filter(~(F.col("doc_id") % EVAL_MOD == 0))
        .join(ev.select("g").distinct(), "g", "left_semi")
        .count()
    )
    assert n_surv >= true_hits
