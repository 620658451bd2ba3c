"""Round-9 operators: Zipf fit, novelty curve, cluster
representatives, int8 quantization, MMR diversity — brute-force /
closed-form parity on small inputs."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from graph500_spark.operators.corpus import (
    cluster_representatives,
    gram_novelty,
)
from graph500_spark.operators.simsearch import (
    embedding_int8_quant,
    mmr_diverse_topk,
)
from graph500_spark.operators.text import zipf_slope

DOC_SCHEMA = (
    "doc_id long, text string, lang string, source string, n_chars long"
)


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in rows], DOC_SCHEMA
    )


def test_zipf_slope_exact_power_law(spark):
    # counts c_r = 2^(8-r) for ranks 1..8 -> ln c = 8 ln2 - r ln2;
    # since x = ln(rank) (not rank) the OLS slope is recoverable by
    # direct computation; check against a NumPy-free closed-form OLS
    # on the same quantized integers.
    words = []
    for r in range(1, 9):
        words += [f"w{r:02d}"] * (2 ** (8 - r))
    docs = _docs(spark, [(1, " ".join(words))])
    got = zipf_slope(docs, top_n=8).collect()[0]
    xs = [round(math.log(r) * 1e6) for r in range(1, 9)]
    ys = [round(math.log(2 ** (8 - r)) * 1e6) for r in range(1, 9)]
    n = 8
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy / n - slope * sx / n) / 1e6
    assert got["n_fit"] == 8
    assert abs(got["slope"] - round(slope, 6)) < 2e-6
    assert abs(got["intercept"] - round(intercept, 6)) < 2e-6


def test_gram_novelty_two_buckets(spark):
    # doc 0 (bucket 0) introduces gram A; doc 1 (bucket 1) repeats A
    # and introduces B -> bucket 1 has 2 grams, 1 novel.
    a = "alpha beta gamma delta epsilon"
    b = a + " zeta"  # adds exactly one new 5-gram
    docs = _docs(spark, [(0, a), (1, b)])
    rows = {r["bucket"]: r for r in gram_novelty(docs, buckets=2).collect()}
    assert rows[0]["n_grams"] == 1 and rows[0]["n_novel"] == 1
    assert rows[1]["n_grams"] == 2 and rows[1]["n_novel"] == 1
    assert rows[1]["novel_ppm"] == 500000


def test_cluster_representatives_picks_longest(spark):
    # docs 1,2 near-identical (one cluster), doc 3 a singleton;
    # doc 2 longer -> representative of cluster min(1,2)=1 is 2.
    base = " ".join(f"tok{i}" for i in range(30))
    docs = _docs(
        spark, [(1, base), (2, base + " tail"), (3, "something else")]
    )
    rows = {
        r["cluster"]: (r["rep_doc_id"], r["n_members"])
        for r in cluster_representatives(spark, docs).collect()
    }
    assert rows[1] == (2, 2)
    assert rows[3] == (3, 1)


def test_int8_quant_roundtrip_error(spark):
    # one dim, values {1.0, 0.5, -0.25}: amax=1, scale=1/127;
    # err(x) = x - round(127x)/127 -- exact per-value check.
    embs = spark.createDataFrame(
        [(1, [1.0], 0), (2, [0.5], 0), (3, [-0.25], 0)],
        "vec_id long, embedding array<float>, label int",
    )
    row = embedding_int8_quant(embs).collect()[0]
    exp = 0
    for x in (1.0, 0.5, -0.25):
        err = x - round(127 * x) / 127
        exp += round(err * err * 1e12)
    assert row["dim"] == 1 and row["n"] == 3
    assert row["amax"] == 1.0
    assert row["sum_err2_pico"] == exp
    assert row["mse_pico"] == round(exp / 3)


def test_mmr_prefers_diversity(spark):
    # query 0 = [1,0]; 50 and 100 are IDENTICAL vectors (rel 0.9,
    # mutual sim 1.0), 150 is less relevant (0.7) but pointing away
    # (sim to 50 ~0.32). Plain top-2 = {50,100}; MMR's 2nd pick must
    # be 150: score2(100) = 1.8e6 - 1.0e6 = 0.8e6 <
    # score2(150) = 1.4e6 - ~0.32e6 ~ 1.08e6. First pick ties on
    # rel (50 vs 100) break to the smaller vec_id.
    embs = spark.createDataFrame(
        [
            (0, [1.0, 0.0], 0),
            (50, [0.9, 0.436], 0),
            (100, [0.9, 0.436], 0),
            (150, [0.7, -0.714], 0),
        ],
        "vec_id long, embedding array<float>, label int",
    )
    rows = mmr_diverse_topk(embs, k=3, m=3).collect()
    by_rank = sorted(rows, key=lambda r: r["rank"])
    order = [r["vec_id"] for r in by_rank]
    assert order == [50, 150, 100]
    assert by_rank[0]["score2_micro"] == 2 * by_rank[0]["rel_micro"]
    # the redundant twin's penalty is the full mutual sim (1.0)
    assert (
        by_rank[2]["score2_micro"]
        == 2 * by_rank[2]["rel_micro"] - 1_000_000
    )


def test_source_top_terms_characteristic(spark):
    from graph500_spark.operators.traindata import source_top_terms

    # source A is about cats, source B about dogs; shared filler
    # words score below the class-specific ones.
    docs = _docs(
        spark,
        [
            (1, "cat cat cat the the"),
            (2, "dog dog dog the the"),
        ],
    )
    # reassign sources (the _docs helper pins source='s')
    docs = docs.withColumn(
        "source",
        (F.col("doc_id") % 2 == 1).cast("int").cast("string"),
    )
    rows = source_top_terms(docs, k=1).collect()
    top = {r["source"]: r["term"] for r in rows}
    assert set(top.values()) <= {"cat", "dog"}
    assert len(set(top.values())) == 2


def test_ks_source_drift_hand_computed(spark):
    from graph500_spark.operators.traindata import ks_source_drift

    # source A lengths {1,2}, source B lengths {10,20}; corpus
    # F_all at x=2 is 0.5 while F_A(2)=1.0 and F_B(2)=0 -> both
    # sources attain D=0.5, A at x=2 (sup of F_A-F_all), B at x=2
    # as well (|0 - 0.5|).
    rows = [
        (1, "a", "en", "A", 1),
        (2, "bb", "en", "A", 2),
        (3, "c" * 10, "en", "B", 10),
        (4, "d" * 20, "en", "B", 20),
    ]
    docs = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {
        r["source"]: (r["n_source"], r["ks_ppm"], r["at_value"])
        for r in ks_source_drift(docs).collect()
    }
    assert got["A"] == (2, 500000, 2)
    assert got["B"] == (2, 500000, 2)
