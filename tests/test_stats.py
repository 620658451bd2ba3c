"""Pin the reference's statistics conventions (logfile.h:19-107):
non-interpolating quartiles, harmonic-mean TEPS, Norris stddev, and
the n=1 stddev-NULL edge case."""

from __future__ import annotations

import math

from graph500_spark.operators.stats import run_statistics, teps_summary

RUNS_SCHEMA = "run_id int, bfs_time double, validate_time double, edge_count double"


def _runs(spark, bfs_times, edge_count=1.0):
    return spark.createDataFrame(
        [(i, t, 0.1, edge_count) for i, t in enumerate(bfs_times)],
        RUNS_SCHEMA,
    )


def test_reference_quartile_convention_n3(spark):
    # values [1,2,4]: Q1 = (x[0]+x[0])/2 = 1, med = (x[1]+x[1])/2 = 2,
    # Q3 = (x[2]+x[2])/2 = 4 — NOT the interpolated 1.5/2.0/3.0
    row = {
        r["quantity"]: r
        for r in run_statistics(_runs(spark, [1.0, 2.0, 4.0])).collect()
    }["bfs_time"]
    assert row["min"] == 1.0
    assert row["q1"] == 1.0
    assert row["median"] == 2.0
    assert row["q3"] == 4.0
    assert row["max"] == 4.0
    assert abs(row["mean"] - 7.0 / 3.0) < 1e-12


def test_reference_quartile_convention_n4(spark):
    # n=4, values [1,2,3,10]: (n-1)/4=0, n/4=1 → Q1=(x0+x1)/2=1.5;
    # med=(x1+x2)/2=2.5; Q3=(x[3-0]+x[3-1])/2=6.5
    row = {
        r["quantity"]: r
        for r in run_statistics(_runs(spark, [1.0, 2.0, 3.0, 10.0])).collect()
    }["bfs_time"]
    assert row["q1"] == 1.5
    assert row["median"] == 2.5
    assert row["q3"] == 6.5


def test_stddev_null_single_run(spark):
    rows = run_statistics(_runs(spark, [2.0])).collect()
    for r in rows:
        assert r["stddev"] is None
        assert r["min"] == r["max"] == r["median"]


def test_harmonic_mean_and_norris_stddev(spark):
    # spe values 1/4 and 1/2 (edge_count=4, times 1 and 2):
    # harmonic TEPS = 1/mean(spe) = 1/0.375; Norris stddev =
    # stddev(spe)/(mean^2 * sqrt(n-1))
    t = teps_summary(_runs(spark, [1.0, 2.0], edge_count=4.0)).collect()[0]
    spe = [0.25, 0.5]
    mean_spe = sum(spe) / 2
    sd = math.sqrt(sum((x - mean_spe) ** 2 for x in spe))  # n-1 = 1
    assert abs(t["harmonic_mean_teps"] - 1 / mean_spe) < 1e-9
    assert abs(t["harmonic_stddev_teps"] - sd / (mean_spe**2 * 1.0)) < 1e-9
    assert t["min_teps"] == 2.0  # 1/max(spe)
    assert t["max_teps"] == 4.0  # 1/min(spe)


class TestGini:
    def test_uniform_degrees_are_zero(self, spark):
        import pyspark.sql.functions as F
        from graph500_spark.operators.stats import degree_gini

        deg = spark.createDataFrame(
            [(i, 3) for i in range(10)], "vertex: long, degree: long"
        )
        row = degree_gini(deg).collect()[0]
        assert row.degree_gini == 0.0

    def test_hand_value(self, spark):
        from graph500_spark.operators.stats import degree_gini

        # degrees [1, 3]: mean diff = 1, mean = 2 → G = 1/(2·2) = 0.25
        deg = spark.createDataFrame(
            [(0, 1), (1, 3)], "vertex: long, degree: long"
        )
        row = degree_gini(deg).collect()[0]
        assert abs(row.degree_gini - 0.25) < 1e-9

    def test_source_token_gini_balanced(self, spark):
        from graph500_spark.operators.stats import source_token_gini

        docs = spark.createDataFrame(
            [
                (0, "one two three", "en", "sA", 13),
                (1, "four five six", "en", "sB", 13),
            ],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        row = source_token_gini(docs).collect()[0]
        assert row.token_gini == 0.0


def test_rich_club_hand_graph(spark):
    """Star + triangle core: hand-computable curve. Core {0,1,2} is a
    triangle and vertex 0 also feeds 3 leaves, so deg(0)=5, deg(1)=
    deg(2)=2, leaves deg 1."""
    from graph500_spark.operators.stats import rich_club

    und = [(0, 1), (0, 2), (1, 2), (0, 10), (0, 11), (0, 12)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "src long, dst long"
    )
    rows = {r["k"]: (r["n_rich"], r["e_rich"], r["phi_ppm"])
            for r in rich_club(edges).collect()}
    # k=1: R = {0,1,2} (deg>1), edges among them = 3 (triangle+spokes
    # 0-1, 0-2, 1-2), phi = 3/C(3,2) = 1.0
    assert rows[1] == (3, 3, 1_000_000)
    # k=2: R = {0} alone -> omitted (n_rich < 2)
    assert 2 not in rows
