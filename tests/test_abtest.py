"""A/B experiment readout: Welch z on constructed variant splits."""

from __future__ import annotations

import math

from graph500_spark.operators.abtest import ab_test_zscores

EV_SCHEMA = (
    "event_id long, user_id long, ts long, event_type string, value double"
)


def _ev(spark, rows):
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_welch_z_matches_reference_formula(spark):
    # arm a (even users): values 1,2,3; arm b (odd): 5,5,7,7
    rows = (
        [(i, 2 * i, i, "m", float(v)) for i, v in enumerate([1, 2, 3])]
        + [
            (10 + i, 2 * i + 1, i, "m", float(v))
            for i, v in enumerate([5, 5, 7, 7])
        ]
    )
    out = ab_test_zscores(_ev(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_a"], r["n_b"]) == (3, 4)
    mean_a, mean_b = 2.0, 6.0
    var_a = (1 + 4 + 9) / 3 - 4.0          # population
    var_b = (25 + 25 + 49 + 49) / 4 - 36.0
    z = (mean_a - mean_b) / math.sqrt(var_a / 3 + var_b / 4)
    assert r["mean_a"] == round(mean_a, 6)
    assert r["mean_b"] == round(mean_b, 6)
    assert abs(r["z"] - z) < 1e-6
    assert r["z"] < 0


def test_degenerate_arms_omitted(spark):
    # constant values -> zero pooled variance -> omitted;
    # single-observation arm -> omitted
    rows = (
        [(1, 0, 0, "const", 4.0), (2, 2, 0, "const", 4.0),
         (3, 1, 0, "const", 4.0), (4, 3, 0, "const", 4.0)]
        + [(5, 0, 0, "thin", 1.0), (6, 2, 0, "thin", 2.0),
           (7, 1, 0, "thin", 9.0)]
    )
    assert ab_test_zscores(_ev(spark, rows)).count() == 0
