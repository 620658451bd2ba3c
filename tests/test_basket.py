"""Market-basket association rules: hand-computed fixture parity."""

from __future__ import annotations

from graph500_spark.operators.basket import PPM, association_rules

LI_SCHEMA = "l_orderkey long, l_partkey long"


def test_rules_on_hand_fixture(spark):
    # baskets: o1={A,B,C}, o2={A,B}, o3={A,B}, o4={C}; N=4 orders
    rows = [
        (1, 10), (1, 20), (1, 30),
        (2, 10), (2, 20),
        (3, 10), (3, 20),
        (4, 30),
        (2, 10),  # duplicate (order, part) — must collapse
    ]
    li = spark.createDataFrame(rows, LI_SCHEMA)
    out = {
        (r["antecedent"], r["consequent"]): r
        for r in association_rules(li, k=10, min_support=2).collect()
    }
    # only the A-B pair co-occurs >= 2 times (3 baskets), both ways
    assert set(out) == {(10, 20), (20, 10)}
    r = out[(10, 20)]
    assert r["pair_count"] == 3
    assert r["antecedent_count"] == 3 and r["consequent_count"] == 3
    # confidence = 3/3, lift = 3*4/(3*3) = 4/3
    assert r["confidence_ppm"] == PPM
    assert r["lift_ppm"] == (PPM * 3 * 4) // (3 * 3)
    # symmetric lift
    assert out[(20, 10)]["lift_ppm"] == r["lift_ppm"]


def test_min_support_filters(spark):
    rows = [(1, 10), (1, 20), (2, 10), (2, 30)]
    li = spark.createDataFrame(rows, LI_SCHEMA)
    assert association_rules(li, min_support=2).count() == 0
