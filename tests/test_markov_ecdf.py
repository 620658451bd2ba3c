"""Markov stationary mix + per-type value ECDF: closed-form parity
on tiny event logs (python replay of the exact integer recurrence)."""

from __future__ import annotations

import datetime

from graph500_spark.streaming.windows import (
    event_value_ecdf,
    markov_stationary,
)

EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _ev(i, user, typ, value=1.0):
    return (
        i,
        datetime.datetime(2026, 1, 1) + datetime.timedelta(seconds=i),
        user,
        typ,
        value,
        "{}",
    )


def test_markov_stationary_matches_python_replay(spark):
    # one user: A B A B A B B  -> transitions A->B x3, B->A x2, B->B x1
    seq = ["A", "B", "A", "B", "A", "B", "B"]
    events = spark.createDataFrame(
        [_ev(i, 7, t) for i, t in enumerate(seq)], EV_SCHEMA
    )
    got = {
        r["event_type"]: r["p_micro"]
        for r in markov_stationary(spark, events, n_iterations=20).collect()
    }
    # exact python replay of the truncating fixed-point recurrence
    trans = {("A", "B"): 3, ("B", "A"): 2, ("B", "B"): 1}
    totals = {"A": 3, "B": 3}
    p = {"A": 1_000_000 // 2, "B": 1_000_000 // 2}
    for _ in range(20):
        nxt = {"A": 0, "B": 0}
        for (u, v), n in trans.items():
            nxt[v] += (p[u] * n) // totals[u]
        p = nxt
    assert got == p
    # sanity: B absorbs more mass (A always leaves, B self-loops)
    assert got["B"] > got["A"]


def test_markov_stationary_absorbing_dust(spark):
    # A -> B only; B has no outgoing edge -> all mass parks on B for
    # one step then vanishes (dust semantics are deterministic).
    events = spark.createDataFrame(
        [_ev(0, 1, "A"), _ev(1, 1, "B")], EV_SCHEMA
    )
    got = {
        r["event_type"]: r["p_micro"]
        for r in markov_stationary(spark, events, n_iterations=3).collect()
    }
    assert got == {"A": 0, "B": 0}


def test_event_value_ecdf_exact(spark):
    events = spark.createDataFrame(
        [
            _ev(0, 1, "x", 1.00),
            _ev(1, 1, "x", 1.00),
            _ev(2, 2, "x", 2.50),
            _ev(3, 2, "x", 4.00),
            _ev(4, 3, "y", 9.99),
        ],
        EV_SCHEMA,
    )
    rows = {
        (r["event_type"], r["value_cents"]): (
            r["n"],
            r["cum_n"],
            r["ecdf_ppm"],
        )
        for r in event_value_ecdf(events).collect()
    }
    assert rows[("x", 100)] == (2, 2, 500000)
    assert rows[("x", 250)] == (1, 3, 750000)
    assert rows[("x", 400)] == (1, 4, 1000000)
    assert rows[("y", 999)] == (1, 1, 1000000)
