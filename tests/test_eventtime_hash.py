"""Round-2 regression coverage: the shared event-time conversion
(functions/eventtime.py) across its three input types, and the
pluggable string-hash tiers (operators/text.py) including the
vectorized-vs-expression dedup kernel parity."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "s0", 43),
        (1, "the quick brown fox jumps over the lazy dog", "en", "s0", 43),
        (2, "a different document entirely with other words", "en", "s1", 46),
        (3, "", "en", "s1", 0),  # empty text: the kernels' guard path
        (4, "one two", "en", "s1", 7),  # below shingle width
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )

from graph500_spark.functions.eventtime import (
    event_micros,
    event_micros_sql,
    event_time,
    pandas_micros,
)

EPOCH_US = 1704067798778549  # 2024-01-01 00:09:58.778549 UTC


def test_event_micros_ntz(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 9, 58, 778549),)], "ts timestamp_ntz"
    )
    assert df.select(event_micros(df).alias("us")).collect()[0]["us"] == EPOCH_US


def test_event_micros_bigint_nanos(spark):
    df = spark.createDataFrame([(EPOCH_US * 1000 + 999,)], "ts long")
    # integer div truncates sub-microsecond nanos
    assert df.select(event_micros(df).alias("us")).collect()[0]["us"] == EPOCH_US


def test_event_micros_rejects_strings(spark):
    df = spark.createDataFrame([("2024-01-01",)], "ts string")
    with pytest.raises(TypeError):
        event_micros(df)
    with pytest.raises(TypeError):
        event_micros_sql(df)


def test_event_time_is_tz_aware_and_exact(spark):
    df = spark.createDataFrame(
        [(datetime.datetime(2024, 1, 1, 0, 9, 58, 778549),)], "ts timestamp_ntz"
    )
    out = df.select(event_time(df).alias("t"))
    assert out.schema["t"].dataType.typeName() == "timestamp"
    # round-trips to the same epoch micros regardless of session tz
    assert (
        out.select(F.unix_micros("t").alias("us")).collect()[0]["us"]
        == EPOCH_US
    )


def test_pandas_micros_both_dtypes():
    import pandas as pd

    dt = pd.Series([pd.Timestamp(2024, 1, 1, 0, 9, 58, 778549)])
    assert pandas_micros(dt).tolist() == [EPOCH_US]
    ns = pd.Series([EPOCH_US * 1000 + 999])
    assert pandas_micros(ns).tolist() == [EPOCH_US]


# ---------------------------------------------------------------------------
# hash tiers
# ---------------------------------------------------------------------------


def test_hash_tiers_spark_vs_duckdb(spark):
    """md5 and poly tiers must agree between the engines; xxhash64 is
    Spark-only by contract."""
    import duckdb

    from graph500_spark.operators.text import duck_strhash, spark_strhash

    samples = ["hello world", "", "a", "The quick brown fox", "x" * 200]
    df = spark.createDataFrame([(s,) for s in samples], "s string")
    con = duckdb.connect()
    for fn in ("md5", "poly"):
        got = [
            r[0]
            for r in df.select(
                F.expr(spark_strhash("s", fn)).cast("long")
            ).collect()
        ]
        want = [
            con.execute(
                f"SELECT CAST({duck_strhash('$s$', fn)} AS BIGINT)".replace(
                    "$s$", "'" + s.replace("'", "''") + "'"
                )
            ).fetchone()[0]
            for s in samples
        ]
        assert got == want, fn


def test_hash_md5_is_60_bits(spark):
    from graph500_spark.operators.text import spark_strhash

    df = spark.createDataFrame([("abc",), ("def",)], "s string")
    vals = [
        r[0]
        for r in df.select(F.expr(spark_strhash("s", "md5")).cast("long")).collect()
    ]
    assert all(0 <= v < (1 << 60) for v in vals)


def test_minhash_vectorized_equals_expression(spark, docs):
    from graph500_spark.operators import dedup

    a = sorted(
        map(tuple, dedup.minhash_signatures(docs, vectorized=True).collect())
    )
    b = sorted(
        map(tuple, dedup.minhash_signatures(docs, vectorized=False).collect())
    )
    assert a == b


def test_simhash_vectorized_equals_expression(spark, docs):
    from graph500_spark.operators import dedup

    a = sorted(map(tuple, dedup.simhash(docs, vectorized=True).collect()))
    b = sorted(map(tuple, dedup.simhash(docs, vectorized=False).collect()))
    assert a == b


def test_token_count_detailed_semantics(spark):
    from graph500_spark.operators.text import token_count_detailed

    rows = [
        (0, "hello world", "en", "s", 11),
        (1, "", "en", "s", 0),
        (2, "a-b c3d!!", "en", "s", 9),  # bpe: a,-,b,c,3,d,!! = 7 runs
        (3, "  padded   out  ", "en", "s", 16),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r["doc_id"]: (r["n_tokens_ws"], r["n_tokens_bpe"])
           for r in token_count_detailed(docs).collect()}
    assert out[0] == (2, 2)
    assert out[1] == (0, 0)
    assert out[2] == (2, 7)
    assert out[3] == (2, 2)


class TestFunnel:
    def test_order_matters_and_dropoff(self, spark):
        import datetime

        from graph500_spark.streaming.windows import funnel_counts

        def ev(i, u, typ, minute):
            return (
                i,
                datetime.datetime(2024, 1, 1, 0, minute),
                u,
                typ,
                1.0,
                "{}",
            )

        rows = [
            # user 1: full ordered funnel
            ev(0, 1, "view", 1), ev(1, 1, "click", 2), ev(2, 1, "purchase", 3),
            # user 2: purchase BEFORE click -> stops at click
            ev(3, 2, "view", 1), ev(4, 2, "purchase", 2), ev(5, 2, "click", 3),
            # user 3: view only
            ev(6, 3, "view", 5),
            # user 4: click/purchase but never viewed -> not in funnel
            ev(7, 4, "click", 1), ev(8, 4, "purchase", 2),
        ]
        events = spark.createDataFrame(
            rows,
            "event_id: long, ts: timestamp, user_id: long,"
            " event_type: string, value: double, props: string",
        )
        out = {r.step: r.n_users for r in funnel_counts(events).collect()}
        assert out == {"view": 3, "click": 2, "purchase": 1}
