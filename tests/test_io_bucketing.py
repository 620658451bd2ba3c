"""Storage-layout tests: bucketed edge tables must give exchange-free
joins and aggregations on the bucket key (the 100 TB co-location
contract), and parquet round-trips must preserve the edge list."""

from __future__ import annotations

import io as _io
import contextlib

from graph500_spark.sources.io import (
    read_edges_parquet,
    read_table,
    write_bucketed_edges,
    write_edges_parquet,
)


def _plan(df) -> str:
    buf = _io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_parquet_roundtrip(spark, tmp_path):
    edges = spark.createDataFrame(
        [(i, (i * 3) % 7) for i in range(100)], "src long, dst long"
    )
    path = str(tmp_path / "edges.parquet")
    write_edges_parquet(edges, path, partition_by_src_hash=4)
    back = read_edges_parquet(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, edges.collect())
    )


def test_bucketed_join_has_no_shuffle(spark):
    edges = spark.createDataFrame(
        [(i % 50, i) for i in range(1000)], "src long, dst long"
    )
    write_bucketed_edges(edges, "t_edges_bucketed", num_buckets=8)
    t = read_table(spark, "t_edges_bucketed")

    # disable auto-broadcast so the plan must rely on the bucketing
    # (at 100 TB neither side broadcasts — this is the regime that
    # matters); bucketed scans satisfy the join's distribution
    # requirement, so no shuffle Exchange may appear
    saved = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = t.alias("a").join(t.alias("b"), "src")
        plan = _plan(joined)
        assert "Exchange hashpartitioning" not in plan, plan

        # aggregation on the bucket key is shuffle-free too
        agg = t.groupBy("src").count()
        assert "Exchange hashpartitioning" not in _plan(agg)

        # and the results are right
        assert t.count() == 1000
        assert joined.count() == sum(20 * 20 for _ in range(50))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", saved)


def test_edge_roundtrip_all_formats(spark, tmp_path):
    from graph500_spark.sources.io import EDGE_FORMATS, read_edges, write_edges

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0), (5, 3)], "src long, dst long"
    )
    expect = sorted(map(tuple, edges.collect()))
    for fmt in EDGE_FORMATS:
        path = str(tmp_path / f"edges_{fmt}")
        write_edges(edges, path, format=fmt)
        got = sorted(map(tuple, read_edges(spark, path, format=fmt).collect()))
        assert got == expect, fmt
        schema = read_edges(spark, path, format=fmt).schema.simpleString()
        assert schema == "struct<src:bigint,dst:bigint>", fmt


class TestDocumentFormats:
    def test_round_trip_all_formats(self, spark, tmp_path):
        from graph500_spark.sources.io import (
            DOC_FORMATS,
            read_documents,
            write_documents,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        want = {
            (r.doc_id, r.text, r.lang, r.source, r.n_chars)
            for r in docs.collect()
        }
        for fmt in DOC_FORMATS:
            p = str(tmp_path / f"docs_{fmt}")
            write_documents(docs, p, fmt)
            back = read_documents(spark, p, fmt)
            assert back.schema.simpleString() == (
                "struct<doc_id:bigint,text:string,lang:string,"
                "source:string,n_chars:bigint>"
            ), fmt
            got = {
                (r.doc_id, r.text, r.lang, r.source, r.n_chars)
                for r in back.collect()
            }
            assert got == want, f"{fmt} round trip lost rows"

    def test_text_operators_compose_over_any_format(self, spark, tmp_path):
        from graph500_spark.operators.text import token_count
        from graph500_spark.sources.io import (
            read_documents,
            write_documents,
        )

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        p = str(tmp_path / "docs_jsonl")
        write_documents(docs, p, "json")
        want = {
            (r.doc_id, r.n_tokens)
            for r in token_count(docs).collect()
        }
        got = {
            (r.doc_id, r.n_tokens)
            for r in token_count(read_documents(spark, p, "json")).collect()
        }
        assert got == want
