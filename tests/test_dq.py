"""Data-quality checks (operators/dq.py): each audit must FIRE on a
dirty fixture and stay silent on a clean one. The clean-warehouse
values are covered by the oracle gate entries."""

from __future__ import annotations

from graph500_spark.operators.dq import (
    completeness,
    fk_integrity,
    pk_uniqueness,
)


class TestFkIntegrity:
    def test_orphans_and_null_fks_counted(self, spark):
        tables = {
            "customer": spark.createDataFrame(
                [(1, 0), (2, 0)], "c_custkey long, c_nationkey int"
            ),
            "orders": spark.createDataFrame(
                [(10, 1), (11, 9), (12, None)],  # 9 orphan, NULL orphan
                "o_orderkey long, o_custkey long",
            ),
            "lineitem": spark.createDataFrame(
                [(10, 1, 1)],
                "l_orderkey long, l_partkey long, l_suppkey long",
            ),
            "part": spark.createDataFrame([(1,)], "p_partkey long"),
            "supplier": spark.createDataFrame(
                [(1, 0)], "s_suppkey long, s_nationkey int"
            ),
            "nation": spark.createDataFrame(
                [(0, 0)], "n_nationkey int, n_regionkey int"
            ),
            "region": spark.createDataFrame([(0,)], "r_regionkey int"),
        }
        out = {
            (r.child_table, r.fk_column): (r.n_child_rows, r.n_orphans)
            for r in fk_integrity(tables).collect()
        }
        assert out[("orders", "o_custkey")] == (3, 2)
        assert out[("lineitem", "l_orderkey")] == (1, 0)
        assert out[("nation", "n_regionkey")] == (1, 0)


class TestPkUniqueness:
    def test_duplicate_keys_counted(self, spark):
        tables = {
            "region": spark.createDataFrame(
                [(0,), (0,), (1,), (1,), (1,), (2,)], "r_regionkey int"
            ),
            "nation": spark.createDataFrame([(0,)], "n_nationkey int"),
            "customer": spark.createDataFrame([(1,)], "c_custkey long"),
            "supplier": spark.createDataFrame([(1,)], "s_suppkey long"),
            "part": spark.createDataFrame([(1,)], "p_partkey long"),
            "orders": spark.createDataFrame([(1,)], "o_orderkey long"),
            "events": spark.createDataFrame([(1,)], "event_id long"),
            "documents": spark.createDataFrame([(1,)], "doc_id long"),
            "embeddings": spark.createDataFrame([(1,)], "vec_id long"),
        }
        out = {
            r.table_name: (r.n_rows, r.n_distinct, r.n_dup_keys)
            for r in pk_uniqueness(tables).collect()
        }
        assert out["region"] == (6, 3, 2)  # keys 0 and 1 duplicated
        assert out["nation"] == (1, 1, 0)


class TestCompleteness:
    def test_null_rates_single_pass(self, spark):
        df = spark.createDataFrame(
            [(1, "a"), (2, None), (None, None)],
            "x long, y string",
        )
        out = {
            r.col_name: (r.n_rows, r.n_nulls)
            for r in completeness(df, "t").collect()
        }
        assert out == {"x": (3, 1), "y": (3, 2)}


class TestDedupDocLines:
    def test_consecutive_runs_collapse(self, spark):
        from graph500_spark.operators.text import dedup_doc_lines

        docs = spark.createDataFrame(
            [
                (1, "a\na\nb\nb\nb\na", "en", "s", 12),
                (2, "x", "en", "s", 1),
                (3, "", "en", "s", 0),
            ],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        out = {r.doc_id: r for r in dedup_doc_lines(docs).collect()}
        assert out[1].clean_text == "a\nb\na"
        assert (out[1].n_lines, out[1].n_removed) == (6, 3)
        assert out[2].clean_text == "x" and out[2].n_removed == 0
        assert out[3].clean_text == "" and out[3].n_lines == 1
