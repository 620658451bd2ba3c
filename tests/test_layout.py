"""Z-order layout (sources/layout.py): Morton key correctness and —
the point — a MEASURED clustering effect: per-file min/max bounds on
BOTH dimensions must tighten dramatically versus an unclustered
write, read from real parquet footer statistics."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from graph500_spark.sources.layout import morton_key, write_zordered

SF = "/root/testdata/sf0.001"


class TestMortonKey:
    def test_known_interleave(self, spark):
        df = spark.createDataFrame(
            [(0, 0), (1, 0), (0, 1), (3, 5), (0xFFFFFFFF, 0)],
            "a long, b long",
        )
        out = {
            (r.a, r.b): r.z
            for r in df.select(
                "a", "b", morton_key("a", "b").alias("z")
            ).collect()
        }
        assert out[(0, 0)] == 0
        assert out[(1, 0)] == 1        # a on even bits
        assert out[(0, 1)] == 2        # b on odd bits
        # 3=0b11, 5=0b101 → interleave: a bits at 0,2; b bits at 1,3,5
        # a=11 → 0b000101; b=101 → 0b100010 shifted → z=0b100111=39
        assert out[(3, 5)] == 0b100111
        assert out[(0xFFFFFFFF, 0)] == 0x5555555555555555

    def test_matches_duckdb_spelling(self, spark):
        import duckdb

        from graph500_spark.sources.layout import morton_key_sql

        rows = [(i * 977 % 4096, i * 613 % 4096) for i in range(200)]
        df = spark.createDataFrame(rows, "a long, b long")
        got = sorted(
            r.z for r in df.select(morton_key("a", "b").alias("z")).collect()
        )
        con = duckdb.connect()
        vals = ", ".join(f"({a}, {b})" for a, b in rows)
        want = sorted(
            r[0]
            for r in con.execute(
                f"SELECT {morton_key_sql('a', 'b')} AS z"
                f" FROM (VALUES {vals}) t(a, b)"
            ).fetchall()
        )
        assert got == want


def _file_bounds(path: str, col: str):
    """(min, max) per parquet file from footer stats."""
    bounds = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        lo = min(
            md.row_group(i).column(idx).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(idx).statistics.max
            for i in range(md.num_row_groups)
        )
        bounds.append((lo, hi))
    return bounds


class TestZorderClustering:
    def test_bounds_tighten_on_both_dims(self, spark, tmp_path):
        """Balanced two-dimensional data (the regime z-ordering
        targets — two comparable-cardinality filter columns): with 16
        files over a 1024x1024 key square the z-curve gives each file
        a ~256x256 tile, so per-file bounds shrink to ~1/4 of the
        span on BOTH dimensions; a hash-partitioned write leaves every
        file covering ~the whole range of each."""
        df = (
            spark.range(0, 40_000)
            .select(
                ((F.col("id") * 2654435761) % 1024).alias("a"),
                ((F.col("id") * 40503) % 1024).alias("b"),
            )
        )
        n_files = 16
        plain = str(tmp_path / "plain")
        df.repartition(n_files).write.parquet(plain)
        zpath = str(tmp_path / "z")
        write_zordered(df, zpath, "a", "b", num_files=n_files)

        def avg_span(path, col):
            bs = _file_bounds(path, col)
            return sum(hi - lo + 1 for lo, hi in bs) / len(bs)

        for col in ("a", "b"):
            assert avg_span(plain, col) > 0.8 * 1024
            assert avg_span(zpath, col) < 0.4 * 1024
        # round trip: no rows lost
        assert spark.read.parquet(zpath).count() == df.count()
