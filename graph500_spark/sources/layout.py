"""Z-order (Morton) clustering — multi-column data skipping for the
100 TB layout.

Hive partitioning (io.py) skips on ONE low-cardinality key; bucketing
co-locates ONE join key. When queries filter on TWO high-cardinality
columns (user and time, src and dst), the winning layout interleaves
their bits into a Morton key and range-partitions + sorts by it: rows
close in (a, b) space land in the same files, so parquet row-group
min/max stats become tight little rectangles and BOTH single-column
and conjunctive filters skip most of the data. This is what lakehouse
OPTIMIZE ZORDER does; here it is plain Column algebra + a
repartitionByRange write — no table format required.

The Morton key is pure bit arithmetic (the standard mask-spread
sequence), identical in Spark and DuckDB, so the key computation
itself sits under the oracle gate; the CLUSTERING effect (tight
per-file bounds) is asserted by tests/test_layout.py reading real
parquet footer statistics via pyarrow.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# 32→64-bit spread masks (insert a zero bit between every data bit)
_SPREAD = (
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
)


def _spread_sql(expr: str) -> str:
    """SQL for the bit-spread of a non-negative 32-bit value held in a
    BIGINT — identical operator set in Spark and DuckDB."""
    out = f"({expr})"
    for shift, mask in _SPREAD:
        out = f"((({out}) | (({out}) << {shift})) & {mask})"
    return out


def morton_key_sql(a_expr: str, b_expr: str) -> str:
    """64-bit Morton interleave of two non-negative 32-bit values:
    bits of ``a`` on even positions, ``b`` on odd."""
    return (
        f"({_spread_sql(a_expr)} | ({_spread_sql(b_expr)} << 1))"
    )


def morton_key(a: str, b: str) -> Column:
    """Column form of :func:`morton_key_sql` over two column names.
    Caller guarantees both values are in [0, 2^32)."""
    return F.expr(morton_key_sql(a, b))


def write_zordered(
    df: DataFrame,
    path: str,
    a: str,
    b: str,
    num_files: int = 16,
) -> None:
    """Z-ordered parquet write: range-partition on the Morton key of
    (a, b) (sampled range boundaries — balanced files regardless of
    skew), sort within each file, drop the key. Every downstream
    reader gets the clustering for free through row-group min/max
    stats; no reader-side cooperation needed."""
    keyed = df.withColumn("__z", morton_key(a, b))
    (
        keyed.repartitionByRange(num_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
