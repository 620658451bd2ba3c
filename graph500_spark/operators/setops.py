"""Vertex-set operators (SURVEY.md O5) — the frontier/visited algebra
the reference implements as bitmap AND/OR/ANDN kernels
(/root/reference/mpi/bfs.hpp:241-276,744-837). On DataFrames these are
the standard distributed set operations; the bitmap representation is a
physical detail Spark replaces with hash shuffles / broadcast semi-joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def set_difference(a: DataFrame, b: DataFrame) -> DataFrame:
    """NQ = new_visited ∖ old_visited (bitmap ANDN analogue)."""
    return a.join(b, on=list(a.columns), how="left_anti")


def set_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """visited ∪= NQ (bitmap OR analogue)."""
    return a.unionByName(b).dropDuplicates(list(a.columns))


def set_intersection(a: DataFrame, b: DataFrame) -> DataFrame:
    """frontier ∩ candidates (bitmap AND analogue)."""
    return a.join(b, on=list(a.columns), how="left_semi")
