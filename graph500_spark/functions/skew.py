"""Explicit key-salting for skewed equi-joins.

AQE's skew-join splitting handles most hot keys at runtime, but it
only fires for sort-merge joins over materialized shuffle stats. This
utility is the deterministic PRE-planned form for joins the pipeline
KNOWS are Zipf-skewed (token keys, gram keys, hub vertex ids): the
skewed side's hot key is sheared into ``n_salt`` sub-keys, the small
side is replicated ``n_salt``×, and the join result is row-identical
to the unsalted join — so salted variants sit under the same DuckDB
oracle as their plain forms.

Cost model: replication multiplies the SMALL side's shuffle volume by
n_salt, in exchange for dividing the hot key's single-reducer row
count by n_salt. Worth it exactly when the hot key's share of the
skewed side exceeds the small side's total size — the token/gram
inverted-index case.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salt: int = 8,
    salt_by: Column | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``skewed ⋈ small`` on ``on`` with the key space
    sheared ``n_salt`` ways. Row-identical to
    ``skewed.join(small, on, how)`` for inner/left joins.

    ``salt_by`` is a deterministic expression over the skewed side's
    columns choosing each row's shard (default: hash of the whole
    row — any per-row spreader works since correctness never depends
    on the salt value). The small side is exploded onto every salt
    value, so each (key, salt) sub-join sees the full dimension row.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    if salt_by is None:
        salt_by = F.pmod(F.xxhash64(*skewed.columns), F.lit(n_salt))
    s = skewed.withColumn(SALT_COL, salt_by.cast("int"))
    # explode cannot nest inside another expression — cast separately
    r = small.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn(SALT_COL, F.col(SALT_COL).cast("int"))
    return s.join(r, [*on, SALT_COL], how).drop(SALT_COL)
