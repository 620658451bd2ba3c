"""Single source of truth for event-time arithmetic.

The testdata's ``events.ts`` (and ``o_orderdate`` / ``l_shipdate``) are
real parquet TIMESTAMP columns — microsecond precision in both Spark
and DuckDB. Every event-time operator converts to epoch *microseconds*
through these helpers so the engine and the DuckDB oracle
(``epoch_us(ts)``) agree bit-for-bit; no module spells its own
conversion.

Synthetic unit-test fixtures sometimes build ``ts`` as a raw bigint
(nanoseconds); the helpers detect the column type and keep that legacy
path working (integer ``div 1000`` — double division would round above
2^53).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    TimestampNTZType,
    TimestampType,
)

_TS_TYPES = (TimestampType, TimestampNTZType)
_INT_TYPES = (LongType, IntegerType)


_NTZ_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def event_micros_sql(df: DataFrame, col: str = "ts") -> str:
    """Spark-SQL spelling of the epoch-micros conversion for
    ``df[col]``.

    TIMESTAMP_NTZ (what parquet TIMESTAMP arrives as) →
    ``timestampdiff(MICROSECOND, epoch, col)`` — pure wall-clock
    arithmetic, independent of ``spark.sql.session.timeZone``, exactly
    DuckDB's ``epoch_us``; TIMESTAMP (tz-aware) → ``unix_micros``;
    integral (legacy bigint-nanos fixtures) → ``col div 1000``.
    """
    dt = df.schema[col].dataType
    if isinstance(dt, TimestampNTZType):
        return f"timestampdiff(MICROSECOND, {_NTZ_EPOCH}, {col})"
    if isinstance(dt, TimestampType):
        return f"unix_micros({col})"
    if isinstance(dt, _INT_TYPES):
        return f"({col} div 1000)"
    raise TypeError(f"event_micros_sql: unsupported type {dt} for column {col!r}")


def event_micros(df: DataFrame, col: str = "ts") -> Column:
    """Epoch-microseconds Column for ``df[col]`` (see
    :func:`event_micros_sql` for the type rules)."""
    return F.expr(event_micros_sql(df, col))


def event_time(df: DataFrame, col: str = "ts") -> Column:
    """A tz-aware TimestampType Column for watermarks / ``F.window``
    (Spark rejects TIMESTAMP_NTZ as an event-time column). Built as
    ``timestamp_micros(event_micros(...))`` so the epoch value is
    exactly :func:`event_micros` regardless of session timezone."""
    dt = df.schema[col].dataType
    if isinstance(dt, TimestampType):
        return F.col(col)
    return F.timestamp_micros(event_micros(df, col))


def pandas_micros(series):
    """Pandas-side twin of :func:`event_micros` for Arrow batches inside
    applyInPandas(WithState): datetime64 → epoch micros, integer →
    nanos // 1000."""
    import pandas as pd

    if pd.api.types.is_datetime64_any_dtype(series):
        return series.astype("datetime64[us]").astype("int64")
    return (series // 1000).astype("int64")
