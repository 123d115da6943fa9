"""Shared helpers for the operator modules.

The decimal-sum convention: per-row arithmetic stays in DOUBLE (IEEE,
identical across engines), the row value is cast to DECIMAL(18,6) so the
aggregate is exact/associative (shuffle-order independent — this is what
makes results reproducible on a 1000-executor cluster, not just a
hash-match trick), and the final sum is cast back to DOUBLE.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,6)"


def dsum(col: Column, alias: str) -> Column:
    """Order-independent SUM of a double expression."""
    return F.sum(col.cast(DEC)).cast("double").alias(alias)


def davg(col: Column, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / non-null count."""
    return (F.sum(col.cast(DEC)).cast("double") / F.count(col)).alias(alias)


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return (
        f"CAST(SUM(CAST({expr} AS DECIMAL(18,6))) AS DOUBLE)"
        f" / COUNT({expr}) AS {alias}"
    )
