"""Exact money arithmetic.

All fixture money columns are 2-decimal values stored as doubles; casting to
DECIMAL makes every sum/product exact and therefore engine-independent
(identical in Spark and any ANSI oracle), unlike double aggregation whose
result depends on partial-aggregation order. Final outputs are cast back to
DOUBLE — the exact decimal values fit a double losslessly at any tested SF.

SQL_* constants are the DuckDB-side spellings of the same expressions; keeping
both here guarantees the query and its oracle never drift apart.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MONEY = "decimal(12,2)"
RATE = "decimal(4,2)"


def money(c: str | Column) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(MONEY)


def rate(c: str | Column) -> Column:
    c = F.col(c) if isinstance(c, str) else c
    return c.cast(RATE)


def _one() -> Column:
    return F.lit("1.00").cast("decimal(3,2)")


def disc_price_expr() -> Column:
    """l_extendedprice * (1 - l_discount), exact."""
    return money("l_extendedprice") * (_one() - rate("l_discount"))


def charge_expr() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax), exact."""
    return disc_price_expr().cast("decimal(16,4)") * (_one() + rate("l_tax"))


def sum_money(expr: Column, alias: str) -> Column:
    """Exact decimal sum, emitted as double."""
    return F.sum(expr).cast("double").alias(alias)


# --- DuckDB-side spellings (fragments for oracle SQL strings) ---
SQL_MONEY = "CAST({c} AS DECIMAL(12,2))"
SQL_DISC_PRICE = (
    "CAST(l_extendedprice AS DECIMAL(12,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2)))"
)
SQL_CHARGE = (
    f"CAST({SQL_DISC_PRICE} AS DECIMAL(16,4)) * (1.00 + CAST(l_tax AS DECIMAL(4,2)))"
)
