"""Exact money arithmetic on the fast integer path.

Why this exists: ``ROUND(SUM(double-product), 2)`` is order-dependent and
flips on half-cent boundaries between engines and between partitionings
(observed live: 378060.515 summing to .51 on Spark vs .52 on DuckDB).
Round 2 fixed that with DECIMAL(12,4) products, but a (12,4)x(12,4)
multiply produces precision 25 — beyond Spark's 18-digit compact-long
Decimal representation — so every row paid a java BigDecimal multiply
and q01 doubled in cold time.

This module keeps the exactness and buys the speed back with
scaled-integer arithmetic:

- money/rate columns in this corpus carry exactly 2 decimal digits, so
  ``ROUND(col * 100)`` cast to BIGINT is a lossless integer view
  (scale 100);
- products of those integers stay in pure long arithmetic inside
  whole-stage codegen (price_cents * (100 - disc_h) fits a long with
  ~9 digits to spare);
- only the SUM runs in decimal(38,0) — Spark's Decimal add stays on its
  compact-long fast path until a value actually exceeds 18 digits, so
  the overflow safety for a 100 TB sum is free at small scale;
- one exact decimal division by the scale factor, one ROUND, one cast
  to double at the very end.  The division result carries >= 6
  fractional digits (Spark's minimum scale under allowPrecisionLoss),
  which covers the <= 6 exact fractional digits of a three-factor
  product, so ROUND sees the exact value.

Measured at sf0.1 (local[32]): q01 cold 2.28 s -> 1.01 s with
bit-identical output to the decimal formulation and to the DuckDB
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: str | Column) -> Column:
    """Exact scale-100 integer view of a 2-decimal money/rate column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def disc_price_s4() -> Column:
    """``l_extendedprice * (1 - l_discount)`` as a scale-10^4 long."""
    return cents("l_extendedprice") * (F.lit(100) - cents("l_discount"))


def charge_s6() -> Column:
    """``l_extendedprice * (1 - l_discount) * (1 + l_tax)`` at scale 10^6."""
    return disc_price_s4() * (F.lit(100) + cents("l_tax"))


def money_sum_exact(expr: Column) -> Column:
    """Overflow-safe exact SUM of a scaled-integer expression.

    The per-row cast to decimal(38,0) is compact (long-backed); the
    aggregate buffer only promotes to BigDecimal if the running total
    actually exceeds 18 digits — i.e. never at test scale, safely at
    100 TB scale.
    """
    return F.sum(expr.cast("decimal(38,0)"))


def money_sum(expr: Column, scale: int, dp: int = 2) -> Column:
    """``ROUND(SUM(expr) / 10^scale, dp)`` as DOUBLE, exactly.

    ``expr`` must be an integer expression at scale ``10^scale`` (e.g.
    ``disc_price_s4()`` with scale=4).  Matches the DuckDB oracle's
    ``CAST(ROUND(SUM(DECIMAL-product), dp) AS DOUBLE)`` bit-for-bit
    because both sides round the same exact rational.
    """
    return F.round(money_sum_exact(expr) / F.lit(10**scale), dp).cast("double")
