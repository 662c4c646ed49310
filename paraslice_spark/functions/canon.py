"""Cross-engine canonicalization helpers (SURVEY §5.3).

The driver hash-compares Spark vs DuckDB values, so float aggregates must be
bit-identical across engines. Strategy:

- **money math in exact decimals**: cast inputs to DECIMAL(10,2) (fractions
  like discount/tax to DECIMAL(3,2)) *before* arithmetic/summing. Decimal
  +,-,* are exact in both engines and precisions stay below both engines'
  38-digit cap, so results are independent of partial-aggregation order; one
  final cast to double is a single deterministic IEEE754 rounding ->
  identical bits on both sides.
- **inherently-inexact stats** (stddev, avg-of-doubles, cosine): round to a
  fixed small scale on BOTH sides with matching SQL.
- NULL ordering and timezone rules live in the operators; see SURVEY §5.3.

DuckDB twin idioms (use verbatim in oracles):

- ``money(c)``      <->  ``CAST(c AS DECIMAL(10,2))``
- fraction cast     <->  ``CAST(c AS DECIMAL(3,2))``
- ``money_sum(e)``  <->  ``CAST(SUM(e_decimal) AS DOUBLE)``
- ``rnd(e, n)``     <->  ``ROUND(CAST(e AS DOUBLE), n)``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: money columns (prices, balances). Kept at precision 10 so 3-factor
#: products stay under the 38-digit decimal cap in BOTH engines (exact).
MONEY = "decimal(10,2)"
#: small fractions: discount, tax (domain 0.00-1.99 after 1±x)
MONEY_FRAC = "decimal(3,2)"


def money(col: Column | str) -> Column:
    """Exact money representation of a double column."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(MONEY)


def dbl(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double")


def money_sum(expr: Column) -> Column:
    """Order-independent sum: decimal-exact accumulate, one cast to double."""
    return F.sum(expr).cast("double")


def rnd(col: Column, scale: int = 6) -> Column:
    """Round a double for cross-engine comparison of inexact stats."""
    return F.round(col.cast("double"), scale)


def rev_expr() -> Column:
    """The TPC-H revenue term l_extendedprice*(1-l_discount), decimal-exact.

    DuckDB twin:
    ``CAST(l_extendedprice AS DECIMAL(10,2))
      * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(3,2)))``
    """
    one = F.lit(1).cast(MONEY_FRAC)
    return money("l_extendedprice") * (one - F.col("l_discount").cast(MONEY_FRAC))
