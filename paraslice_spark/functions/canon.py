"""Cross-engine canonicalization helpers (SURVEY §5.3).

The driver hash-compares Spark vs DuckDB values, so float aggregates must be
bit-identical across engines. Strategy — **integer cents**:

Fixture money columns are exactly 2-decimal (verified at every sf), so
``round(c*100)`` as int64 is lossless. All money arithmetic then happens in
int64 — exact, order-independent, whole-stage-codegen friendly — and one
final ``CAST(SUM(...) AS DOUBLE) / 10^k`` division is a deterministic IEEE754
op producing identical bits on both engines.

Measured rationale (this container, sf0.1): DECIMAL-typed aggregation in
Spark showed 10-60s straggler outliers (codegen deopt on uncached parquet
reads) vs a stable ~1s for the identical int64 plan; DuckDB HUGEINT sums
map cleanly. Decimal would also overflow its 38-digit cap on 3-factor
products; int64 holds to ~9e18 (sum of per-row charge ≤ 4e11 → fine to
~2e7 rows per group; beyond that, split sums or use decimal — documented
100 TB note).

Half-up vs banker's rounding divergence (Spark round vs DuckDB round) is
immaterial here: 2-decimal values times 100 land within 1e-9 of an integer,
never at a .5 boundary.

DuckDB twin idioms (use verbatim in oracles):

- ``cents(c)``            <->  ``CAST(round(c*100) AS BIGINT)``
- ``cents_sum(e, k)``     <->  ``CAST(SUM(e_cents) AS DOUBLE) / 10^(2k).0``
- ``rnd(e, n)``           <->  ``ROUND(CAST(e AS DOUBLE), n)``
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str) -> Column:
    """Lossless int64 cents of an exactly-2-decimal money column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


def cents_sum(expr: Column, factors: int = 1) -> Column:
    """Exact integer sum -> one double division.

    ``factors`` = how many cents-scaled terms were multiplied in ``expr``
    (1 for a plain money column, 2 for price*(1-disc), 3 for *(1+tax)).
    """
    return F.sum(expr).cast("double") / float(10 ** (2 * factors))


def micros_units(col: Column | str) -> Column:
    """int64 micro-units of an arbitrary-precision double (events.value is
    NOT 2-decimal). round(v*1e6) is the same double op on both engines, so
    the derived metric is deterministic even though it quantizes the input.

    DuckDB twin: ``CAST(round(v*1000000) AS BIGINT)``; divide sums by 1e6.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 1000000).cast("long")


def dbl(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("double")


def rnd(col: Column, scale: int = 6) -> Column:
    """Round a double for cross-engine comparison of inexact stats."""
    return F.round(col.cast("double"), scale)


#: Content-hash split rule (single source of truth — ADVICE r7: the rule was
#: restated inline by both sample_split_train_val_test and
#: text_bloom_prefilter; a one-sided edit would silently desynchronize their
#: notion of "heldout" while each still passed its own oracle).  Key = first
#: md5 hex digit of the stringified doc id: 0-b train (75%), c-d val, e-f
#: test; "heldout" = val+test = digit >= 'c'.
SPLIT_DIGIT_SQL = "substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)"
SPLIT_VAL_DIGIT = "c"  # first non-train digit (heldout boundary)
SPLIT_TEST_DIGIT = "e"  # first test digit
HELDOUT_SQL = f"{SPLIT_DIGIT_SQL} >= '{SPLIT_VAL_DIGIT}'"
#: Three-way split label as one SQL expression — every query that names a
#: split ('train'/'val'/'test') must use this or :func:`split_label`, never
#: an inline CASE (r8 review: pipeline_dataset_build restated the digits).
SPLIT_LABEL_SQL = (
    f"CASE WHEN {SPLIT_DIGIT_SQL} < '{SPLIT_VAL_DIGIT}' THEN 'train' "
    f"WHEN {SPLIT_DIGIT_SQL} < '{SPLIT_TEST_DIGIT}' THEN 'val' "
    f"ELSE 'test' END"
)


def split_digit(col: Column | str = "doc_id") -> Column:
    """Spark twin of :data:`SPLIT_DIGIT_SQL`."""
    c = F.col(col) if isinstance(col, str) else col
    return F.substring(F.md5(c.cast("string")), 1, 1)


def is_heldout(col: Column | str = "doc_id") -> Column:
    """Spark twin of :data:`HELDOUT_SQL` (val+test membership)."""
    return split_digit(col) >= SPLIT_VAL_DIGIT


def split_label(col: Column | str = "doc_id") -> Column:
    """Spark twin of :data:`SPLIT_LABEL_SQL` (train/val/test label)."""
    h = split_digit(col)
    return (
        F.when(h < SPLIT_VAL_DIGIT, "train")
        .when(h < SPLIT_TEST_DIGIT, "val")
        .otherwise("test")
    )


def md5_u32(col: Column | str) -> Column:
    """int64 of the first 8 md5 hex digits of a column's string form —
    the single md5-u32 base-hash rule every hash consumer (CMS family,
    text_hashed_features) must use; extracted in the r8-continuation
    review after text_hashed_features restated it inline (the cms_hash
    drift warning, one level down).

    DuckDB twin: :func:`md5_u32_sql`.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast(
        "long"
    )


def md5_u32_sql(expr: str) -> str:
    """DuckDB twin of :func:`md5_u32` for an arbitrary SQL expression."""
    return (
        f"('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, 8))"
        "::UBIGINT::BIGINT"
    )


def rev_cents() -> Column:
    """TPC-H revenue term in cents²: cents(price) * (100 - cents(discount)).

    DuckDB twin:
    ``CAST(round(l_extendedprice*100) AS BIGINT)
      * (100 - CAST(round(l_discount*100) AS BIGINT))``
    divide the SUM by 10000.0.
    """
    return cents("l_extendedprice") * (100 - cents("l_discount"))
