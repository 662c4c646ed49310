"""Oracle-diff harness (SURVEY §5.2 layer 1).

Replicates the driver's check: run the PySpark query and the DuckDB oracle
SQL on the same parquet dir, compare row count + column names + an
order-insensitive canonical value multiset. Stricter-than-driver cell
canonicalization (exact float repr) so a local pass predicts a driver pass.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.sql("SET TimeZone='UTC'")
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir.rstrip('/')}/{t}.parquet'")
    return con


def _cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        if f == 0.0:
            f = 0.0  # normalize -0.0
        return repr(f)
    if isinstance(v, (np.bool_, bool)):
        return str(bool(v))
    if isinstance(v, (np.integer, int)):
        return str(int(v))
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, pd.Timestamp):
        if v is pd.NaT:
            return "NULL"
        return v.tz_localize(None).isoformat() if v.tzinfo else v.isoformat()
    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (np.ndarray, list, tuple)):
        return "[" + ",".join(_cell(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canonical_rows(df: pd.DataFrame) -> tuple[list[str], list[tuple[str, ...]]]:
    cols = sorted(df.columns)
    rows = sorted(
        tuple(_cell(v) for v in row)
        for row in df[cols].itertuples(index=False, name=None)
    )
    return cols, rows


def compare(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame) -> list[str]:
    """Return a list of mismatch descriptions (empty == match)."""
    problems: list[str] = []
    s_cols, s_rows = canonical_rows(spark_pdf)
    o_cols, o_rows = canonical_rows(oracle_pdf)
    if s_cols != o_cols:
        problems.append(f"columns differ: spark={s_cols} oracle={o_cols}")
        return problems
    if len(s_rows) != len(o_rows):
        problems.append(f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}")
    diffs = [i for i, (a, b) in enumerate(zip(s_rows, o_rows)) if a != b]
    if diffs:
        i = diffs[0]
        problems.append(
            f"{len(diffs)} differing rows (of {len(s_rows)}); first at sorted idx {i}:\n"
            f"  cols   {s_cols}\n  spark  {s_rows[i]}\n  oracle {o_rows[i]}"
        )
    return problems


def _array_typed_cols(pdf: pd.DataFrame) -> list[str]:
    """Columns holding array/map/struct-like cells (ndarray/list/tuple/dict).

    The DRIVER's canonicalizer cannot hash these (``TypeError: unhashable
    type: 'numpy.ndarray'`` — the exact CORRECTNESS_r02 failure on
    scalar_array_pack / scalar_json_pack), while this local harness happily
    string-serializes them, inverting its predict-the-driver purpose. So
    declared queries must serialize nested output to strings (array_join ↔
    array_to_string); keep genuine array outputs as internal pytest-only
    functions."""
    bad = []
    for col in pdf.columns:
        # scan the whole column, not a prefix: an array column whose first N
        # cells are all null would escape a head()-based check yet still blow
        # up the driver's canonicalizer on the first non-null cell (ADVICE r03)
        if any(isinstance(v, (np.ndarray, list, tuple, dict)) for v in pdf[col]):
            bad.append(col)
    return bad


def run_compare(
    spark, query_fn, oracle: str, sf_dir: str, strict_scalar: bool = True
) -> list[str]:
    spark_pdf = query_fn(spark, sf_dir).toPandas()
    if strict_scalar:
        bad = _array_typed_cols(spark_pdf)
        if bad:
            return [
                f"array-typed output columns {bad} would break the driver's "
                "canonicalizer — serialize with array_join/array_to_string "
                "(declared queries must emit scalar cells only)"
            ]
    with duck_con(sf_dir) as con:
        oracle_pdf = con.sql(oracle).fetchdf()
    return compare(spark_pdf, oracle_pdf)
