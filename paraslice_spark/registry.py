"""Declaration registry — colocates each query with its DuckDB oracle.

The driver contract (``__spark_entry__.py``) needs two parallel dicts:
``queries()`` (name -> (spark, sf_dir) -> DataFrame) and ``oracle_sql()``
(name -> ANSI SQL for DuckDB). Keeping them in separate files drifts; the
``@query`` decorator keeps the Spark implementation and its oracle in one
place and the entry module just re-exports these dicts.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register ``fn(spark, sf_dir) -> DataFrame`` as a declared query.

    ``oracle`` is the equivalent DuckDB SQL over the pre-registered views
    (region nation customer supplier part orders lineitem events documents
    embeddings). Omit it for non-SQL-expressible ops (driver then records a
    rows-only check — SURVEY §0.2).
    """

    def deco(fn):
        if name in QUERIES:
            raise ValueError(
                f"duplicate query registration: {name!r} "
                f"(existing: {QUERIES[name].__module__}, new: {fn.__module__})"
            )
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        fn.__query_name__ = name
        return fn

    return deco
