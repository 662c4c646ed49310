"""Operator modules. Importing this package registers every declared query
into :mod:`paraslice_spark.registry` (import side effect by design — the
driver entry point just re-exports the registry dicts)."""

from paraslice_spark import streaming  # noqa: F401  (registers batch twins)
from paraslice_spark.functions import udfs  # noqa: F401
from paraslice_spark.operators import (  # noqa: F401
    aggregates,
    cdc,
    flagship,
    joins,
    multimodal,
    relational,
    reshape,
    scalar_packs,
    shuffle_audits,
    similarity,
    sorts_sets,
    subqueries,
    tensor,
    text,
    windows,
)

__all__ = [
    "aggregates",
    "flagship",
    "joins",
    "relational",
    "scalar_packs",
    "sorts_sets",
    "windows",
]
