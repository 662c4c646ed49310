from paraslice_spark.sources.io import TABLES, load_tables

__all__ = ["TABLES", "load_tables"]
