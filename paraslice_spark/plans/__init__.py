from paraslice_spark.plans.scale import bucketed_table, salted_join

__all__ = ["bucketed_table", "salted_join"]
