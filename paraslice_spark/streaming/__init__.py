from paraslice_spark.streaming import batch_twins, streams  # noqa: F401

__all__ = ["batch_twins", "streams"]
