from paraslice_spark.functions.canon import (
    cents,
    cents_sum,
    dbl,
    rev_cents,
    rnd,
)

__all__ = ["cents", "cents_sum", "dbl", "rev_cents", "rnd"]
