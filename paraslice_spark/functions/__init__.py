from paraslice_spark.functions.canon import (
    dbl,
    money,
    money_sum,
    rev_expr,
    rnd,
)

__all__ = ["dbl", "money", "money_sum", "rev_expr", "rnd"]
