from minarrow_spark.functions.arithmetic import (
    dec,
    exact_avg,
    exact_sum,
    exact_var_samp,
    floordiv,
    remainder,
    table_op,
    try_div,
)
from minarrow_spark.functions.strings import (
    byte_length,
    char_length,
    count_match,
    find0,
    str_join_agg,
)
from minarrow_spark.functions.datetimes import (
    add_days,
    add_months_,
    date_str,
    epoch_micros,
    epoch_seconds,
    is_leap_year,
    iso_dow,
    iso_week,
)

__all__ = [
    "dec", "exact_avg", "exact_sum", "exact_var_samp", "floordiv", "remainder",
    "table_op", "try_div", "byte_length", "char_length", "count_match", "find0",
    "str_join_agg", "add_days", "add_months_", "date_str", "epoch_micros",
    "epoch_seconds", "is_leap_year", "iso_dow", "iso_week",
]
