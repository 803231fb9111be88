from .numeric import dec_avg, dec_cast, dec_sum, sql_dec_avg, sql_dec_cast, sql_dec_sum

__all__ = [
    "dec_avg",
    "dec_cast",
    "dec_sum",
    "sql_dec_avg",
    "sql_dec_cast",
    "sql_dec_sum",
]
