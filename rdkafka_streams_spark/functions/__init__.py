from rdkafka_streams_spark.functions.money import (
    charge_expr,
    disc_price_expr,
    money,
    rate,
    sum_money,
)

__all__ = ["charge_expr", "disc_price_expr", "money", "rate", "sum_money"]
