"""The operator/query registry backing ``__spark_entry__.py``.

Each registered query is the driver-contract unit of work: a callable
``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) the equivalent
ANSI SQL that DuckDB runs on the same parquet for the correctness gate.

Determinism rules (so the order-insensitive value hash matches):
- alias every computed column identically in Spark and SQL;
- money math in DECIMAL (exact, engine-independent), cast to DOUBLE only for
  the final output;
- irrational functions (sqrt/ln/exp/stddev/...) rounded to ≤6 decimals;
- any Top-K / row_number ordering made total with a unique tiebreak key.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from rdkafka_streams_spark.core.session import tune_runtime


@dataclass(frozen=True)
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL; None → driver does a rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, Query] = {}


def query(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
) -> Callable:
    """Decorator registering an operator query.

    The wrapper re-applies runtime confs (UTC timezone, AQE) because the
    driver owns the SparkSession and may have built it differently.
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            tune_runtime(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=wrapped, oracle=oracle, tags=tags, doc=fn.__doc__ or "")
        return wrapped

    return deco
