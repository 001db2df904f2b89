"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real logic lives in the ``rdkafka_streams_spark`` package; this module
just adapts its query registry (rdkafka_streams_spark.queries.REGISTRY) to
the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from rdkafka_streams_spark.queries import REGISTRY  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-shaped pricing summary: scan → pushed-down filter → 2-key hash
    aggregate (8 aggregates, exact decimal money math) → sort.
    """
    return REGISTRY["q01_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in sorted(REGISTRY.items())}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query; omitted entries (engine-specific
    sketches / pandas-UDF ops) get the driver's rows-only check."""
    return {name: q.oracle for name, q in sorted(REGISTRY.items()) if q.oracle is not None}
