"""rdkafka_streams_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``viriciti/rdkafka-streams`` (a Kafka Consumer/Producer/Duplex object-stream
library, see /root/reference) as an idiomatic Spark engine:

- ``streaming``   — Consumer / Producer / Duplex equivalents on Structured
                    Streaming (reference: src/Consumer.coffee, src/Producer.coffee,
                    src/index.coffee).
- ``queries``     — the batch relational + streaming-window + LLM-pipeline
                    operator library (SURVEY.md §2), each operator a registered
                    query with a DuckDB oracle.
- ``operators``   — reusable compositions Spark lacks natively (as-of join,
                    top-k per group, dedup strategies, similarity search).
- ``functions``   — column-expression helpers (exact money math, text stats,
                    vector ops) built on pyspark.sql.functions only.
- ``core``        — session tuning and table IO.

Design stance (SURVEY.md §7.0): DataFrame/SQL everywhere, built-in functions
first, Arrow-batched pandas UDFs only where built-ins cannot express the
semantics, plain Python UDFs never.
"""

from rdkafka_streams_spark.core.session import get_spark, tune_for_bench, tune_runtime
from rdkafka_streams_spark.core.io import TABLES, load_table, register_views

__all__ = [
    "TABLES",
    "get_spark",
    "load_table",
    "register_views",
    "tune_for_bench",
    "tune_runtime",
]

__version__ = "0.1.0"
