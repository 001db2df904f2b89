"""Query registry: every implemented operator from SURVEY.md §2 registers a
(name → spark callable, DuckDB oracle SQL) pair here. ``__spark_entry__``
re-exports the registry; tests iterate it against the oracle."""

from rdkafka_streams_spark.queries.registry import REGISTRY, Query, query

# Import for side effect: each module registers its queries.
from rdkafka_streams_spark.queries import relational  # noqa: E402,F401
from rdkafka_streams_spark.queries import scalar_funcs  # noqa: E402,F401
from rdkafka_streams_spark.queries import windows  # noqa: E402,F401
from rdkafka_streams_spark.queries import events_streaming  # noqa: E402,F401
from rdkafka_streams_spark.queries import llm  # noqa: E402,F401
from rdkafka_streams_spark.queries import extras  # noqa: E402,F401
from rdkafka_streams_spark.queries import analytics  # noqa: E402,F401
from rdkafka_streams_spark.queries import behavior  # noqa: E402,F401
from rdkafka_streams_spark.queries import scaleops  # noqa: E402,F401
from rdkafka_streams_spark.queries import linkage  # noqa: E402,F401
from rdkafka_streams_spark.queries import curation  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "query"]
