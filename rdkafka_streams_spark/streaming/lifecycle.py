"""Query lifecycle (SURVEY.md §2.2 F5/F6).

The reference's destroy path: idempotent, unsubscribe → drain → disconnect
with a 6 s timeout (src/Consumer.coffee:112-151, src/Producer.coffee:89-118;
modulo the §1.4.3 typo bug, whose *intended* wait-then-stop semantics are
implemented here). The Spark analog is ``StreamingQuery.stop`` +
``awaitTermination`` — wrapped so repeated calls are no-ops and a hang past
the budget raises instead of blocking forever.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

#: mirrors the reference's disconnect budget (src/Consumer.coffee:139-142)
DEFAULT_TIMEOUT_S = 6.0


def shutdown(query: StreamingQuery, timeout_s: float = DEFAULT_TIMEOUT_S) -> bool:
    """Idempotently stop a query and wait for termination.

    Returns True once the query has terminated; raises TimeoutError if it is
    still running after ``timeout_s`` (the reference's destroy raises its
    disconnect-timeout error the same way).
    """
    if query.isActive:
        query.stop()
    if not query.awaitTermination(timeout_s):
        if query.isActive:
            raise TimeoutError(f"query {query.id} still active after {timeout_s}s")
    return True


def shutdown_all(spark: SparkSession, timeout_s: float = DEFAULT_TIMEOUT_S) -> int:
    """Stop every active query on the session (engine teardown). Returns the
    number of queries stopped."""
    qs = list(spark.streams.active)
    for q in qs:
        shutdown(q, timeout_s)
    return len(qs)
