"""Physical-plan introspection.

At 100 TB the plan IS the performance: one avoidable Exchange is petabytes of
network traffic. These helpers let tests assert plan shape (shuffle count,
broadcast presence, pushdown) at tiny scale — the properties that survive a
100× scale-up, unlike wall-clock timings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the plan (broadcast exchanges excluded)."""
    plan = plan_string(df, "simple")
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line and "BroadcastExchange" not in line
    )


def count_key_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges excluding round-robin repartitions (and
    broadcasts). The scale-honesty budgets pin KEYED corpus shuffles —
    the ones that grow with data; a round-robin exchange here is the
    adaptive ``operators/spread.py`` guard widening a narrow (small-
    file) input, which is identity at production scale and must not
    trip a budget that exists to catch keyed-shuffle growth."""
    plan = plan_string(df, "simple")
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "RoundRobinPartitioning" not in line
    )


def count_rr_exchanges(df: DataFrame) -> int:
    """Round-robin shuffle exchanges in the plan — the companion gate to
    ``count_key_exchanges`` (r16, re-arming what the r15 split disarmed):
    excluding round-robin from the keyed budgets was correct (the
    ``operators/spread.py`` widening exchange is bounded and identity at
    production scale), but it also blinded the budgets to any OTHER
    round-robin shuffle — a plain ``.repartition(n)`` on a corpus-sized
    frame, the classic scale-killer. The budget tests now bound THIS
    count per query at its spread-site count, and the scale cert asserts
    it is ZERO at the 8×/32× multi-split replicas (certifying spread's
    identity-at-scale claim structurally instead of narratively)."""
    plan = plan_string(df, "simple")
    return sum(
        1
        for line in plan.splitlines()
        if "Exchange" in line
        and "BroadcastExchange" not in line
        and "RoundRobinPartitioning" in line
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in plan_string(df, "simple") or "BroadcastNestedLoopJoin" in plan_string(df, "simple")


def has_operator(df: DataFrame, name: str) -> bool:
    return name in plan_string(df, "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """The filter predicates that reached the parquet scan."""
    out = []
    for line in plan_string(df, "formatted").splitlines():
        line = line.strip()
        if line.startswith("PushedFilters:"):
            out.append(line[len("PushedFilters:") :].strip())
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """The predicates applied as directory-level partition pruning."""
    out = []
    for line in plan_string(df, "formatted").splitlines():
        line = line.strip()
        if line.startswith("PartitionFilters:"):
            out.append(line[len("PartitionFilters:") :].strip())
    return out


def scan_read_schemas(df: DataFrame) -> list[str]:
    """The ReadSchema of every file scan in the plan — what column
    pruning actually reached the reader. A scan whose ReadSchema lists
    columns the query never touches reads those bytes at 100 TB."""
    out = []
    for line in plan_string(df, "formatted").splitlines():
        line = line.strip()
        if line.startswith("ReadSchema:"):
            out.append(line[len("ReadSchema:") :].strip())
    return out
