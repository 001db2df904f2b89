"""Arbitrary stateful per-key processing (SURVEY.md §2.5 T7).

The reference's user Transforms hold closure state across records (the
running ``count`` in test/test_getDuplex.coffee:60,69). The Spark-native
equivalent is ``applyInPandasWithState``: per-key state in the state store,
Arrow-batched user logic, watermark-driven timeout eviction.

Scale notes: state is partitioned by key across executors; state size is
O(distinct keys), not O(rows). Always set a timeout (or watermark) so
abandoned keys evict — unbounded state is the classic 100 TB streaming
failure mode.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_count_stateful(
    df: DataFrame,
    keys: Sequence[str],
    output_mode: str = "update",
) -> DataFrame:
    """Streaming running count per key — the reference's counter Transform as
    a distributed stateful operator. Output rows: (*keys, n) after each batch.
    """
    key_cols = list(keys)
    out_schema = ", ".join(f"{k} string" for k in key_cols) + ", n long"

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (prev,) = state.get if state.exists else (0,)
        n = prev + sum(len(b) for b in batches)
        state.update((n,))
        yield pd.DataFrame([{**dict(zip(key_cols, key)), "n": n}])

    grouped = df.select([*(c for c in key_cols)]).groupBy(*key_cols)
    return grouped.applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n long",
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
