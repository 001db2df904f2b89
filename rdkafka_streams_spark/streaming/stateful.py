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


def running_count_with_ttl(
    df: DataFrame,
    keys: Sequence[str],
    ttl_ms: int = 60_000,
    output_mode: str = "update",
) -> DataFrame:
    """Running count per key with idle-TTL eviction
    (``ProcessingTimeTimeout``): each update re-arms a per-key timer; a key
    idle for ``ttl_ms`` emits one final ``expired=true`` row and its state
    is REMOVED from the store.

    The reference's per-key closure state (test/test_getDuplex.coffee:60,69)
    lives as long as the process and never evicts — fine for a test harness,
    fatal at 100 TB where keys churn: unbounded state is the classic
    streaming OOM. This is the eviction discipline every production stateful
    operator needs; timer semantics mirror what
    ``transformWithStateInPandas`` timers would provide (gated off in this
    container — see ``tws_available``).
    """
    key_cols = list(keys)
    out_schema = ", ".join(f"{k} string" for k in key_cols) + ", n long, expired boolean"

    def update(
        key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            (n,) = state.get
            state.remove()
            yield pd.DataFrame([{**dict(zip(key_cols, key)), "n": n, "expired": True}])
            return
        (prev,) = state.get if state.exists else (0,)
        n = prev + sum(len(b) for b in batches)
        state.update((n,))
        state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame([{**dict(zip(key_cols, key)), "n": n, "expired": False}])

    grouped = df.select([*(c for c in key_cols)]).groupBy(*key_cols)
    return grouped.applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n long",
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )


def tws_available() -> bool:
    """transformWithStateInPandas needs the protobuf wire format for its
    driver↔worker state channel; without a working google.protobuf the TWS
    python worker crashes at startup. Gate callers on this."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


def running_stats_tws(df: DataFrame, key: str, value_col: str = "value") -> DataFrame:
    """Running (count, mean) per key on Spark 4's transformWithStateInPandas —
    the successor API to applyInPandasWithState (typed state variables,
    timers, RocksDB-backed). Functionally equivalent to
    ``running_count_stateful`` + a mean; provided for the newer surface.

    Requires the protobuf python package (see ``tws_available``) and
    ``spark.sql.streaming.stateStore.providerClass =
    ...RocksDBStateStoreProvider``.
    """
    if not tws_available():
        raise ImportError(
            "transformWithStateInPandas requires the google.protobuf package; "
            "use running_count_stateful (applyInPandasWithState) instead"
        )
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("agg", "n LONG, total DOUBLE")

        def handleInputRows(self, key_, rows, timer_values):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf[value_col].sum())
            self._state.update((n, total))
            yield pd.DataFrame({key: [key_[0]], "n": [n], "mean_value": [total / n]})

        def close(self) -> None:
            pass

    return df.groupBy(key).transformWithStateInPandas(
        _RunningStats(),
        outputStructType=f"{key} string, n long, mean_value double",
        outputMode="Update",
        timeMode="None",
    )


def session_windows_stateful(
    df: DataFrame,
    gap_us: int,
    key: str = "user_id",
    ts_col: str = "ts_us",
    output_mode: str = "update",
) -> DataFrame:
    """Gap-based session windows as arbitrary per-key state (T7): the open
    session (start, last, n) lives in the state store across micro-batches;
    a record more than ``gap_us`` after the open session's last event CLOSES
    it (emitted exactly once) and opens a new one. Input must arrive in
    event-time order per key (keyed, partition-ordered produce — the q179
    discipline); within a batch rows are sorted before folding, so only
    cross-batch order is the caller's contract. Sessions still open when the
    stream ends are never emitted — an unfinished window has no final form.
    State is O(keys); there is no per-event retention (the 100 TB bound).
    Reference anchor: user Transform closure state
    (test/test_getDuplex.coffee:60,69) generalized to windowed emission.
    """

    def update(
        key_t: tuple, batches: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = None, None, 0
        closed: list[dict] = []
        ts_all: list[int] = []
        for b in batches:
            ts_all.extend(int(t) for t in b[ts_col])
        ts_all.sort()
        for t in ts_all:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append(
                    {key: key_t[0], "start_us": start, "end_us": last, "n_events": n}
                )
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))
        if closed:
            yield pd.DataFrame(closed)

    return df.groupBy(key).applyInPandasWithState(
        update,
        outputStructType=f"{key} string, start_us long, end_us long, n_events long",
        stateStructType="start_us long, last_us long, n long",
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
