"""As-of join (SURVEY.md §2.4 E9) — nearest-prior-event join.

Spark SQL has no native ASOF JOIN. The scalable composition here is the
union-and-carry-forward trick, NOT a range join:

  1. union left and right rows (tagged) on the shared key space,
  2. one window sort by (key, ts, side) carries the latest right-side payload
     forward with last(..., ignoreNulls=True),
  3. keep only left rows.

Cost: a single shuffle+sort on (key, ts) — identical asymptotics to a
sort-merge join, with no risk of the O(|L|·|R|) blowup a naive
range-join + row_number() formulation has when many right rows precede each
left row. This is the plan that survives 100 TB: both sides partition by key,
the window sort is per-key, and skewed keys are handled by AQE.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_TS = "__asof_ts"
_LEFT = "__asof_is_left"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload: Sequence[str],
    strict: bool = True,
    suffix: str = "_asof",
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    right_ts < left_ts (strict) or <= (inclusive), matching on the key(s).
    ``direction="forward"`` flips the lookup: the EARLIEST right row with
    right_ts > left_ts (strict) — the time-to-next-event join — via the
    same one-shuffle union-carry with the sort reversed.

    Left rows with no prior (resp. later) right row keep NULL payload
    (left-outer semantics). Output columns: all left columns +
    ``{p}{suffix}`` for each payload column + ``{right_ts}{suffix}``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    carried = list(payload) + [right_ts]

    # Tie rule: strict → left sorts before right at equal ts (right invisible);
    # inclusive → right first.
    left_side, right_side = (0, 1) if strict else (1, 0)

    lt = (
        left.withColumn(_TS, F.col(left_ts))
        .withColumn(_SIDE, F.lit(left_side))
        .withColumn(_LEFT, F.lit(True))
    )
    rt = (
        right.select(
            *[F.col(k) for k in keys],
            F.col(right_ts).alias(_TS),
            *[F.col(c).alias(f"{c}{suffix}") for c in carried],
        )
        .withColumn(_SIDE, F.lit(right_side))
        .withColumn(_LEFT, F.lit(False))
    )

    u = lt.unionByName(rt, allowMissingColumns=True)
    # forward = the same carry walked from the time-reversed end: order ts
    # DESC so "last non-null preceding" means "nearest following"
    order = (
        [F.col(_TS), F.col(_SIDE)]
        if direction == "backward"
        else [F.col(_TS).desc(), F.col(_SIDE)]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in carried:
        u = u.withColumn(f"{c}{suffix}", F.last(f"{c}{suffix}", ignorenulls=True).over(w))
    return u.where(F.col(_LEFT)).drop(_SIDE, _TS, _LEFT)
