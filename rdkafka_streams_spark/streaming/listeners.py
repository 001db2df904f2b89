"""Delivery/lifecycle eventing (SURVEY.md §2.2 F7).

The reference Producer emits ``dr`` per delivery report and a periodic
``total-delivered`` count (src/Producer.coffee:42-61 — whose poll loop is
buggy and fires once, SURVEY.md §1.4.2; intended semantics implemented here).
Spark's equivalent signal is the micro-batch progress event: numInputRows of
a committed batch IS the delivery confirmation (batch commit ≈ dr barrier).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql.streaming import StreamingQueryListener


class DeliveryListener(StreamingQueryListener):
    """Counts delivered (committed) rows per query; optional callback mirrors
    the reference's ``total-delivered`` event consumer."""

    def __init__(self, on_total: Callable[[str, int], None] | None = None):
        self.totals: dict[str, int] = {}
        self._on_total = on_total

    # -- StreamingQueryListener interface ---------------------------------
    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        self.totals.setdefault(str(event.id), 0)

    def onQueryProgress(self, event) -> None:  # noqa: N802
        qid = str(event.progress.id)
        n = int(event.progress.numInputRows or 0)
        self.totals[qid] = self.totals.get(qid, 0) + n
        if self._on_total is not None:
            self._on_total(qid, self.totals[qid])

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    @property
    def total_delivered(self) -> int:
        return sum(self.totals.values())


def progress_latency_percentiles(
    progresses,
    keys: tuple[str, ...] = ("triggerExecution", "addBatch"),
    pcts: tuple[int, ...] = (50, 95),
) -> dict[str, float | int]:
    """Micro-batch latency percentiles from StreamingQuery progress events —
    the latency analog of the reference Producer's 1 s delivery heartbeat
    (src/Producer.coffee:54-60 reports COUNT per second; this reports how
    LONG each delivery barrier took). ``progresses`` is ``recentProgress``
    (dicts) or live ``StreamingQueryProgress`` objects; only batches that
    moved rows count (idle ticks would flatter the numbers). Percentiles are
    nearest-rank on the sorted durations — deterministic, no interpolation.
    Returns {"<key>_p<pct>_ms": ..., "batches": n}."""
    samples: dict[str, list[float]] = {k: [] for k in keys}
    n = 0
    for p in progresses:
        if not isinstance(p, dict):
            import json as _json

            p = _json.loads(p.json)
        if not p.get("numInputRows"):
            continue
        n += 1
        dur = p.get("durationMs") or {}
        for k in keys:
            if k in dur:
                samples[k].append(float(dur[k]))
    out: dict[str, float | int] = {"batches": n}
    for k, vals in samples.items():
        vals.sort()
        for pct in pcts:
            if vals:
                idx = max(0, -(-pct * len(vals) // 100) - 1)  # nearest-rank
                out[f"{k}_p{pct}_ms"] = vals[idx]
    return out


def with_observed_count(df, name: str = "delivered"):
    """Attach an in-plan observation (``df.observe``): the engine aggregates
    the metric DURING the batch (no extra pass) and reports it in
    ``QueryProgress.observedMetrics[name]`` — the per-batch analog of the
    reference's ``dr`` delivery reports, but exact and transactional with
    the batch commit. Works on batch frames too (metrics via
    ``Observation``)."""
    from pyspark.sql import functions as F

    return df.observe(name, F.count(F.lit(1)).alias("rows"))
