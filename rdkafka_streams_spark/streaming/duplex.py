"""Duplex — the reference's loop-back event bus (SURVEY.md §2.1 S3, §3.3).

``getDuplex`` fuses a Producer (write side) and Consumer (read side) on ONE
topic (src/index.coffee:7-11); the canonical pipeline reads from the bus,
transforms, and writes back to the same bus (test/test_getDuplex.coffee:76).

Spark shape: one streaming read on topic T → transform → streaming write to
topic T. The feedback loop terminates only because the transform re-tags
records and the read side filters already-processed ones (the reference test
filters on ``value.source``, test/test_getDuplex.coffee:68,72). Spark queries
do not self-destroy on a data condition, so the guard is REQUIRED here:
``pipe`` refuses to start without one — otherwise the loop amplifies forever
at 100 TB scale. ``apply_batch`` runs the same transform+guard on a batch
frame for broker-free verification of loop convergence.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from rdkafka_streams_spark.streaming.consumer import KConsumer
from rdkafka_streams_spark.streaming.producer import KProducer

Transform = Callable[[DataFrame], DataFrame]


@dataclass
class Duplex:
    """Read side + write side of the same topic, with a mandatory loop guard."""

    consumer: KConsumer
    producer: KProducer

    def pipe(
        self,
        spark: SparkSession,
        transform: Transform,
        guard: Column,
        trigger: str | None = None,
        available_now: bool = False,
    ) -> StreamingQuery:
        """read(T) → filter(guard) → transform → write(T).

        ``guard`` must select only records the transform has NOT produced
        (e.g. ``col("value.source") == "origin"``), mirroring the reference
        test's re-tag-and-filter convergence contract. ``available_now``
        drains what exists and stops at a batch boundary (one loop hop).
        """
        src = self.consumer.stream(spark)
        out = transform(src.where(guard))
        return self.producer.write(out, trigger=trigger, available_now=available_now)

    def apply_batch(self, batch: DataFrame, transform: Transform, guard: Column) -> DataFrame:
        """One loop-back hop on a batch frame (what one micro-batch does) —
        used by tests to prove the guard stops re-amplification."""
        return transform(batch.where(guard))


def get_duplex(
    host: str,
    topic: str,
    group_id: str | None = None,
    schema=None,
    from_offset: str = "earliest",
    checkpoint: str | None = None,
    transport: str = "kafka",
) -> Duplex:
    """``getDuplex(options)`` analog (src/index.coffee:7-11): same options
    feed both halves. The reference's dead ``awaitPartitions`` option
    (SURVEY.md §1.4.4) has no analog — Spark's sink handles metadata
    readiness. ``transport="topiclog"`` runs the loop against the in-repo
    durable log (streaming/topiclog.py) when no broker exists."""
    return Duplex(
        consumer=KConsumer(
            host=host, topic=topic, group_id=group_id,
            from_offset=from_offset, schema=schema, transport=transport,
        ),
        producer=KProducer(
            host=host, topic=topic, checkpoint=checkpoint, transport=transport,
        ),
    )
