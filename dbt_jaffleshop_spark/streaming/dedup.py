"""Streaming exact deduplication (beyond-reference): the streaming
counterpart of ``llm/dedup.py::dedup_exact`` for a continuous ingest
feed — the shape every training-data pipeline needs when the same
document/event can arrive more than once (at-least-once sources,
backfills, replayed partitions).

``dropDuplicatesWithinWatermark`` keys the dedup state on the id and
lets the watermark expire state for ids older than the lateness bound,
so state size is O(events within the watermark window), not O(stream
history) — the property that makes streaming dedup viable at 100 TB/day
ingest. (Plain ``dropDuplicates`` on a stream keeps ALL keys forever.)

Like the other streaming operators, availableNow + memory sink gives the
batch-equivalent result for testing; the semantics under a live trigger
are identical as long as duplicates arrive within the watermark bound.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

def streaming_dedup_events(
    spark: SparkSession, source_dir: str, watermark: str = "1 day"
) -> DataFrame:
    """Deduplicate an events parquet feed on event_id, tolerating
    duplicates that arrive up to `watermark` after the original."""
    from ..sources.registry import normalize_event_ts
    from .daily import events_stream_schema

    stream = (
        normalize_event_ts(
            spark.readStream.schema(
                events_stream_schema(spark, source_dir, glob=None)
            ).parquet(source_dir)
        )
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    name = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)
