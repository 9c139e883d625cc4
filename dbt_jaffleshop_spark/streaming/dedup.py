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
    spark: SparkSession,
    source_dir: str,
    watermark: str = "1 day",
    glob: str | None = None,
) -> DataFrame:
    """Deduplicate an events parquet feed on event_id, tolerating
    duplicates that arrive up to `watermark` after the original."""
    from ..sources.registry import normalize_event_ts
    from .daily import events_stream_schema

    reader = spark.readStream.schema(
        events_stream_schema(spark, source_dir, glob=glob)
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    stream = (
        normalize_event_ts(reader.parquet(source_dir))
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


def streaming_dedup_query(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Registry adapter: dedup the sf dir's events feed. The testdata
    feed carries unique event_ids, so the exact oracle is the identity
    relation — the value check covers the whole stream path (schema
    probe, ts normalization, watermarked dedup state, append sink);
    the replayed-duplicate semantics are pinned separately by
    tests/test_llm_ops.py::test_streaming_dedup_drops_replayed_file."""
    import os

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    return streaming_dedup_events(spark, sf_dir, glob="events*.parquet")


ORACLES: dict[str, str] = {
    "streaming_dedup_events": """
SELECT event_id, ts, user_id, event_type, value, props FROM events
""",
}
