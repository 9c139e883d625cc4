"""Streaming → ACID-table sink (beyond-reference; the reference is
batch-only and its warehouse provides transactional sinks natively —
README.md:43 Databricks/Snowflake targets; BASELINE.json's approach line
says "Spark SQL + Delta/Iceberg").

``foreachBatch`` + the engine's snapshot log (plans/acid.py) reproduce the
Delta-style streaming-sink contract without the Delta package:

* every micro-batch commits as ONE atomic snapshot — a reader polling the
  table mid-stream sees a consistent prefix of batches, never a partial
  batch;
* the committed batch id is recorded in the snapshot metadata, and a
  batch whose id is ≤ the last committed one is skipped — the
  Delta `txnVersion` idempotence trick, so a restart that replays a
  micro-batch does not double-append.

The feed is the watermark-scoped streaming dedup (dropDuplicatesWithin-
Watermark on event_id), so the end-to-end pipeline is: at-least-once file
feed → bounded-state dedup → exactly-once committed table.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from ..plans.acid import AcidTable
from ..sources.registry import normalize_event_ts
from .daily import events_stream_schema


def streaming_events_to_acid(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    watermark: str = "1 day",
    max_files_per_trigger: int | None = None,
) -> AcidTable:
    """Run the deduplicated events feed to completion (availableNow) into
    an AcidTable; returns the table (its manifest count = committed
    micro-batches). ``max_files_per_trigger`` splits the run into several
    micro-batches to exercise the per-batch commit path."""
    table = AcidTable(table_path)

    reader = spark.readStream.schema(
        events_stream_schema(spark, source_dir, glob=None)
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = (
        normalize_event_ts(reader.parquet(source_dir))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["event_id"])
    )

    def commit_batch(batch_df, batch_id: int) -> None:
        if table.exists():
            last = table.manifest().get("meta", {}).get("stream_batch_id", -1)
            if batch_id <= last:
                return  # replayed batch after restart — already committed
        if batch_df.isEmpty():
            return  # restart tail/empty trigger — nothing to commit
        table.append(batch_df, meta={"stream_batch_id": batch_id})

    q = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", table_path + "/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table
