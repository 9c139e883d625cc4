"""Structured Streaming extension (beyond-reference; the reference is
batch-only — SURVEY §2.11): a tumbling-window daily event summary with a
watermark, mirroring the batch `daily_summary` semantics over `events`.

Shape: readStream(parquet) → event-time window agg with watermark →
availableNow trigger → memory sink. In production the source is a
directory/Kafka feed and the sink is Delta; availableNow gives the
batch-equivalent result here, which is why this query can carry a real
DuckDB oracle (single-file source ⇒ one micro-batch ⇒ the watermark
drops nothing).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Matches the events parquet with nanos-as-long in effect (registry.py) —
# the legacy driver generation. Current generations ship ts as native
# TIMESTAMP(MICROS); use events_stream_schema() to probe which one a given
# source directory carries (streams can't infer schema).
_EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", LongType()),  # raw nanoseconds
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)


def events_stream_schema(
    spark: SparkSession, source_dir: str, glob: str | None = "events*.parquet"
) -> StructType:
    """Declared schema for an events parquet stream: probe the footer with a
    batch read (honoring nanosAsLong) so the stream sees exactly what the
    batch oracle path sees, whichever ts physical type the files carry."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    reader = spark.read
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    return reader.parquet(source_dir).schema


def streaming_daily_events(
    spark: SparkSession,
    sf_dir: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Tumbling 1-day window × event_type counts/sums over a parquet
    stream, processed to completion with availableNow. With
    ``max_files_per_trigger`` the run splits into multiple micro-batches
    (the complete-mode window state carries across them; the final table
    is the full aggregation either way)."""
    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from ..sources.registry import normalize_event_ts

    reader = spark.readStream.schema(events_stream_schema(spark, sf_dir)).option(
        "pathGlobFilter", "events*.parquet"
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = normalize_event_ts(reader.parquet(sf_dir)).withColumn(
        "value_cents", F.expr("cast(round(value * 100) as bigint)")
    )
    agg = (
        stream.withWatermark("ts", "1 day")
        .groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value_cents").alias("sum_value_cents"),
        )
    )
    name = f"stream_daily_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    import json as _json

    data_batches = 0
    for p in q.recentProgress:
        prog = _json.loads(p.json) if hasattr(p, "json") else p
        if int(prog.get("numInputRows", 0)) > 0:
            data_batches += 1
    out = spark.table(name).select(
        F.col("w.start").cast("date").alias("date_day"),
        "event_type",
        "n_events",
        "sum_value_cents",
    )
    out.num_data_batches = data_batches  # test introspection
    return out


ORACLES: dict[str, str] = {
    "streaming_daily_events": """
SELECT CAST(date_trunc('day', ts) AS DATE) AS date_day,
       event_type,
       count(*) AS n_events,
       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_value_cents
FROM events
GROUP BY 1, 2
""",
}
