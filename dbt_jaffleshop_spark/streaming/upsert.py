"""Streaming CDC upsert sink (r6, beyond-reference): ``foreachBatch`` +
:meth:`plans.acid.AcidTable.merge_rows` — the Delta ``MERGE INTO`` from
a stream pattern, the standard production shape for maintaining a keyed
state table (user profile, device registry, account balance) from an
event feed. The append sink (streaming/sink.py) lands each batch as new
rows; THIS sink folds each micro-batch into per-key running state:

* per batch, events reduce to one state delta per user_id (count, cents
  sum, argmax-by-(ts, event_id) last event) — a partial aggregation the
  combine step below makes exact across any batch split;
* the delta LEFT-joins the table's current state and combines (sums add,
  the lexicographically-later (ts_us, event_id) struct wins), so the
  result is independent of how the feed was batched OR ordered;
* the combined rows MERGE through the real commit path: the state table
  is bucket-partitioned (user_id mod N_BUCKETS), so each batch rewrites
  only the buckets it touches — O(affected buckets), Delta's
  partition-pruned MERGE;
* the committed ``stream_batch_id`` makes replays idempotent exactly as
  in the append sink: a restart that re-delivers micro-batch k skips it
  instead of double-counting. (The guard is scoped to one checkpoint
  lineage — a NEW checkpoint restarts batch ids at 0, so always pair a
  fresh checkpoint with a fresh table, as the registered adapter does.)

End state == the batch aggregation over the whole feed, which is the
DuckDB oracle — so the entire stream→merge→commit path is value-checked
by the driver through ``acid_digest``.
"""

from __future__ import annotations

import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.acid import AcidTable
from ..sources.registry import normalize_event_ts
from .daily import events_stream_schema

N_BUCKETS = 8

_STATE_COLS = [
    "user_id",
    "bucket",
    "n_events",
    "value_cents",
    "last_ts_us",
    "last_event_id",
    "last_event_type",
]


def _batch_delta(batch_df: DataFrame) -> DataFrame:
    """One state delta per user in this micro-batch."""
    return batch_df.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        # coalesce: a batch whose values are all NULL must contribute 0,
        # not NULL — `old + NULL` would wipe the accumulated sum and make
        # the result depend on how the feed was batched (the oracle
        # matches with COALESCE(sum(..), 0))
        F.coalesce(
            F.sum(F.expr("cast(round(value * 100) as bigint)")), F.lit(0)
        ).alias("value_cents"),
        F.max(
            F.struct(
                F.expr("unix_micros(ts)").alias("last_ts_us"),
                F.col("event_id").alias("last_event_id"),
                F.col("event_type").alias("last_event_type"),
            )
        ).alias("last"),
    )


def streaming_events_upsert_to_acid(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    max_files_per_trigger: int | None = None,
    glob: str | None = None,
) -> AcidTable:
    """Run the events feed to completion (availableNow), folding each
    micro-batch into the per-user state table at ``table_path``."""
    table = AcidTable(table_path)

    reader = spark.readStream.schema(
        events_stream_schema(spark, source_dir, glob=glob)
    )
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = normalize_event_ts(reader.parquet(source_dir))

    def commit_batch(batch_df, batch_id: int) -> None:
        if table.exists():
            last = table.manifest().get("meta", {}).get("stream_batch_id", -1)
            if batch_id <= last:
                return  # replayed batch after restart — already folded
        if batch_df.isEmpty():
            return
        delta = _batch_delta(batch_df)
        meta = {"stream_batch_id": batch_id}
        if not table.exists():
            state = delta.select(
                "user_id",
                (F.col("user_id") % N_BUCKETS).alias("bucket"),
                "n_events",
                "value_cents",
                "last.*",
            )
            table.overwrite(state, partition_by=["bucket"], meta=meta)
            return
        cur = table.read(spark)
        new_last = F.struct(
            F.col("last.last_ts_us").alias("last_ts_us"),
            F.col("last.last_event_id").alias("last_event_id"),
            F.col("last.last_event_type").alias("last_event_type"),
        )
        old_last = F.struct("last_ts_us", "last_event_id", "last_event_type")
        combined = (
            delta.join(cur, "user_id", "left")
            .withColumn(
                "picked",
                # no old state (left-miss) or the batch saw a later
                # (ts, event_id) → the delta's last event wins
                F.when(
                    cur["n_events"].isNull() | (new_last > old_last), new_last
                ).otherwise(old_last),
            )
            .select(
                "user_id",
                (F.col("user_id") % N_BUCKETS).alias("bucket"),
                (F.coalesce(cur["n_events"], F.lit(0)) + delta["n_events"]).alias(
                    "n_events"
                ),
                (
                    F.coalesce(cur["value_cents"], F.lit(0))
                    + delta["value_cents"]
                ).alias("value_cents"),
                "picked.*",
            )
        )
        # merge_rows runs several actions over `updates` (duplicate-key
        # check, affected-partition probe, staged write); without this,
        # each would recompute the batch-agg + full-state join. The
        # combined relation is |users in batch| rows — tiny.
        combined = combined.localCheckpoint(eager=True)
        table.merge_rows(spark, combined, "user_id", meta=meta)

    q = (
        stream.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", table_path + "/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return table


# ------------------------------------------- registered query adapter

# previous invocation's dirs — removed on the next call so the returned
# DataFrame stays readable until collected (merge_fold.py's pattern)
_last_dirs: list[str] = []


def streaming_upsert_state(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Registered adapter (acid_digest): split the sf dir's events feed
    into 3 range-partitioned files so availableNow folds THREE
    micro-batches — first the overwrite path, then two real MERGE
    commits against touched buckets — and return the final state table.
    The combine is batch-order-independent, so the file→batch mapping
    (mtime/path order) cannot affect the result."""
    import os

    from ..sources import load_table

    while _last_dirs:
        shutil.rmtree(_last_dirs.pop(), ignore_errors=True)
    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    run = tempfile.gettempdir() + f"/spark_graft_upsert_{uuid.uuid4().hex}"
    _last_dirs.append(run)
    feed, tbl = run + "/feed", run + "/table"
    load_table(spark, "events", sf_dir).repartitionByRange(
        3, "user_id"
    ).write.parquet(feed)
    table = streaming_events_upsert_to_acid(
        spark, feed, tbl, max_files_per_trigger=1, glob="part-*.parquet"
    )
    return table.read(spark).select(*_STATE_COLS)


ORACLES: dict[str, str] = {
    "streaming_upsert_state": f"""
WITH ev AS (
    SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
           CAST(round(value * 100) AS BIGINT) AS cents
    FROM events
),
last AS (
    SELECT user_id, ts_us, event_id, event_type,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY ts_us DESC, event_id DESC) AS rn
    FROM ev
),
agg AS (
    SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
           CAST(COALESCE(sum(cents), 0) AS BIGINT) AS value_cents
    FROM ev GROUP BY user_id
)
SELECT a.user_id, a.user_id % {N_BUCKETS} AS bucket, a.n_events,
       a.value_cents, l.ts_us AS last_ts_us, l.event_id AS last_event_id,
       l.event_type AS last_event_type
FROM agg a JOIN last l ON a.user_id = l.user_id AND l.rn = 1
""",
}
