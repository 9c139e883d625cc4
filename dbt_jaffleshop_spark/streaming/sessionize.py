"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState`` (beyond-reference; SURVEY §2.11 headroom).

The batch equivalent lives in llm/events.py::events_sessionize (window
algebra). This version is the streaming shape: events arrive per user,
per-user state carries the open session's tail across micro-batches, and
closed sessions are emitted in append mode. Grouping shuffles once on
user_id — the same partitioning contract as the batch operator, which is
what makes it hold on a real cluster.

Batch-boundary note: the tail (still-open) session is emitted at the end
of every batch AND carried in state, so with a single availableNow batch
(one parquet file — our case) the output is exactly the batch result and
the DuckDB oracle from events_sessionize applies verbatim. A production
deployment would instead hold the tail and emit on event-time timeout;
that path needs a live trigger and is documented rather than simulated.
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

from ..llm.events import SESSION_GAP_US
from .daily import _EVENTS_SCHEMA

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_idx", LongType()),
        StructField("n_events", LongType()),
        StructField("start_us", LongType()),
        StructField("end_us", LongType()),
        StructField("duration_us", LongType()),
        StructField("session_value_cents", LongType()),
        StructField("n_event_types", LongType()),
    ]
)

# carried across micro-batches: the open session's running aggregates
STATE_SCHEMA = StructType(
    [
        StructField("session_idx", LongType()),
        StructField("last_ts_us", LongType()),
    ]
)


def _make_sessionizer(gap_us: int):
    """Closure (pickled by value — executors lack this package) that
    sessionizes one user's events within a micro-batch."""

    def sessionize(key, pdf_iter, state):
        import pandas as pd

        (user_id,) = key
        events = pd.concat(list(pdf_iter)).sort_values(["ts_us", "event_id"])
        base_idx = 0
        if state.exists:
            base_idx, _last = state.get

        sessions = []
        cur = None
        for ts, cents, etype in zip(
            events["ts_us"], events["value_cents"], events["event_type"]
        ):
            if cur is None or ts - cur["end"] > gap_us:
                if cur is not None:
                    sessions.append(cur)
                cur = {
                    "start": ts, "end": ts, "n": 0,
                    "cents": 0, "types": set(),
                }
            cur["end"] = ts
            cur["n"] += 1
            cur["cents"] += int(cents)
            cur["types"].add(etype)
        if cur is not None:
            sessions.append(cur)

        state.update((base_idx + len(sessions), sessions[-1]["end"] if sessions else 0))
        yield pd.DataFrame(
            {
                "user_id": [int(user_id)] * len(sessions),
                "session_idx": [base_idx + i + 1 for i in range(len(sessions))],
                "n_events": [s["n"] for s in sessions],
                "start_us": [s["start"] for s in sessions],
                "end_us": [s["end"] for s in sessions],
                "duration_us": [s["end"] - s["start"] for s in sessions],
                "session_value_cents": [s["cents"] for s in sessions],
                "n_event_types": [len(s["types"]) for s in sessions],
            }
        )

    return sessionize


def streaming_sessionize(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    from pyspark.sql.streaming.state import GroupStateTimeout

    sf_dir = sf_dir or os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    stream = (
        spark.readStream.schema(_EVENTS_SCHEMA)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.expr("(ts div 1000)").alias("ts_us"),
            F.expr("cast(round(value * 100) as bigint)").alias("value_cents"),
        )
    )
    sessions = stream.groupBy("user_id").applyInPandasWithState(
        _make_sessionizer(SESSION_GAP_US),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    name = f"stream_sessions_{uuid.uuid4().hex[:8]}"
    q = (
        sessions.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(name)


# single-batch availableNow ⇒ identical to the batch operator's oracle
from ..llm.events import ORACLES as _EV_ORACLES  # noqa: E402

ORACLES: dict[str, str] = {
    "streaming_sessionize": _EV_ORACLES["events_sessionize"],
}
