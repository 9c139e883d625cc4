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
the DuckDB oracle from events_sessionize applies verbatim. A multi-batch
run would emit partial sessions, so streaming_sessionize now FAILS LOUDLY
if the run processed more than one data batch instead of silently
diverging from the oracle. A production deployment would hold the tail
and emit on event-time timeout; that path needs a live trigger and is
documented rather than simulated.
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
    sessionizes one user's events within a micro-batch. Fully vectorized:
    numpy gap-flag + reduceat segment aggregates (int64 — no float
    accumulation), pandas nunique for distinct event types; no per-event
    Python loop."""

    def sessionize(key, pdf_iter, state):
        import numpy as np
        import pandas as pd

        (user_id,) = key
        events = pd.concat(list(pdf_iter)).sort_values(["ts_us", "event_id"])
        base_idx = 0
        if state.exists:
            base_idx, _last = state.get

        ts = events["ts_us"].to_numpy(np.int64)
        cents = events["value_cents"].to_numpy(np.int64)
        k = 0
        if len(ts):
            new_sess = np.ones(len(ts), dtype=bool)
            new_sess[1:] = (ts[1:] - ts[:-1]) > gap_us
            starts_idx = np.flatnonzero(new_sess)
            ends_idx = np.append(starts_idx[1:], len(ts)) - 1
            k = len(starts_idx)
            n_events = np.diff(np.append(starts_idx, len(ts)))
            cents_sum = np.add.reduceat(cents, starts_idx)
            seg = np.cumsum(new_sess)
            n_types = (
                events["event_type"].groupby(seg).nunique().to_numpy(np.int64)
            )
            out = pd.DataFrame(
                {
                    "user_id": np.full(k, int(user_id), dtype=np.int64),
                    "session_idx": base_idx + 1 + np.arange(k, dtype=np.int64),
                    "n_events": n_events,
                    "start_us": ts[starts_idx],
                    "end_us": ts[ends_idx],
                    "duration_us": ts[ends_idx] - ts[starts_idx],
                    "session_value_cents": cents_sum,
                    "n_event_types": n_types,
                }
            )
        else:
            out = pd.DataFrame(
                {f.name: pd.Series(dtype="int64") for f in OUTPUT_SCHEMA}
            )

        state.update((base_idx + k, int(ts[-1]) if len(ts) else 0))
        yield out

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
    # Correctness guard: the per-batch tail-session emission is only
    # equivalent to the batch oracle when the whole run was ONE micro-batch
    # (one parquet file, no maxFilesPerTrigger split). A multi-batch run
    # would emit partial sessions — fail loudly instead of diverging.
    import json as _json

    data_batches = 0
    for p in q.recentProgress:
        prog = _json.loads(p.json) if hasattr(p, "json") else p
        if int(prog.get("numInputRows", 0)) > 0:
            data_batches += 1
    if data_batches > 1:
        raise RuntimeError(
            f"streaming_sessionize ran {data_batches} micro-batches; "
            "tail-session emission is single-batch-only (see module "
            "docstring) — do not split the source into multiple triggers"
        )
    return spark.table(name)


# single-batch availableNow ⇒ identical to the batch operator's oracle
from ..llm.events import ORACLES as _EV_ORACLES  # noqa: E402

ORACLES: dict[str, str] = {
    "streaming_sessionize": _EV_ORACLES["events_sessionize"],
}
