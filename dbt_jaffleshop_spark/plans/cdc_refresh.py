"""Incrementally-maintained aggregate views over the CDC feed (r11b) —
the consumer side of :meth:`plans.acid.AcidTable.changes`.

A classic warehouse shape: a downstream table holds ``GROUP BY key``
aggregates (count + sum; avg is derivable) over a large upstream fact
table, and must track it as commits land. Recomputing the view is
O(upstream); this module maintains it from the upstream's change feed
instead:

* ``insert`` events contribute +1 / +value, ``delete`` events -1 /
  -value — a pure per-key DELTA aggregation over ONLY the rows the
  commits in range touched;
* keys whose delta nets to zero (e.g. a full-rewrite commit that
  re-inserted every row unchanged) are dropped BEFORE bucket selection,
  so a rewrite-without-change refresh touches zero view partitions;
* the view is hash-bucketed on the key, and the refresh commits via
  ``overwrite_partitions`` over ONLY the buckets holding a non-zero
  delta key — refresh I/O is O(changed keys), never O(view);
* the consumed upstream version rides in the view's manifest meta
  (``upstream_version``) — the resume point that makes refreshes
  exactly-once: a replayed refresh sees an empty range and no-ops, and
  a CONCURRENT refresh loses the commit race via a validate hook that
  rechecks the stored resume point inside the commit.

At 100 TB this is materialized-view maintenance with lakehouse commit
semantics: a day's upstream appends cost one delta aggregation over the
day's files plus a rewrite of the view buckets that day's keys hash
into. Compaction/z-order upstream cost nothing (``data_change=False``
commits emit no events), and an upstream vacuum past the resume point
fails the refresh loudly (``changes`` raises) instead of silently
skipping rows — the operator then rebuilds with :func:`build_agg_view`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .acid import AcidTable

_BUCKET = "kb"


def _with_bucket(df: DataFrame, key: str, n_buckets: int) -> DataFrame:
    return df.withColumn(
        _BUCKET, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int")
    )


def _agg(df: DataFrame, key: str, val: str) -> DataFrame:
    # the value is cast to bigint PER ROW (not post-sum): delta folding
    # adds independently-aggregated batches, and only integer algebra
    # makes (full recompute) ≡ (base + deltas) exact — a post-sum cast
    # would truncate each batch differently
    return df.groupBy(key).agg(
        F.count("*").cast("bigint").alias("cnt"),
        F.sum(F.col(val).cast("bigint")).alias("total"),
    )


def _meta(key: str, val: str, n_buckets: int, upstream_version: int) -> dict:
    return {
        "agg_key": key,
        "agg_val": val,
        "n_buckets": int(n_buckets),
        "upstream_version": int(upstream_version),
    }


def build_agg_view(
    spark: SparkSession,
    upstream: AcidTable,
    view: AcidTable,
    key: str,
    val: str,
    n_buckets: int = 16,
) -> int:
    """Full initial compute of the view from the upstream's CURRENT
    snapshot; the consumed version is recorded as the refresh resume
    point. Also the rebuild path after an upstream vacuum outruns a
    consumer."""
    v_up = upstream.current_version()
    # PINNED read: an upstream commit landing between the version
    # resolution and an unpinned read would be baked into the view yet
    # sit above the recorded resume point — the next refresh would fold
    # it AGAIN (silent double-count). Pinning makes resume exact.
    full = _with_bucket(
        _agg(upstream.read(spark, version=v_up), key, val), key, n_buckets
    )
    return view.overwrite(
        full,
        partition_by=[_BUCKET],
        meta=_meta(key, val, n_buckets, v_up),
    )


def refresh_agg_view(
    spark: SparkSession, upstream: AcidTable, view: AcidTable
) -> int:
    """Fold every upstream commit since the stored resume point into the
    view — delta-sized compute, affected-bucket-sized I/O. Returns the
    committed view version (the current one when there is nothing to
    fold)."""
    m = view.manifest()
    cfg = m.get("meta", {})
    key, val = cfg["agg_key"], cfg["agg_val"]
    n_buckets = int(cfg["n_buckets"])
    v_last = int(cfg["upstream_version"])
    v_now = upstream.current_version()
    if v_now == v_last:
        return m["version"]

    ch = upstream.changes(spark, v_last, v_now)
    sign = F.when(F.col("_change_type") == "insert", F.lit(1)).otherwise(
        F.lit(-1)
    )
    delta = (
        ch.select(
            F.col(key),
            sign.cast("bigint").alias("s"),
            (sign.cast("bigint") * F.col(val).cast("bigint")).alias("sv"),
        )
        .groupBy(key)
        .agg(
            F.sum("s").alias("d_cnt"),
            F.sum("sv").alias("d_sum"),
        )
        # net-zero keys (rewritten-unchanged rows) touch no bucket
        .where((F.col("d_cnt") != 0) | (F.col("d_sum") != 0))
    )
    delta = _with_bucket(delta, key, n_buckets).localCheckpoint()
    buckets = sorted(
        r[0] for r in delta.select(_BUCKET).distinct().collect()
    )
    if not buckets:
        # content-preserving range (e.g. a rewrite that changed nothing):
        # advance the resume point with a zero-partition commit
        return view.overwrite_partitions(
            view.read(spark).limit(0),
            _BUCKET,
            [],
            meta=_meta(key, val, n_buckets, v_now),
            validate=_resume_guard(view.path, v_last),
        )

    cur = view.read(spark).where(F.col(_BUCKET).isin(buckets))
    # checkpointed: both the divergence probe below and the staged write
    # consume this join — without it the dominant refresh cost (read
    # affected buckets + full-outer merge) runs twice
    merged = (
        cur.select(key, "cnt", "total")
        .join(delta.select(key, "d_cnt", "d_sum"), key, "full_outer")
        .select(
            F.col(key),
            (F.coalesce("cnt", F.lit(0)) + F.coalesce("d_cnt", F.lit(0)))
            .cast("bigint")
            .alias("cnt"),
            (F.coalesce("total", F.lit(0)) + F.coalesce("d_sum", F.lit(0)))
            .cast("bigint")
            .alias("total"),
        )
    ).localCheckpoint()
    neg = merged.where(F.col("cnt") < 0).limit(1).collect()
    if neg:
        raise ValueError(
            f"{view.path}: refresh drove key {neg[0][0]!r} to negative "
            "count — the view has diverged from the upstream (skipped "
            "range or double-fold); rebuild with build_agg_view"
        )
    final = _with_bucket(merged.where(F.col("cnt") > 0), key, n_buckets)
    return view.overwrite_partitions(
        final,
        _BUCKET,
        buckets,
        meta=_meta(key, val, n_buckets, v_now),
        validate=_resume_guard(view.path, v_last),
    )


def _resume_guard(path: str, v_last: int):
    """Commit-time idempotence: the stored resume point must still be the
    one this refresh read, or a concurrent refresh already folded the
    range and committing ours would double-apply every delta."""

    def _check(cur_manifest: dict) -> None:
        stored = int(
            cur_manifest.get("meta", {}).get("upstream_version", -1)
        )
        if stored != v_last:
            raise ValueError(
                f"{path}: concurrent refresh advanced the resume point "
                f"to upstream v{stored} (this refresh read v{v_last}) — "
                "re-run refresh_agg_view against the new state"
            )

    return _check
