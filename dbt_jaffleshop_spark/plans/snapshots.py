"""SCD Type-2 snapshots — the dbt `snapshots/` capability (check strategy).

The reference project carries an (empty) snapshot directory
(`dbt_project.yml:13-17`, `snapshots/.gitkeep`); snapshots are a core
dbt engine capability: track how a mutable source table changes over
time by maintaining a slowly-changing-dimension type-2 history
(public dbt docs, "Add snapshots to your DAG"). Each run compares the
current source state to the stored history and

* inserts a first version for new keys (``dbt_valid_from`` = run time,
  ``dbt_valid_to`` = NULL → the "open" row),
* closes the open version of a changed key (``dbt_valid_to`` = run
  time) and opens a new one carrying the new values,
* leaves unchanged keys and already-closed history untouched,
* leaves hard-deleted keys open (dbt's default
  ``invalidate_hard_deletes: false``).

Strategy here is dbt's ``check`` strategy: a row "changed" iff any of
the declared ``check_cols`` differs (null-safe), matching dbt's
column-compare semantics. ``dbt_scd_id`` is the standard surrogate
``md5(key || '|' || valid_from)``.

Scale shape (100 TB): one apply = one full-outer join keyed on
``unique_key`` between the source and ONLY the open slice of the
history — closed history is carried by reference (a union, no
recompute), exactly the partition-carry pattern the ACID layer uses
for incremental commits. The join is AQE-skew-splittable; with the
history stored as an AcidTable partitioned on ``dbt_valid_to IS
NULL``, a run rewrites only the open partition plus an append of newly
closed rows.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DBT_COLS = ("dbt_valid_from", "dbt_valid_to", "dbt_scd_id")


def _changed_expr(check_cols: list[str]) -> F.Column:
    """Null-safe any-column-differs between the o (open) and s (source)
    sides of the join."""
    return reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"o.{c}").eqNullSafe(F.col(f"s.{c}"))
            for c in check_cols
        ],
    )


def _with_scd_id(df: DataFrame, unique_key: str) -> DataFrame:
    return df.withColumn(
        "dbt_scd_id",
        F.md5(
            F.concat_ws(
                "|",
                F.col(unique_key).cast("string"),
                F.date_format("dbt_valid_from", "yyyy-MM-dd HH:mm:ss"),
            )
        ),
    )


def snapshot_apply(
    source: DataFrame,
    prior: DataFrame | None,
    unique_key: str,
    check_cols: list[str] | None,
    run_ts: str,
) -> DataFrame:
    """One snapshot run: fold the current ``source`` state into the
    ``prior`` SCD2 history (None on the first run). ``run_ts`` is the
    run's logical timestamp ('YYYY-MM-DD HH:MM:SS'); dbt uses wall-clock
    now(), passed explicitly here so runs are replayable/deterministic
    (the frozen-as-of discipline from functions/dates.py).

    ``check_cols=None`` means dbt's ``check_cols: all`` default: every
    non-key source column participates in the change compare."""
    if check_cols is None:
        check_cols = [c for c in source.columns if c != unique_key]
    if not check_cols:
        raise ValueError(
            "snapshot_apply: check_cols must name at least one column "
            "(or pass None for dbt's 'all columns' default)"
        )
    ts = F.to_timestamp(F.lit(run_ts))
    payload = [c for c in source.columns]
    if prior is None:
        first = source.withColumn("dbt_valid_from", ts).withColumn(
            "dbt_valid_to", F.lit(None).cast("timestamp")
        )
        return _with_scd_id(first, unique_key)

    open_rows = prior.where(F.col("dbt_valid_to").isNull()).drop("dbt_scd_id")
    closed_rows = prior.where(F.col("dbt_valid_to").isNotNull())

    j = open_rows.alias("o").join(
        source.alias("s"),
        F.col(f"o.{unique_key}") == F.col(f"s.{unique_key}"),
        "full_outer",
    )
    changed = _changed_expr(check_cols)
    src_present = F.col(f"s.{unique_key}").isNotNull()
    open_present = F.col(f"o.{unique_key}").isNotNull()

    # prior open rows: keep their payload; close iff the source still has
    # the key AND a checked column changed. Hard-deleted keys stay open.
    kept = j.where(open_present).select(
        *[F.col(f"o.{c}").alias(c) for c in payload],
        F.col("o.dbt_valid_from").alias("dbt_valid_from"),
        F.when(src_present & changed, ts)
        .otherwise(F.lit(None).cast("timestamp"))
        .alias("dbt_valid_to"),
    )
    # new versions: source rows whose key is new or whose checked columns
    # changed vs the open version
    opened = j.where(src_present & (~open_present | changed)).select(
        *[F.col(f"s.{c}").alias(c) for c in payload],
        ts.alias("dbt_valid_from"),
        F.lit(None).cast("timestamp").alias("dbt_valid_to"),
    )
    return closed_rows.unionByName(
        _with_scd_id(kept.unionByName(opened), unique_key)
    )


# --------------------------------------- ACID-maintained snapshot runs

SNAP_OPEN_COL = "dbt_is_open"  # partition column: 'y' = open, 'n' = closed


def run_snapshot(
    spark,
    path: str,
    source: DataFrame,
    unique_key: str,
    check_cols: list[str],
    run_ts: str,
) -> dict:
    """One dbt-snapshot run against an AcidTable-backed history — the
    materialization half of the snapshot capability (dbt runs its
    snapshot SQL as warehouse MERGEs; this is the engine-side
    equivalent with Iceberg-style commit semantics).

    The history is partitioned on ``dbt_is_open``: each run atomically
    rewrites the open partition (bounded by live entities) and appends
    ONLY the newly-closed versions to the history partition, whose
    existing files are carried by reference
    (:meth:`AcidTable.replace_partitions_and_append`) — commit cost
    O(open + changed), never O(history), and a reader mid-run sees the
    old snapshot or the new one, never a mix.

    Replay idempotence follows the streaming sink's discipline: the
    committed manifest records ``snapshot_run_ts``; a re-run whose
    logical timestamp is ≤ the recorded one is a no-op (crash-restart
    replays and at-least-once schedulers cannot double-close versions).
    The guard is enforced INSIDE the commit's retry loop via the
    ``validate`` hook — a check only at entry would be check-then-act:
    two concurrent executions of the same run could both pass it, and
    the race loser's retry-merge would then append its (identical)
    newly-closed rows on top of the winner's, double-closing every
    changed key.
    """
    from pyspark.sql import functions as F

    from .acid import AcidTable

    t = AcidTable(path)
    open_flag = F.when(F.col("dbt_valid_to").isNull(), "y").otherwise("n")
    if not t.exists():
        first = snapshot_apply(
            source, None, unique_key, check_cols, run_ts
        ).withColumn(SNAP_OPEN_COL, open_flag)
        v = t.overwrite(
            first,
            partition_by=[SNAP_OPEN_COL],
            meta={"snapshot_run_ts": run_ts, "snapshot_key": unique_key},
        )
        return {"status": "created", "version": v}

    def _check_newer(manifest: dict) -> None:
        last = manifest.get("meta", {}).get("snapshot_run_ts")
        if last is not None and run_ts <= last:
            raise ValueError(
                f"snapshot replay: run_ts {run_ts} <= committed {last}"
            )

    try:
        _check_newer(t.manifest())
    except ValueError as e:
        return {
            "status": "skipped",
            "version": t.current_version(),
            "reason": str(e),
        }

    prior = t.read(spark).drop(SNAP_OPEN_COL)
    # the fold is staged twice below (open rewrite + closed append);
    # cache it so the full-outer join against the prior history runs
    # once, keeping the commit at its documented O(open + changed) cost
    new = (
        snapshot_apply(source, prior, unique_key, check_cols, run_ts)
        .withColumn(SNAP_OPEN_COL, open_flag)
        .cache()
    )
    ts = F.to_timestamp(F.lit(run_ts))
    try:
        v = t.replace_partitions_and_append(
            new.where(F.col(SNAP_OPEN_COL) == "y"),
            SNAP_OPEN_COL,
            ["y"],
            # closed rows are immutable once written: only this run's newly
            # closed versions are appended to the history partition
            new.where(
                (F.col(SNAP_OPEN_COL) == "n") & (F.col("dbt_valid_to") == ts)
            ),
            meta={"snapshot_run_ts": run_ts, "snapshot_key": unique_key},
            validate=_check_newer,
        )
    except ValueError as e:
        if "snapshot replay" in str(e):
            # a concurrent execution of this (or a newer) run won the
            # commit race — its history already contains these closes
            return {
                "status": "skipped",
                "version": t.current_version(),
                "reason": str(e),
            }
        raise
    finally:
        new.unpersist()
    return {"status": "committed", "version": v}


# ------------------------------------------- registered demo snapshot

# Deterministic two-run snapshot over the raw `orders` table: run 1 sees
# the orders up to CUTOFF; run 2 sees all orders, with the status of
# early orders whose key ≡ 0 (mod 7) flipped to 'R' — a synthetic source
# mutation (order returned) that exercises every SCD2 transition:
# unchanged carry-through, close+reopen on change, and insert of new keys.
SNAP_CUTOFF = "1998-01-01 00:00:00"
SNAP_T1 = "2024-01-01 00:00:00"
SNAP_T2 = "2024-02-01 00:00:00"
SNAP_KEY = "o_orderkey"
SNAP_CHECK_COLS = ["o_orderstatus"]
_PAYLOAD = "o_orderkey, o_custkey, o_orderstatus, o_totalprice"


def jaffle_orders_snapshot(spark, sf_dir: str | None = None) -> DataFrame:
    """The registered query: final SCD2 state after the two runs."""
    from ..sources import load_table

    orders = load_table(spark, "orders", sf_dir)
    early = F.col("o_orderdate") <= F.to_timestamp(F.lit(SNAP_CUTOFF))
    state1 = orders.where(early).select(*_PAYLOAD.split(", "))
    state2 = orders.select(
        "o_orderkey",
        "o_custkey",
        F.when(early & (F.col("o_orderkey") % 7 == 0), F.lit("R"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    )
    snap1 = snapshot_apply(state1, None, SNAP_KEY, SNAP_CHECK_COLS, SNAP_T1)
    return snapshot_apply(state2, snap1, SNAP_KEY, SNAP_CHECK_COLS, SNAP_T2)


def _snapshot_oracle() -> str:
    """Independent DuckDB derivation of the same final state: version-1
    rows (possibly closed at T2) plus version-2 rows (new or changed)."""
    scd = (
        "md5(CAST(o_orderkey AS VARCHAR) || '|'"
        " || strftime(dbt_valid_from, '%Y-%m-%d %H:%M:%S'))"
    )
    return f"""
WITH s1 AS (
    SELECT {_PAYLOAD}
    FROM orders WHERE o_orderdate <= TIMESTAMP '{SNAP_CUTOFF}'
),
s2 AS (
    SELECT o_orderkey, o_custkey,
           CASE WHEN o_orderkey % 7 = 0
                     AND o_orderdate <= TIMESTAMP '{SNAP_CUTOFF}'
                THEN 'R' ELSE o_orderstatus END AS o_orderstatus,
           o_totalprice
    FROM orders
),
v1 AS (
    SELECT s1.o_orderkey, s1.o_custkey, s1.o_orderstatus, s1.o_totalprice,
           TIMESTAMP '{SNAP_T1}' AS dbt_valid_from,
           CASE WHEN s2.o_orderkey IS NOT NULL
                     AND s2.o_orderstatus IS DISTINCT FROM s1.o_orderstatus
                THEN TIMESTAMP '{SNAP_T2}' END AS dbt_valid_to
    FROM s1 LEFT JOIN s2 ON s1.o_orderkey = s2.o_orderkey
),
v2 AS (
    SELECT s2.o_orderkey, s2.o_custkey, s2.o_orderstatus, s2.o_totalprice,
           TIMESTAMP '{SNAP_T2}' AS dbt_valid_from,
           CAST(NULL AS TIMESTAMP) AS dbt_valid_to
    FROM s2 LEFT JOIN s1 ON s2.o_orderkey = s1.o_orderkey
    WHERE s1.o_orderkey IS NULL
       OR s2.o_orderstatus IS DISTINCT FROM s1.o_orderstatus
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       dbt_valid_from, dbt_valid_to, {scd} AS dbt_scd_id
FROM (SELECT * FROM v1 UNION ALL SELECT * FROM v2)
"""


ORACLES: dict[str, str] = {
    "jaffle_orders_snapshot": _snapshot_oracle(),
}
