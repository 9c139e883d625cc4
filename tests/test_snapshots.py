"""SCD2 snapshots (plans/snapshots.py): unit transitions + oracle parity."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row

from dbt_jaffleshop_spark.plans.snapshots import (
    jaffle_orders_snapshot,
    ORACLES,
    snapshot_apply,
)
from tests.conftest import assert_parity


def _state(spark, rows):
    return spark.createDataFrame(
        [Row(id=i, status=s, payload=p) for i, s, p in rows],
        "id bigint, status string, payload bigint",
    )


def test_snapshot_transitions_cover_all_cases(spark):
    """One table exercising every SCD2 transition across three runs:
    insert, unchanged carry, change (close+reopen), hard delete (stays
    open), re-change of an already-versioned key, and a changed payload
    column NOT in check_cols (no new version — dbt check semantics)."""
    t1, t2, t3 = (
        "2024-01-01 00:00:00",
        "2024-02-01 00:00:00",
        "2024-03-01 00:00:00",
    )
    s1 = _state(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 30)])
    #        key 1 unchanged; key 2 changed; key 3 hard-deleted; key 4 new;
    #        key 5's payload-only change must NOT version
    s2 = _state(spark, [(1, "a", 10), (2, "b", 20), (4, "a", 40)])
    s3 = _state(spark, [(1, "a", 99), (2, "c", 20), (4, "a", 40)])

    snap = snapshot_apply(s1, None, "id", ["status"], t1)
    snap = snapshot_apply(s2, snap, "id", ["status"], t2)
    snap = snapshot_apply(s3, snap, "id", ["status"], t3)
    rows = sorted(
        (
            (r.id, r.status, r.dbt_valid_from, r.dbt_valid_to)
            for r in snap.collect()
        ),
    )

    def ts(s):
        return dt.datetime.fromisoformat(s)

    assert rows == [
        # key 1: never changed on the check col (payload change at t3
        # does not version under check strategy) — one open row
        (1, "a", ts(t1), None),
        # key 2: a → b at t2, b → c at t3
        (2, "a", ts(t1), ts(t2)),
        (2, "b", ts(t2), ts(t3)),
        (2, "c", ts(t3), None),
        # key 3: hard-deleted at t2 — stays open (dbt default)
        (3, "a", ts(t1), None),
        # key 4: inserted at t2
        (4, "a", ts(t2), None),
    ]
    # scd ids are unique per (key, valid_from) version
    ids = [r.dbt_scd_id for r in snap.collect()]
    assert len(ids) == len(set(ids)) == 6


def test_snapshot_is_idempotent_on_unchanged_source(spark):
    s1 = _state(spark, [(1, "a", 10), (2, "b", 20)])
    snap1 = snapshot_apply(s1, None, "id", ["status"], "2024-01-01 00:00:00")
    snap2 = snapshot_apply(s1, snap1, "id", ["status"], "2024-02-01 00:00:00")
    a = sorted(map(tuple, snap1.collect()))
    b = sorted(map(tuple, snap2.collect()))
    assert a == b  # re-applying the same state changes nothing


def test_orders_snapshot_matches_oracle(spark, oracle, sf_dir):
    assert_parity(
        jaffle_orders_snapshot(spark, sf_dir),
        oracle,
        ORACLES["jaffle_orders_snapshot"],
    )


def test_run_snapshot_acid_maintenance(spark, tmp_path):
    """Three runs against an AcidTable history: the stored state equals
    the pure snapshot_apply fold, each run is exactly one atomic
    version, closed history files are carried by reference (never
    rewritten), and a replayed run is a no-op."""
    from dbt_jaffleshop_spark.plans.acid import AcidTable
    from dbt_jaffleshop_spark.plans.snapshots import SNAP_OPEN_COL, run_snapshot

    path = str(tmp_path / "snap")
    t1, t2, t3 = (
        "2024-01-01 00:00:00",
        "2024-02-01 00:00:00",
        "2024-03-01 00:00:00",
    )
    s1 = _state(spark, [(1, "a", 10), (2, "a", 20), (3, "a", 30)])
    s2 = _state(spark, [(1, "a", 10), (2, "b", 20), (4, "a", 40)])
    s3 = _state(spark, [(1, "a", 99), (2, "c", 20), (4, "a", 40)])

    r1 = run_snapshot(spark, path, s1, "id", ["status"], t1)
    r2 = run_snapshot(spark, path, s2, "id", ["status"], t2)
    assert (r1["status"], r2["status"]) == ("created", "committed")
    t = AcidTable(path)

    # closed-history files of v2 are carried by reference into v3
    closed_files_v2 = {
        f for f in t.manifest()["files"] if f"{SNAP_OPEN_COL}=n" in f
    }
    r3 = run_snapshot(spark, path, s3, "id", ["status"], t3)
    assert r3["status"] == "committed"
    files_v3 = set(t.manifest()["files"])
    assert closed_files_v2 <= files_v3

    # stored state == the pure fold
    expect = snapshot_apply(s1, None, "id", ["status"], t1)
    expect = snapshot_apply(s2, expect, "id", ["status"], t2)
    expect = snapshot_apply(s3, expect, "id", ["status"], t3)
    got = sorted(
        map(tuple, t.read(spark).drop(SNAP_OPEN_COL).collect())
    )
    assert got == sorted(map(tuple, expect.collect()))

    # exactly three committed versions; replay of t3 is a no-op
    assert t.current_version() == 3
    replay = run_snapshot(spark, path, s3, "id", ["status"], t3)
    assert replay["status"] == "skipped"
    assert t.current_version() == 3
    # older-than-committed replays skip too
    assert run_snapshot(spark, path, s2, "id", ["status"], t2)["status"] == "skipped"


def test_run_snapshot_concurrent_same_run_no_double_close(spark, tmp_path):
    """Two concurrent executions of the SAME logical run (at-least-once
    scheduler double-fire): both pass the entry guard, but the commit
    race loser must SKIP via the in-retry validate hook — not retry-merge
    its identical newly-closed rows on top of the winner's (double-close)."""
    from dbt_jaffleshop_spark.plans.acid import AcidTable
    from dbt_jaffleshop_spark.plans.snapshots import SNAP_OPEN_COL, run_snapshot

    path = str(tmp_path / "snap")
    t1, t2 = "2024-01-01 00:00:00", "2024-02-01 00:00:00"
    s1 = _state(spark, [(1, "a", 10), (2, "a", 20)])
    s2 = _state(spark, [(1, "a", 10), (2, "b", 20)])
    assert run_snapshot(spark, path, s1, "id", ["status"], t1)["status"] == "created"

    # make the second execution land first, mid-commit of the first
    table_cls = AcidTable
    orig_commit = table_cls._commit
    raced = {"done": False}

    def racing_commit(self, files, partition_by, meta=None, expected_parent=None):
        if not raced["done"] and meta.get("snapshot_run_ts") == t2:
            raced["done"] = True
            table_cls._commit = orig_commit  # the inner run commits cleanly
            inner = run_snapshot(spark, path, s2, "id", ["status"], t2)
            assert inner["status"] == "committed"
            table_cls._commit = racing_commit
        return orig_commit(self, files, partition_by, meta, expected_parent)

    table_cls._commit = racing_commit
    try:
        outer = run_snapshot(spark, path, s2, "id", ["status"], t2)
    finally:
        table_cls._commit = orig_commit

    assert raced["done"]
    assert outer["status"] == "skipped"
    t = AcidTable(path)
    rows = t.read(spark).drop(SNAP_OPEN_COL).collect()
    closes = [r for r in rows if r.id == 2 and r.dbt_valid_to is not None]
    assert len(closes) == 1, rows  # exactly ONE closed version of key 2
    assert len(rows) == 3  # (1 open) + (2 closed) + (2 reopened)


def test_snapshot_check_cols_all_and_empty(spark):
    """check_cols=None = dbt's 'all columns' default (payload change DOES
    version); an explicit empty list is a loud error."""
    import pytest as _pytest

    from dbt_jaffleshop_spark.plans.snapshots import snapshot_apply

    t1, t2 = "2024-01-01 00:00:00", "2024-02-01 00:00:00"
    s1 = _state(spark, [(1, "a", 10)])
    s2 = _state(spark, [(1, "a", 11)])  # payload-only change
    snap = snapshot_apply(s1, None, "id", None, t1)
    snap = snapshot_apply(s2, snap, "id", None, t2)
    assert snap.count() == 2  # versioned under check_cols: all

    with _pytest.raises(ValueError, match="check_cols"):
        snapshot_apply(s1, None, "id", [], t1)


def test_snapshot_open_slice_reads_prune_partitions(spark, tmp_path):
    """The dbt_is_open partitioning is load-bearing at read time too: a
    current-state query (open rows only) must prune the closed-history
    files at the scan — PartitionFilters, not a post-scan filter."""
    from dbt_jaffleshop_spark.plans.acid import AcidTable
    from dbt_jaffleshop_spark.plans.snapshots import SNAP_OPEN_COL, run_snapshot

    path = str(tmp_path / "snap")
    s1 = _state(spark, [(1, "a", 10), (2, "a", 20)])
    s2 = _state(spark, [(1, "b", 10), (2, "b", 20)])
    run_snapshot(spark, path, s1, "id", ["status"], "2024-01-01 00:00:00")
    run_snapshot(spark, path, s2, "id", ["status"], "2024-02-01 00:00:00")

    t = AcidTable(path)
    df = t.read(spark).where(f"{SNAP_OPEN_COL} = 'y'")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert f"{SNAP_OPEN_COL}#" in plan.split("PartitionFilters")[1].split("]")[0]
    assert df.count() == 2  # exactly the open rows
