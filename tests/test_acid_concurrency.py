"""AcidTable optimistic concurrency (plans/acid.py): interleaved writers
retry-merge instead of losing updates, compaction preserves logical commit
metadata (streaming exactly-once), aborted commits are repairable, and the
partitioned-compaction file-count knob is honored."""

from __future__ import annotations

import json
import os

import pytest

from dbt_jaffleshop_spark.plans.acid import AcidTable, CommitConflictError


def _df(spark, lo: int, hi: int):
    return spark.range(lo, hi).selectExpr("id", "id % 3 as p")


def test_interleaved_appends_no_lost_update(spark, tmp_path):
    """Two writers append against the same parent snapshot: the loser's
    commit conflicts, re-merges against the winner's manifest, and
    retries — BOTH appends' rows are in the final table."""
    path = str(tmp_path / "tbl")
    table = AcidTable(path)
    table.overwrite(_df(spark, 0, 10))  # v1

    other = AcidTable(path)
    orig_commit = table._commit
    raced = {"done": False}

    def racing_commit(files, partition_by, meta=None, expected_parent=None):
        if not raced["done"]:
            raced["done"] = True
            # a second writer lands first, against the same parent v1
            other.append(_df(spark, 100, 120))
        return orig_commit(files, partition_by, meta, expected_parent)

    table._commit = racing_commit  # type: ignore[method-assign]
    table.append(_df(spark, 10, 25))

    assert raced["done"]
    assert table.current_version() == 3  # v1 + racer + retried append
    out = table.read(spark)
    assert out.count() == 10 + 20 + 15  # nothing lost
    assert out.selectExpr("count(distinct id) n").first().n == 45


def test_true_concurrent_appends_two_threads(spark, tmp_path):
    """A REAL race (not a forced interleaving): two threads each append 5
    batches concurrently through their own AcidTable handles. Whatever
    the interleaving, retry-merge + backoff must land all 10 commits —
    every row present, one version bump per append, no lost update."""
    import threading

    path = str(tmp_path / "tbl")
    AcidTable(path).overwrite(_df(spark, 0, 10))  # v1
    errors: list[str] = []

    def writer(lo: int) -> None:
        handle = AcidTable(path)
        try:
            for k in range(5):
                handle.append(_df(spark, lo + k * 10, lo + k * 10 + 10))
        except Exception as exc:  # noqa: BLE001
            errors.append(repr(exc))

    threads = [
        threading.Thread(target=writer, args=(1000,)),
        threading.Thread(target=writer, args=(2000,)),
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()

    assert not errors, errors
    table = AcidTable(path)
    assert table.current_version() == 11  # v1 + 10 appends
    out = table.read(spark)
    assert out.count() == 10 + 100
    assert out.selectExpr("count(distinct id) n").first().n == 110


def test_append_partition_by_mismatch_raises(spark, tmp_path):
    table = AcidTable(str(tmp_path / "tbl"))
    table.overwrite(_df(spark, 0, 10), partition_by=["p"])
    with pytest.raises(ValueError, match="partition_by"):
        table.append(_df(spark, 10, 20), partition_by=["id"])
    # matching or None partition_by still appends
    table.append(_df(spark, 10, 20), partition_by=["p"])
    table.append(_df(spark, 20, 30))
    assert table.read(spark).count() == 30


def test_append_retry_stats_track_winner_not_first_attempt(spark, tmp_path):
    """A lost-race append retry must rebuild its stats carry-forward
    against the WINNER's manifest (r7 advisor fix: recompute used to
    mutate the captured meta dict, so the FIRST attempt's merge — keyed
    to the pre-race manifest's files — won over the retry's fresh live
    set and stale entries for dropped files got committed)."""
    path = str(tmp_path / "tbl")
    table = AcidTable(path)
    table.overwrite(_df(spark, 0, 10))  # v1
    f1 = table.manifest()["files"]
    # plant per-file stats keyed to v1's (live) files, layout.py's shape
    table.append(
        _df(spark, 10, 15), meta={"stats": {f: {"id": [0, 9]} for f in f1}}
    )  # v2: stats present and keyed to still-live files

    other = AcidTable(path)
    orig_commit = table._commit
    raced = {"done": False}

    def racing_commit(files, partition_by, meta=None, expected_parent=None):
        if not raced["done"]:
            raced["done"] = True
            # the racer OVERWRITES: v1/v2's files (and their stats) die
            other.overwrite(_df(spark, 100, 120))
        return orig_commit(files, partition_by, meta, expected_parent)

    table._commit = racing_commit  # type: ignore[method-assign]
    table.append(_df(spark, 20, 25))  # loses the race once, retries

    assert raced["done"]
    final = table.manifest()
    # the winner's table has no stats; the retried append adds none —
    # NO stale v2-era entries (keyed to dead files) may survive
    assert final.get("meta", {}).get("stats", {}) == {}
    assert table.read(spark).count() == 20 + 5


def test_append_schema_drift_raises(spark, tmp_path):
    """Appending a frame with drifted columns must fail loudly: parquet
    would accept the write, but a later snapshot read silently resolves
    to one schema (no mergeSchema), dropping columns without error."""
    table = AcidTable(str(tmp_path / "tbl"))
    table.append(_df(spark, 0, 10))
    with pytest.raises(ValueError, match="schema"):
        table.append(spark.range(10, 20).selectExpr("id", "id * 2 as extra"))
    with pytest.raises(ValueError, match="schema"):
        table.append(
            spark.range(10, 20).selectExpr("id", "cast(id % 3 as string) as p")
        )
    table.append(_df(spark, 10, 20))  # matching schema still appends
    assert table.read(spark).count() == 20
    # compaction preserves the recorded schema for later appends
    table.compact(spark)
    assert table.manifest()["meta"]["schema"] == {"id": "bigint", "p": "bigint"}


def test_compact_conflict_raises_and_append_survives(spark, tmp_path):
    """An append landing while compact() is staging must NOT be dropped:
    compact's commit conflicts and raises; the append's snapshot stays
    live and a re-run compact succeeds against it."""
    path = str(tmp_path / "tbl")
    table = AcidTable(path)
    table.append(_df(spark, 0, 10))
    table.append(_df(spark, 10, 20))

    other = AcidTable(path)
    orig_commit = table._commit
    raced = {"done": False}

    def racing_commit(files, partition_by, meta=None, expected_parent=None):
        if not raced["done"]:
            raced["done"] = True
            other.append(_df(spark, 100, 105))
        return orig_commit(files, partition_by, meta, expected_parent)

    table._commit = racing_commit  # type: ignore[method-assign]
    with pytest.raises(CommitConflictError):
        table.compact(spark)
    assert table.read(spark).count() == 25  # the racing append survived

    table._commit = orig_commit  # type: ignore[method-assign]
    table.compact(spark)
    assert table.read(spark).count() == 25


def test_compact_carries_forward_stream_batch_meta(spark, tmp_path):
    """Compaction rewrites layout, not logical state: the streaming sink's
    stream_batch_id high-water mark must survive, or a replayed micro-batch
    after crash→compact→restart would re-append (advisor finding)."""
    table = AcidTable(str(tmp_path / "tbl"))
    table.append(_df(spark, 0, 10), meta={"stream_batch_id": 0})
    table.append(_df(spark, 10, 20), meta={"stream_batch_id": 1})
    table.compact(spark)

    meta = table.manifest().get("meta", {})
    assert meta.get("stream_batch_id") == 1
    assert meta.get("compacted") is True

    # the sink's replay check against the compacted manifest still skips
    last = table.manifest().get("meta", {}).get("stream_batch_id", -1)
    assert 1 <= last  # batch_id 0 and 1 would both be skipped on restart


def test_vacuum_reclaims_aborted_manifest_and_unblocks_slot(spark, tmp_path):
    """A writer that crashed between claiming the manifest slot and the
    pointer swap leaves an orphan manifest; commits then conflict until
    vacuum reclaims it (the documented repair path)."""
    table = AcidTable(str(tmp_path / "tbl"))
    table.overwrite(_df(spark, 0, 10))  # v1

    orphan = os.path.join(table.versions_dir, "v000002.json")
    with open(orphan, "w") as f:
        json.dump(
            {"version": 2, "partition_by": [], "files": [], "meta": {}}, f
        )

    with pytest.raises(CommitConflictError):
        table.append(_df(spark, 10, 20))

    # default vacuum must NOT reclaim a FRESH orphan — it cannot tell a
    # crashed writer's manifest from an in-flight writer's just-claimed
    # slot, so reclamation waits out the grace period
    table.vacuum(keep_last=1)
    assert os.path.exists(orphan)

    # explicit repair with writers quiesced: grace 0
    table.vacuum(keep_last=1, orphan_grace_s=0)
    assert not os.path.exists(orphan)
    table.append(_df(spark, 10, 20))
    assert table.current_version() == 2
    assert table.read(spark).count() == 20


def test_history_lists_committed_snapshots_only(spark, tmp_path):
    """history() is the commit log oldest→newest — and excludes aborted
    above-pointer manifests plus vacuumed-away versions."""
    table = AcidTable(str(tmp_path / "tbl"))
    assert table.history() == []
    table.append(_df(spark, 0, 10), meta={"stream_batch_id": 0})
    table.append(_df(spark, 10, 20), meta={"stream_batch_id": 1})
    table.compact(spark)

    h = table.history()
    assert [e["version"] for e in h] == [1, 2, 3]
    assert h[0]["meta"]["stream_batch_id"] == 0
    assert h[2]["meta"]["compacted"] is True
    assert h[2]["meta"]["stream_batch_id"] == 1  # carried forward
    assert h[2]["n_files"] <= h[1]["n_files"]

    # an aborted (above-pointer) manifest never shows up
    with open(os.path.join(table.versions_dir, "v000009.json"), "w") as f:
        json.dump({"version": 9, "partition_by": [], "files": [], "meta": {}}, f)
    assert [e["version"] for e in table.history()] == [1, 2, 3]

    table.vacuum(keep_last=1)
    assert [e["version"] for e in table.history()] == [3]


def test_vacuum_repairs_never_committed_table(spark, tmp_path):
    """A writer that crashed during the FIRST-ever commit leaves an
    orphan manifest and no _CURRENT pointer; vacuum must repair that
    state (not crash on the missing pointer) so the creation can be
    retried."""
    table = AcidTable(str(tmp_path / "tbl"))
    os.makedirs(table.versions_dir)
    orphan = os.path.join(table.versions_dir, "v000001.json")
    with open(orphan, "w") as f:
        json.dump(
            {"version": 1, "partition_by": [], "files": [], "meta": {}}, f
        )
    with pytest.raises(CommitConflictError):
        table.overwrite(_df(spark, 0, 10))

    # a genuinely CRASHED writer never runs its discard path — simulate
    # its leftover data file directly (the failed overwrite above cleans
    # its own files up, so without this the data-file reclamation branch
    # would go untested)
    crash_file = os.path.join(table.data_dir, "part-crashed-000.parquet")
    os.makedirs(table.data_dir, exist_ok=True)
    with open(crash_file, "wb") as f:
        f.write(b"PAR1crash")

    # no crash on the missing pointer; the crashed writer's invisible
    # data file and the orphan manifest are both reclaimed under explicit
    # repair (grace 0; the default grace would leave fresh orphans for a
    # possible in-flight writer)
    removed = table.vacuum(keep_last=1, orphan_grace_s=0)
    assert removed == ["part-crashed-000.parquet"]
    assert not os.path.exists(crash_file)
    assert not os.path.exists(orphan)
    table.overwrite(_df(spark, 0, 10))
    assert table.current_version() == 1
    assert table.read(spark).count() == 10


def test_compact_files_per_partition_knob(spark, tmp_path):
    """target_files_per_partition > 1 must hold for PARTITIONED tables too
    (advisor finding: the repartition(*cols) staging path always yielded
    one file per partition, making the knob a no-op)."""
    table = AcidTable(str(tmp_path / "tbl"))
    # 3 partitions × ~100 rows, appended twice → ≥2 files per partition
    table.append(_df(spark, 0, 300), partition_by=["p"])
    table.append(_df(spark, 300, 600))

    table.compact(spark, target_files_per_partition=2)
    files = table.manifest()["files"]
    per_part: dict[str, int] = {}
    for f in files:
        part = f.split(os.sep)[0]
        per_part[part] = per_part.get(part, 0) + 1
    assert set(per_part) == {"p=0", "p=1", "p=2"}
    # maxRecordsPerFile = ceil(200/2) = 100 → exactly 2 files for each
    # 200-row partition, deterministically
    assert all(n == 2 for n in per_part.values()), per_part
    assert table.read(spark).count() == 600


def test_replace_and_append_survives_concurrent_append(spark, tmp_path):
    """The snapshot-maintenance commit (replace partition 'y' + append
    into 'n') races a concurrent append to partition 'n': the loser
    re-merges against the winner's manifest and retries — the winner's
    rows survive, the replaced partition holds exactly the new content,
    and closed-partition files are carried by reference."""
    from pyspark.sql import functions as F

    def _pdf(spark, lo, hi, flag):
        return spark.range(lo, hi).select(
            "id", F.lit(flag).alias("p")
        )

    path = str(tmp_path / "tbl")
    table = AcidTable(path)
    table.overwrite(
        _pdf(spark, 0, 10, "y").unionAll(_pdf(spark, 100, 110, "n")),
        partition_by=["p"],
    )  # v1: 10 open + 10 closed

    other = AcidTable(path)
    orig_commit = table._commit
    raced = {"done": False}

    def racing_commit(files, partition_by, meta=None, expected_parent=None):
        if not raced["done"]:
            raced["done"] = True
            other.append(_pdf(spark, 200, 205, "n"))  # concurrent append
        return orig_commit(files, partition_by, meta, expected_parent)

    table._commit = racing_commit  # type: ignore[method-assign]
    closed_before = {
        f for f in table.manifest()["files"] if "p=n" in f.split(os.sep)
    }
    table.replace_partitions_and_append(
        _pdf(spark, 20, 28, "y"),   # new open set (replaces 0..9)
        "p",
        ["y"],
        _pdf(spark, 300, 303, "n"),  # newly closed versions
    )

    assert raced["done"]
    out = table.read(spark)
    open_ids = {r.id for r in out.where("p = 'y'").collect()}
    closed_ids = {r.id for r in out.where("p = 'n'").collect()}
    assert open_ids == set(range(20, 28))          # fully replaced
    assert closed_ids == (
        set(range(100, 110)) | set(range(200, 205)) | set(range(300, 303))
    )  # original + racer + newly closed all survive
    closed_after = {
        f for f in table.manifest()["files"] if "p=n" in f.split(os.sep)
    }
    assert closed_before <= closed_after  # history carried by reference


def test_merge_rows_partitioned_upsert(spark, tmp_path):
    """MERGE semantics on a partitioned table: matched keys replaced
    (including a key MOVING partitions), unmatched inserted, untouched
    partitions' files carried byte-for-byte by reference; duplicate-key
    updates raise."""
    from pyspark.sql import functions as F

    def _rows(spark, data):
        return spark.createDataFrame(
            data, "id bigint, p string, v bigint"
        )

    path = str(tmp_path / "tbl")
    table = AcidTable(path)
    table.overwrite(
        _rows(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "c", 40)]),
        partition_by=["p"],
    )
    untouched_before = {
        f for f in table.manifest()["files"] if "p=c" in f.split(os.sep)
    }

    # update key 2 in place, MOVE key 3 from p=b to p=a, insert key 5
    table.merge_rows(
        spark,
        _rows(spark, [(2, "a", 21), (3, "a", 31), (5, "b", 50)]),
        "id",
    )
    got = sorted(
        map(tuple, table.read(spark).select("id", "p", "v").collect())
    )
    assert got == [
        (1, "a", 10), (2, "a", 21), (3, "a", 31), (4, "c", 40), (5, "b", 50),
    ]
    untouched_after = {
        f for f in table.manifest()["files"] if "p=c" in f.split(os.sep)
    }
    assert untouched_before == untouched_after  # carried by reference

    with pytest.raises(ValueError, match="duplicate"):
        table.merge_rows(
            spark, _rows(spark, [(7, "a", 1), (7, "a", 2)]), "id"
        )


def test_merge_rows_detects_concurrent_append(spark, tmp_path):
    """A concurrent append landing between merge_rows' snapshot read and
    its commit must NOT be silently dropped (the staged merge was
    computed without those rows — a retry-merge would exclude them from
    the affected partitions): the merge aborts with ConcurrentWriteError
    (Delta's ConcurrentAppendException analogue), the racer's rows
    survive, the staged files are discarded, and a re-run of the same
    merge against the new snapshot succeeds."""
    import glob

    from dbt_jaffleshop_spark.plans.acid import ConcurrentWriteError

    def _rows(spark, data):
        return spark.createDataFrame(data, "id bigint, p string, v bigint")

    path = str(tmp_path / "tbl")
    table = AcidTable(path)
    table.overwrite(
        _rows(spark, [(1, "a", 10), (2, "a", 20), (3, "b", 30)]),
        partition_by=["p"],
    )

    other = AcidTable(path)
    orig_stage = table._stage
    raced = {"done": False}

    def racing_stage(df, partition_by):
        if not raced["done"]:
            raced["done"] = True
            # racer appends INTO an affected partition (p='a') after the
            # merge has read its snapshot but before it commits
            other.append(_rows(spark, [(9, "a", 90)]))
        return orig_stage(df, partition_by)

    table._stage = racing_stage  # type: ignore[method-assign]
    with pytest.raises(ConcurrentWriteError, match="re-run the merge"):
        table.merge_rows(spark, _rows(spark, [(2, "a", 21)]), "id")
    table._stage = orig_stage  # type: ignore[method-assign]

    # nothing lost, merge fully aborted
    got = sorted(map(tuple, table.read(spark).select("id", "p", "v").collect()))
    assert got == [(1, "a", 10), (2, "a", 20), (3, "b", 30), (9, "a", 90)]
    # staged files discarded: every parquet on disk is manifest-referenced
    on_disk = {
        os.path.relpath(f, table.data_dir)
        for f in glob.glob(f"{table.data_dir}/**/*.parquet", recursive=True)
    }
    assert on_disk == set(table.manifest()["files"])

    # the re-run merges against the new snapshot, racer's row intact
    table.merge_rows(spark, _rows(spark, [(2, "a", 21)]), "id")
    got = sorted(map(tuple, table.read(spark).select("id", "p", "v").collect()))
    assert got == [(1, "a", 10), (2, "a", 21), (3, "b", 30), (9, "a", 90)]


def test_merge_rows_unpartitioned_detects_concurrent_append(spark, tmp_path):
    """Same guard on the unpartitioned (full-rewrite) path, where a
    retry would REPLACE the racer's commit wholesale."""
    from dbt_jaffleshop_spark.plans.acid import ConcurrentWriteError

    def _rows(spark, data):
        return spark.createDataFrame(data, "id bigint, v bigint")

    path = str(tmp_path / "tbl")
    table = AcidTable(path)
    table.overwrite(_rows(spark, [(1, 10), (2, 20)]))

    other = AcidTable(path)
    orig_stage = table._stage
    raced = {"done": False}

    def racing_stage(df, partition_by):
        if not raced["done"]:
            raced["done"] = True
            other.append(_rows(spark, [(9, 90)]))
        return orig_stage(df, partition_by)

    table._stage = racing_stage  # type: ignore[method-assign]
    with pytest.raises(ConcurrentWriteError, match="re-run the merge"):
        table.merge_rows(spark, _rows(spark, [(2, 21)]), "id")
    table._stage = orig_stage  # type: ignore[method-assign]
    got = sorted(map(tuple, table.read(spark).select("id", "v").collect()))
    assert got == [(1, 10), (2, 20), (9, 90)]


def test_version_as_of_parses_timestamps_not_strings(spark, tmp_path):
    """Time travel must compare INSTANTS, not raw ISO strings: a 'Z'
    suffix, a naive (offset-less) timestamp, and a truncated sub-second
    precision all denote times a lexicographic compare mis-orders
    against the stored '...+00:00' commit_ts."""
    import datetime as dt
    import time

    path = str(tmp_path / "tbl")
    table = AcidTable(path)
    table.overwrite(_df(spark, 0, 10))          # v1
    time.sleep(0.01)
    table.append(_df(spark, 100, 105))          # v2

    ts1 = table.manifest(1)["commit_ts"]
    parsed = dt.datetime.fromisoformat(ts1)
    # exact same instant, three spellings — all must resolve v1
    z_form = parsed.strftime("%Y-%m-%dT%H:%M:%S.%f") + "Z"
    naive = parsed.replace(tzinfo=None).isoformat()
    assert table.version_as_of(ts1) == 1
    assert table.version_as_of(z_form) == 1
    assert table.version_as_of(naive) == 1
    # lexicographically, naive < ts1 ('...' sorts before '...+00:00') —
    # the old string compare resolved NOTHING here
    assert naive < ts1

    # seconds-truncated timestamp BEFORE v1's sub-second commit time:
    # genuinely earlier instant → no snapshot
    floor_sec = parsed.replace(microsecond=0)
    if floor_sec < parsed:
        with pytest.raises(ValueError, match="no snapshot"):
            table.version_as_of(floor_sec.isoformat())


def test_read_as_of_timestamp_time_travel(spark, tmp_path):
    """FOR TIMESTAMP AS OF: a timestamp between two commits resolves to
    the earlier snapshot; before the first commit raises; vacuumed-away
    aborted manifests above the pointer never resolve."""
    import datetime as dt

    path = str(tmp_path / "tbl")
    table = AcidTable(path)

    before = dt.datetime.now(dt.timezone.utc).isoformat()
    table.overwrite(_df(spark, 0, 10))          # v1
    mid = dt.datetime.now(dt.timezone.utc).isoformat()
    table.append(_df(spark, 100, 105))          # v2

    assert table.version_as_of(mid) == 1
    assert table.read_as_of(spark, mid).count() == 10
    now = dt.datetime.now(dt.timezone.utc).isoformat()
    assert table.version_as_of(now) == 2
    assert table.read_as_of(spark, now).count() == 15
    with pytest.raises(ValueError, match="no snapshot"):
        table.version_as_of(before)


def test_overwrite_validate_and_parent_from_one_manifest_read(spark, tmp_path):
    """r6 advisor fix (TOCTOU): overwrite's validate hook and its commit
    expected_parent must come from the SAME manifest read. A concurrent
    commit landing right after the hook runs must trip the
    expected_parent check and RE-RUN validate against the racer's
    manifest — a hook enforcing read-snapshot freshness (merge_rows's
    pattern) then aborts instead of silently replacing the racer."""
    path = str(tmp_path / "tbl")
    table = AcidTable(path)
    table.overwrite(_df(spark, 0, 10))  # v1
    read_version = table.current_version()

    other = AcidTable(path)
    raced = {"done": False}
    seen_versions: list[int] = []

    def validate(manifest):
        seen_versions.append(manifest["version"])
        if manifest["version"] != read_version:
            raise ValueError("concurrent commit since read")
        if not raced["done"]:
            raced["done"] = True
            # lands v2 BETWEEN the validate read and the commit
            other.append(_df(spark, 100, 110))

    with pytest.raises(ValueError, match="concurrent commit"):
        table.overwrite(_df(spark, 10, 20), validate=validate)

    # first attempt validated v1, the retry re-validated the racer's v2
    assert seen_versions == [1, 2]
    # the racer's rows survive; the aborted overwrite left nothing
    assert table.current_version() == 2
    assert table.read(spark).count() == 20
    # the aborted writer's staged files were discarded (no disk leak)
    live = {
        os.path.join(table.data_dir, f)
        for f in table.manifest()["files"]
    }
    on_disk = {
        os.path.join(dp, f)
        for dp, _dns, fns in os.walk(table.data_dir)
        for f in fns
    }
    assert on_disk == live


def test_read_empty_snapshot_without_schema_raises(spark, tmp_path):
    """r6 advisor fix: an empty snapshot whose manifest lost meta.schema
    is corruption — read() must raise naming the table, never fabricate
    a placeholder schema."""
    path = str(tmp_path / "tbl")
    table = AcidTable(path)
    table.overwrite(spark.range(0, 5).limit(0))  # legal empty snapshot
    mpath = os.path.join(table.versions_dir, "v000001.json")

    # force the TRUE zero-file form (Spark may emit a 0-row part file)
    m = json.load(open(mpath))
    m["files"] = []
    json.dump(m, open(mpath, "w"))
    # with the recorded schema, the empty read works and keeps the type
    out = table.read(spark)
    assert out.count() == 0 and out.schema["id"].dataType.simpleString() == "bigint"

    # corrupt the manifest: drop meta.schema
    m["meta"].pop("schema")
    json.dump(m, open(mpath, "w"))
    with pytest.raises(ValueError, match="no .*meta.schema"):
        table.read(spark)


def test_restore_rolls_back_as_new_commit(spark, tmp_path):
    """Delta RESTORE semantics: restoring re-references the old
    snapshot's files in a NEW commit — content rolls back, history is
    preserved (the bad version stays time-travelable), no data copies,
    and a second restore undoes the first."""
    table = AcidTable(str(tmp_path / "tbl"))
    table.overwrite(_df(spark, 0, 10))                 # v1
    table.append(_df(spark, 10, 25))                   # v2
    table.overwrite(_df(spark, 100, 103))              # v3 ("the bad one")

    v4 = table.restore(1)
    assert v4 == 4
    assert sorted(r.id for r in table.read(spark).collect()) == list(range(10))
    # history intact: the overwritten state is still reachable
    assert sorted(
        r.id for r in table.read(spark, version=3).collect()
    ) == [100, 101, 102]
    assert table.manifest()["meta"]["restored_from"] == 1
    # no data copy: the restored manifest references v1's exact files
    assert table.manifest()["files"] == table.manifest(1)["files"]
    # restore of the restore: back to v3's content
    table.restore(3)
    assert sorted(
        r.id for r in table.read(spark).collect()
    ) == [100, 101, 102]


def test_restore_refuses_vacuumed_version(spark, tmp_path):
    """A restore target whose files were reclaimed must fail loudly —
    a partial restore would be silent data loss."""
    table = AcidTable(str(tmp_path / "tbl"))
    table.overwrite(_df(spark, 0, 10))           # v1
    table.overwrite(_df(spark, 50, 60))          # v2 (disjoint files)
    table.overwrite(_df(spark, 80, 90))          # v3
    table.vacuum(keep_last=1, orphan_grace_s=0)  # v1/v2 files reclaimed
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        table.restore(1)


def test_restore_keeps_stream_replay_guard(spark, tmp_path):
    """Restoring data must not re-open the streaming exactly-once
    window: the stream_batch_id high-water mark carries forward from
    the CURRENT manifest, so a checkpoint replay after the rollback
    still skips batches committed before the restore point."""
    table = AcidTable(str(tmp_path / "tbl"))
    table.append(_df(spark, 0, 10), meta={"stream_batch_id": 0})   # v1
    table.append(_df(spark, 10, 20), meta={"stream_batch_id": 1})  # v2
    table.restore(1)
    meta = table.manifest()["meta"]
    assert meta["stream_batch_id"] == 1  # NOT v1's 0
    assert meta["restored_from"] == 1


def test_append_from_excludes_concurrent_and_crashed_rows(spark, tmp_path):
    """append_from pins its base: rows committed AFTER the base version
    (a concurrent writer, or a crashed attempt's partial append) are
    NOT merged into the result — unlike append, whose retry-merge
    deliberately includes them. The excluded version stays readable via
    time travel, and vacuum reclaims it once expired."""
    path = str(tmp_path / "tbl_af")
    table = AcidTable(path)
    table.overwrite(_df(spark, 0, 10))  # v1 = the pinned base
    table.append(_df(spark, 100, 105))  # v2: a concurrent/crashed writer

    v3 = table.append_from(_df(spark, 200, 203), base_version=1)
    assert v3 == 3
    ids = sorted(r.id for r in table.read(spark).collect())
    assert ids == list(range(0, 10)) + [200, 201, 202]  # no 100..104
    # the skipped version is still consistent via time travel
    assert sorted(r.id for r in table.read(spark, version=2).collect()) == (
        list(range(0, 10)) + list(range(100, 105))
    )
    # manifest records the provenance
    assert table.manifest(3)["meta"]["append_from"] == 1


def test_append_from_schema_drift_raises(spark, tmp_path):
    """The base snapshot's recorded schema guards append_from, same as
    append's drift check."""
    path = str(tmp_path / "tbl_af_schema")
    table = AcidTable(path)
    table.overwrite(_df(spark, 0, 5))
    with pytest.raises(ValueError, match="does not match"):
        table.append_from(
            spark.range(0, 3).selectExpr("id", "id as other_col"),
            base_version=1,
        )


def test_append_from_survives_slot_conflict(spark, tmp_path):
    """A concurrent commit claiming append_from's slot mid-commit makes
    it retry onto the next slot — files still base + staged only."""
    path = str(tmp_path / "tbl_af_race")
    table = AcidTable(path)
    table.overwrite(_df(spark, 0, 4))  # v1

    other = AcidTable(path)
    orig_commit = table._commit
    raced = {"done": False}

    def racing_commit(files, partition_by, meta=None, expected_parent=None):
        if not raced["done"]:
            raced["done"] = True
            other.append(_df(spark, 50, 52))  # steals the slot
        return orig_commit(
            files, partition_by, meta=meta, expected_parent=expected_parent
        )

    table._commit = racing_commit
    try:
        v = table.append_from(_df(spark, 200, 202), base_version=1)
    finally:
        table._commit = orig_commit
    # the racer's rows are NOT merged (pinned base), but its version
    # exists; append_from landed on the next free slot
    assert v == 3
    assert sorted(r.id for r in table.read(spark, version=v).collect()) == (
        list(range(0, 4)) + [200, 201]
    )
