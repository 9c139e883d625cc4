"""Streaming → ACID sink (streaming/sink.py): multi-batch atomic appends,
prefix-consistent snapshots, restart idempotence."""

from __future__ import annotations

import shutil

from dbt_jaffleshop_spark.plans.acid import AcidTable
from dbt_jaffleshop_spark.streaming.sink import streaming_events_to_acid


def _feed(sf_dir, tmp_path, copies: int = 3):
    src = tmp_path / "feed"
    src.mkdir()
    for i in range(copies):
        shutil.copy(f"{sf_dir}/events.parquet", src / f"part-{i}.parquet")
    return str(src)


def test_multibatch_commits_and_final_content(spark, sf_dir, tmp_path):
    """Disjoint source files, 1 file per trigger → one snapshot per
    non-empty batch; the final table equals the batch distinct-event_id
    relation. (Replayed files dedup to EMPTY batches and commit nothing —
    covered by the restart test.)"""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet")
    src = tmp_path / "feed"
    src.mkdir()
    half = t.num_rows // 2
    pq.write_table(t.slice(0, half), src / "part-0.parquet")
    pq.write_table(t.slice(half), src / "part-1.parquet")
    src = str(src)
    table = streaming_events_to_acid(
        spark, src, str(tmp_path / "tbl"), max_files_per_trigger=1
    )
    assert table.exists()
    versions = table.current_version()
    assert versions >= 2, "expected multiple micro-batch commits"

    n_distinct = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id").distinct().count()
    )
    out = table.read(spark)
    assert out.count() == n_distinct
    assert out.select("event_id").distinct().count() == n_distinct

    # prefix consistency: every snapshot's row count is non-decreasing
    counts = [
        spark.read.parquet(
            *[f"{table.data_dir}/{f}" for f in table.manifest(v)["files"]]
        ).count() if table.manifest(v)["files"] else 0
        for v in range(1, versions + 1)
    ]
    assert counts == sorted(counts)
    assert counts[-1] == n_distinct


def test_restart_does_not_double_commit(spark, sf_dir, tmp_path):
    """Re-running the sink over the same source + checkpoint (a restart)
    commits nothing new: unprocessed data is empty and any replayed batch
    id is ≤ the last committed one."""
    src = _feed(sf_dir, tmp_path, copies=1)
    path = str(tmp_path / "tbl")
    table = streaming_events_to_acid(spark, src, path)
    v = table.current_version()
    n = table.read(spark).count()

    table2 = streaming_events_to_acid(spark, src, path)  # restart
    assert table2.current_version() == v
    assert table2.read(spark).count() == n


def test_compaction_bounds_files_preserves_content(spark, sf_dir, tmp_path):
    """After N micro-batch appends, compact() commits an equivalent
    snapshot with a bounded file count; vacuum then reclaims the small
    files without touching the live snapshot."""
    import glob
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/events.parquet")
    src = tmp_path / "feed"
    src.mkdir()
    third = t.num_rows // 3
    for i in range(3):
        s = t.slice(i * third, third if i < 2 else None)
        pq.write_table(s, src / f"part-{i}.parquet")
    table = streaming_events_to_acid(
        spark, str(src), str(tmp_path / "tbl"), max_files_per_trigger=1
    )
    before_files = len(table.manifest()["files"])
    before = table.read(spark)
    before_rows = before.count()

    v = table.compact(spark)
    assert v == table.current_version()
    after_files = len(table.manifest()["files"])
    assert after_files < before_files
    assert table.read(spark).count() == before_rows

    removed = table.vacuum(keep_last=1)
    assert removed, "small files reclaimed"
    assert table.read(spark).count() == before_rows
    on_disk = glob.glob(f"{table.data_dir}/**/*.parquet", recursive=True)
    assert len(on_disk) == after_files


def test_append_is_atomic_under_reader(spark, sf_dir, tmp_path):
    """A reader that resolved the pointer before an append still reads its
    full snapshot afterwards (old files untouched by the commit)."""
    from dbt_jaffleshop_spark.sources.registry import normalize_event_ts

    src = _feed(sf_dir, tmp_path, copies=1)
    table = streaming_events_to_acid(spark, src, str(tmp_path / "tbl"))
    v1 = table.current_version()
    reader_files = table.manifest(v1)["files"]

    # normalize like the sink does — the r4 schema guard (correctly)
    # rejects appending raw timestamp_ntz rows to the normalized table
    batch = normalize_event_ts(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).limit(10)
    table.append(batch, meta={"stream_batch_id": 999})
    assert table.current_version() == v1 + 1
    # the old snapshot's files are all still readable
    old = spark.read.parquet(
        *[f"{table.data_dir}/{f}" for f in reader_files]
    )
    assert old.count() > 0
