"""Z-order layout + file-skipping tests (plans/layout.py).

The digest slot verifies the pruned scan's CONTENT equals the plain
filtered scan; these tests pin the parts content-equality cannot see:
the Morton interleave itself, that per-file stats land in the manifest,
that files really are skipped, and that a concurrent commit aborts the
layout rewrite instead of being silently dropped.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dbt_jaffleshop_spark.plans import layout
from dbt_jaffleshop_spark.plans.acid import AcidTable, ConcurrentWriteError


def _py_morton(vals: list[int], bits: int) -> int:
    out = 0
    n = len(vals)
    for i in range(bits):
        for j, v in enumerate(vals):
            out |= ((v >> i) & 1) << (i * n + j)
    return out


def test_zorder_value_matches_python_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (5, 9), (1023, 511), (700, 700)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn(
            "z", layout.zorder_value([F.col("a"), F.col("b")], bits=10)
        ).collect()
    }
    for a, b in rows:
        assert got[(a, b)] == _py_morton([a, b], 10), (a, b)


def test_zorder_value_rejects_overflow():
    with pytest.raises(ValueError, match="exceeds"):
        layout.zorder_value([F.lit(1), F.lit(1), F.lit(1)], bits=22)


def _build_table(spark, tmp_path, sf_dir) -> AcidTable:
    from dbt_jaffleshop_spark.sources import load_table

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    t = AcidTable(os.path.join(str(tmp_path), "orders_z"))
    t.overwrite(orders.repartition(8))
    return t


def test_optimize_skips_all_null_columns(spark, tmp_path, sf_dir):
    """All-NULL z-order columns carry no clustering signal (r7 advisor
    fix): a real table with an all-NULL SECOND column must still be
    rewritten clustered by the remaining column (not crash on None
    bounds), an all-NULL FIRST column must not mask a live second one,
    and a table where EVERY requested column is all-NULL (or the table
    is empty) is a maintenance no-op."""
    from dbt_jaffleshop_spark.sources import load_table

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey",
        "o_custkey",
        F.lit(None).cast("long").alias("all_null"),
    )
    for cols in (["o_custkey", "all_null"], ["all_null", "o_custkey"]):
        t = AcidTable(os.path.join(str(tmp_path), "_".join(cols)))
        t.overwrite(orders.repartition(8))
        v = layout.optimize_zorder(t, spark, cols, target_files=4)
        assert v == 2  # a real rewrite committed
        lay = t.manifest()["meta"]["layout"]
        assert lay["zorder"] == ["o_custkey"]  # the effective clustering
        assert lay["requested"] == cols
        assert t.read(spark).count() == orders.count()
        # the surviving column still skips files
        hit = layout.prune_files(t.manifest(), "o_custkey", 1, 1)
        assert len(hit) < len(t.manifest()["files"])

    t2 = AcidTable(os.path.join(str(tmp_path), "nosignal"))
    t2.overwrite(orders.select("o_orderkey", "all_null").limit(10))
    assert layout.optimize_zorder(t2, spark, ["all_null"]) == 1  # no-op
    t3 = AcidTable(os.path.join(str(tmp_path), "empty"))
    t3.overwrite(orders.limit(0))
    assert layout.optimize_zorder(t3, spark, ["o_custkey"]) == 1  # no-op


def test_optimize_records_stats_and_skips_files(spark, tmp_path, sf_dir):
    t = _build_table(spark, tmp_path, sf_dir)
    v = layout.optimize_zorder(
        t, spark, ["o_custkey", "o_orderdate"], target_files=8
    )
    m = t.manifest(v)
    assert m["meta"]["layout"] == {
        "zorder": ["o_custkey", "o_orderdate"],
        "bits": 31,
    }
    # every rewritten file carries stats for both clustering columns
    for f in m["files"]:
        st = m["meta"]["stats"][f]
        assert set(st) == {"o_custkey", "o_orderdate"}
        assert st["o_custkey"][0] <= st["o_custkey"][1]
    # a narrow custkey slice prunes real files...
    kept = layout.prune_files(m, "o_custkey", layout.SCAN_LO, layout.SCAN_HI)
    assert 0 < len(kept) < len(m["files"])
    # ...and the pruned read equals the full-scan filter exactly
    pruned = layout.read_skipping(
        t, spark, "o_custkey", layout.SCAN_LO, layout.SCAN_HI
    )
    full = t.read(spark).where(
        F.col("o_custkey").between(layout.SCAN_LO, layout.SCAN_HI)
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )


def test_timestamp_stats_prune_lexicographically(spark, tmp_path, sf_dir):
    """Date/timestamp stats serialize as ISO strings whose lexicographic
    order equals value order — pin that a date-range prune over them
    both drops files and loses no rows."""
    t = _build_table(spark, tmp_path, sf_dir)
    layout.optimize_zorder(t, spark, ["o_orderdate", "o_custkey"], target_files=8)
    m = t.manifest()
    lo, hi = "1995-01-01 00:00:00", "1995-12-31 23:59:59"
    kept = layout.prune_files(m, "o_orderdate", lo, hi)
    assert 0 < len(kept) < len(m["files"])
    pruned = layout.read_skipping(t, spark, "o_orderdate", lo, hi)
    full = t.read(spark).where(
        F.col("o_orderdate").between(F.lit(lo), F.lit(hi))
    )
    assert pruned.count() == full.count() > 0


def test_statless_files_are_kept_conservatively(spark, tmp_path, sf_dir):
    """An append AFTER the layout rewrite produces files with no stats
    entry — skipping must keep them (it is an optimization, never a
    filter), so the appended rows still appear in a pruned scan."""
    t = _build_table(spark, tmp_path, sf_dir)
    layout.optimize_zorder(t, spark, ["o_custkey", "o_orderdate"], target_files=4)
    extra = t.read(spark).limit(5).withColumn("o_custkey", F.lit(7).cast("long"))
    t.append(extra)
    pruned = layout.read_skipping(t, spark, "o_custkey", 7, 7)
    assert pruned.where(F.col("o_custkey") == 7).count() >= 5


def test_optimize_aborts_on_concurrent_commit(spark, tmp_path, sf_dir, monkeypatch):
    """A commit landing between the rewrite's snapshot read and its
    commit must abort it (ConcurrentWriteError) — retry-merging would
    silently drop the racer's rows. Delta raises ConcurrentAppend for
    the same interleaving on OPTIMIZE."""
    t = _build_table(spark, tmp_path, sf_dir)
    racer_rows = t.read(spark).limit(3)
    real = layout.file_column_stats

    def racy(*a, **kw):
        t.append(racer_rows)  # concurrent writer wins the window
        return real(*a, **kw)

    monkeypatch.setattr(layout, "file_column_stats", racy)
    before = set(os.listdir(t.data_dir))
    with pytest.raises(ConcurrentWriteError, match="committed since"):
        layout.optimize_zorder(t, spark, ["o_custkey"], target_files=4)
    # the aborted rewrite discarded its staged files: everything on disk
    # is referenced by the (append-winning) current manifest
    live = {os.path.basename(f) for f in t.manifest()["files"]}
    on_disk = {
        f
        for f in os.listdir(t.data_dir)
        if f.endswith(".parquet")
    }
    assert on_disk == live
    assert before - on_disk == set()  # no pre-existing file was touched


def test_optimize_preserves_unrelated_meta(spark, tmp_path, sf_dir):
    """A layout rewrite must carry the prior manifest's meta forward —
    in particular the streaming sinks' stream_batch_id replay guard
    (streaming/sink.py): dropping it would make a checkpoint restart
    after maintenance re-append already-committed micro-batches."""
    t = _build_table(spark, tmp_path, sf_dir)
    rows = t.read(spark).limit(2)
    t.append(rows, meta={"stream_batch_id": 41})
    layout.optimize_zorder(t, spark, ["o_custkey"], target_files=4)
    m = t.manifest()
    assert m["meta"]["stream_batch_id"] == 41
    assert "layout" in m["meta"] and "stats" in m["meta"]


def test_append_carries_stats_for_live_files(spark, tmp_path, sf_dir):
    """An append after OPTIMIZE keeps the z-ordered files' stats in the
    new manifest (Delta keeps stats per AddFile) — skipping stays armed
    for the still-live clustered files, while the appended stats-less
    files are conservatively kept."""
    t = _build_table(spark, tmp_path, sf_dir)
    layout.optimize_zorder(t, spark, ["o_custkey", "o_orderdate"], target_files=4)
    z_files = set(t.manifest()["files"])
    t.append(t.read(spark).limit(3))
    m = t.manifest()
    stats = m["meta"]["stats"]
    assert set(stats) == z_files  # all clustered files kept their stats
    kept = layout.prune_files(m, "o_custkey", layout.SCAN_LO, layout.SCAN_HI)
    # the appended file(s) are stats-less → kept; some z-files pruned
    assert len(kept) < len(m["files"])
    assert set(m["files"]) - z_files <= set(kept)


def test_optimize_empty_table_is_noop(spark, tmp_path):
    t = AcidTable(os.path.join(str(tmp_path), "empty_z"))
    df = spark.createDataFrame([], "o_custkey long, o_orderdate date")
    t.overwrite(df)
    v0 = t.current_version()
    assert layout.optimize_zorder(t, spark, ["o_custkey"]) == v0
    assert t.current_version() == v0


def test_read_skipping_keeps_partition_columns(spark, tmp_path, sf_dir):
    """On a Hive-partitioned table (all files stats-less → all kept) the
    skipping read must still surface the partition column — basePath,
    matching AcidTable.read — so predicates on it resolve."""
    from dbt_jaffleshop_spark.sources import load_table

    orders = load_table(spark, "orders", sf_dir).withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    ).select("o_orderkey", "o_custkey", "month")
    t = AcidTable(os.path.join(str(tmp_path), "orders_pk"))
    t.overwrite(orders, partition_by=["month"])
    got = layout.read_skipping(t, spark, "o_custkey", 0, 40)
    assert "month" in got.columns
    assert got.where(F.col("month").isNotNull()).count() == got.count() > 0


def test_partitioned_table_rejected(spark, tmp_path, sf_dir):
    from dbt_jaffleshop_spark.sources import load_table

    orders = load_table(spark, "orders", sf_dir).withColumn(
        "month", F.date_format("o_orderdate", "yyyy-MM")
    )
    t = AcidTable(os.path.join(str(tmp_path), "orders_p"))
    t.overwrite(orders, partition_by=["month"])
    with pytest.raises(ValueError, match="partition"):
        layout.optimize_zorder(t, spark, ["o_custkey"])
