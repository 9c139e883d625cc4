"""Round-12 advisor-finding remediations (ADVICE.md r12):

1. llm/dedup_incremental._write_meta_row: the meta MANIFEST read inside
   the retry loop retries on FileNotFoundError (a concurrent vacuum
   expiring the pointer between the pointer read and the manifest open)
   instead of aborting the whole transaction on a race it could win.
2. plans/acid.AcidTable.append_from: a concurrent set_stats_columns
   that backfills stats for the carried BASE files onto the live
   manifest is merged into the committed manifest — previously the
   commit declared stats_columns while silently lacking stats for every
   base file.
3. Same for the PINNED replace_partitions_and_append path (kept files
   carried from the pinned snapshot, stats backfill landing on live).
4. llm/ann_index.grow_ann_cells refuses an n_cells past the stored id
   range — committing that watermark would permanently forfeit the gap
   ids as future seeds.
"""

import os

import pytest
from pyspark.sql import functions as F

from dbt_jaffleshop_spark.plans.acid import AcidTable


# ----------------------------------- 1. meta manifest-read retry race


def test_write_meta_row_retries_expired_manifest_read(spark, tmp_path):
    """A FileNotFoundError from the manifest open (concurrent vacuum
    expired the pointer between exists() and the read) must retry like
    a commit conflict — not abort the transaction and discard the
    staged row."""
    from dbt_jaffleshop_spark.llm.dedup_incremental import (
        _read_meta_row,
        _write_meta_row,
    )

    meta = AcidTable(os.path.join(str(tmp_path), "meta"))
    ddl = "max_doc_id bigint, a_v int"
    _write_meta_row(meta, (10, 1), ddl, None)
    assert meta.current_version() == 1

    real_manifest = meta.manifest
    fired = []

    def expiring_manifest(version=None):
        if not fired:
            fired.append(1)
            raise FileNotFoundError("concurrent vacuum expired the pointer")
        return real_manifest(version)

    meta.manifest = expiring_manifest
    _write_meta_row(meta, (20, 2), ddl, None)  # must NOT raise
    meta.manifest = real_manifest
    assert fired  # the race actually fired
    assert meta.current_version() == 2
    row = _read_meta_row(meta, 2)
    assert (int(row["max_doc_id"]), int(row["a_v"])) == (20, 2)


def test_write_meta_row_validate_refusal_still_terminal(spark, tmp_path):
    """The retry guard covers ONLY the expired-pointer race: a validate
    hook's refusal (the transaction genuinely lost) must still abort
    immediately and discard the staged row."""
    from dbt_jaffleshop_spark.llm.dedup_incremental import _write_meta_row

    meta = AcidTable(os.path.join(str(tmp_path), "meta"))
    ddl = "max_doc_id bigint, a_v int"
    _write_meta_row(meta, (10, 1), ddl, None)

    calls = []

    def refusing_validate(cur):
        calls.append(1)
        raise ValueError("lost the meta swap")

    with pytest.raises(ValueError, match="lost the meta swap"):
        _write_meta_row(meta, (20, 2), ddl, refusing_validate)
    assert len(calls) == 1  # terminal: no retry loop around validate
    assert meta.current_version() == 1
    # staged-row discard: no orphan data files beyond v1's
    live = set(meta.manifest()["files"])
    on_disk = {
        f for f in os.listdir(meta.data_dir) if f.endswith(".parquet")
    }
    assert on_disk == live


# ----------------- 2./3. concurrent stats backfill on carried files


def _race_set_stats(table: AcidTable, cols):
    """Arm the table so its NEXT commit attempt loses to a concurrent
    set_stats_columns (the backfilling declaration) and retries."""
    racer = AcidTable(table.path)
    real_commit = table._commit
    fired = []

    def racing_commit(files, partition_by, meta=None, expected_parent=None):
        if not fired:
            fired.append(1)
            racer.set_stats_columns(list(cols))
        return real_commit(files, partition_by, meta, expected_parent)

    table._commit = racing_commit
    return fired


def test_append_from_carries_concurrent_stats_backfill(spark, tmp_path):
    """r12 ADVICE (plans/acid.py append_from): the live manifest's
    backfilled stats for the PINNED BASE files must reach the committed
    manifest — declaring stats_columns without them silently disables
    file skipping for every base file."""
    t = AcidTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(i, i * 2) for i in range(100)], "id bigint, v bigint"
        )
    )
    base_v = t.current_version()
    assert "stats" not in t.manifest(base_v).get("meta", {}) or not t.manifest(
        base_v
    )["meta"].get("stats")

    fired = _race_set_stats(t, ["id"])
    v = t.append_from(
        spark.createDataFrame([(500, 9)], "id bigint, v bigint"),
        base_version=base_v,
    )
    assert fired
    m = t.manifest(v)
    assert m["meta"]["stats_columns"] == ["id"]
    # EVERY committed file has stats — base files included
    assert set(m["meta"]["stats"]) == set(m["files"])


def test_pinned_partition_replace_carries_concurrent_stats_backfill(
    spark, tmp_path
):
    """Same reopened race for the pinned replace_partitions_and_append
    path: kept files come from the pinned snapshot, their backfilled
    stats from the live manifest."""
    t = AcidTable(str(tmp_path / "p"))
    t.append(
        spark.createDataFrame(
            [(i, i * 3, i % 3) for i in range(90)],
            "id bigint, v bigint, part int",
        ),
        partition_by=["part"],
    )
    base_v = t.current_version()

    fired = _race_set_stats(t, ["v"])
    v = t.overwrite_partitions(
        spark.createDataFrame([(1000, 7, 0)], "id bigint, v bigint, part int"),
        "part",
        [0],
        base_version=base_v,
    )
    assert fired
    m = t.manifest(v)
    assert m["meta"]["stats_columns"] == ["v"]
    kept = [f for f in m["files"] if "part=0" not in f.split(os.sep)]
    assert kept  # partitions 1 and 2 carried from the pinned base
    assert set(m["meta"]["stats"]) == set(m["files"])


# --------------------------------- 4. grow_ann_cells id-range guard


def test_grow_ann_cells_refuses_watermark_past_id_range(spark, sf_dir):
    """Committing n_cells above max_vec_id would permanently forfeit
    the gap ids as future seeds (a later grow only seeds from the
    recorded watermark upward) — refused loudly; growth up to exactly
    max_vec_id + 1 stays legal."""
    import tempfile

    from dbt_jaffleshop_spark.llm import ann_index as ai
    from dbt_jaffleshop_spark.sources import load_table

    emb = (
        load_table(spark, "embeddings", sf_dir)
        .select("vec_id", "embedding")
        .where(F.col("vec_id") <= 20)
    )
    root = tempfile.mkdtemp(prefix="ann_grow_range_")
    idx = ai.build_ann_index(spark, emb, root, train_iters=0, n_cells=8)
    with pytest.raises(ValueError, match="stored id range"):
        ai.grow_ann_cells(spark, idx, 22)
    # the refusal left the index untouched
    assert ai._n_cells(idx.snapshot(spark)[1]) == 8
    # the boundary case is legal: every stored id becomes a seed
    ai.grow_ann_cells(spark, idx, 21)
    assert ai._n_cells(idx.snapshot(spark)[1]) == 21


# ------------- VERDICT r12 item 6: grow vs concurrent append refusal


def test_grow_ann_cells_loses_to_concurrent_append(spark, sf_dir):
    """A streaming append_vectors landing between grow's snapshot read
    and its meta swap must win: grow aborts at the swap with
    ConcurrentWriteError (same serialization point as every index op),
    the appended vectors survive, the layout is unchanged, and a re-run
    of the grow then succeeds over the appended corpus."""
    import tempfile

    from dbt_jaffleshop_spark.llm import ann_index as ai
    from dbt_jaffleshop_spark.plans.acid import ConcurrentWriteError
    from dbt_jaffleshop_spark.sources import load_table

    emb = (
        load_table(spark, "embeddings", sf_dir)
        .select("vec_id", "embedding")
        .where(F.col("vec_id") <= 100)
    )
    root = tempfile.mkdtemp(prefix="ann_grow_race_")
    idx = ai.build_ann_index(
        spark, emb.where(F.col("vec_id") <= 80), root,
        train_iters=0, n_cells=8,
    )
    delta = emb.where(F.col("vec_id") > 80)

    real_overwrite = idx.centroids.overwrite
    fired = []

    def racing_overwrite(df, **kw):
        if not fired:
            fired.append(1)
            # the concurrent writer: a streaming micro-batch append
            # that commits (and swaps meta) mid-grow
            ai.append_vectors(spark, delta, idx)
        return real_overwrite(df, **kw)

    idx.centroids.overwrite = racing_overwrite
    with pytest.raises(ConcurrentWriteError):
        ai.grow_ann_cells(spark, idx, 32)
    idx.centroids.overwrite = real_overwrite
    assert fired

    _v, snap = idx.snapshot(spark)
    assert ai._n_cells(snap) == 8  # loser's layout never committed
    assert int(snap["max_vec_id"]) == 100  # winner's append intact
    vecs = idx.vectors.read(spark, version=int(snap["vectors_v"]))
    assert vecs.count() == emb.count()

    ai.grow_ann_cells(spark, idx, 32)  # the prescribed re-run wins
    assert ai._n_cells(idx.snapshot(spark)[1]) == 32


# ------- r13 review: metadata-only DDL ops retry like every writer


def _race_append(spark, table: AcidTable, rows, ddl):
    """Arm the table so its NEXT commit attempt loses to a concurrent
    append and must retry against the winner's manifest."""
    racer = AcidTable(table.path)
    real_commit = table._commit
    fired = []

    def racing_commit(files, partition_by, meta=None, expected_parent=None):
        if not fired:
            fired.append(1)
            racer.append(spark.createDataFrame(rows, ddl))
        return real_commit(files, partition_by, meta, expected_parent)

    table._commit = racing_commit
    return fired


def test_set_stats_columns_survives_concurrent_append(spark, tmp_path):
    """The declaration used to surface a raw CommitConflictError when
    any append landed during the backfill; now it retries and the
    committed manifest covers the racer's new file too."""
    t = AcidTable(str(tmp_path / "s"))
    t.append(
        spark.createDataFrame(
            [(i, i * 2) for i in range(50)], "id bigint, v bigint"
        )
    )
    fired = _race_append(spark, t, [(999, 1)], "id bigint, v bigint")
    t.set_stats_columns(["id"])
    assert fired
    m = t.manifest()
    assert m["meta"]["stats_columns"] == ["id"]
    assert set(m["meta"]["stats"]) == set(m["files"])  # racer's file too


def test_add_constraint_revalidates_the_winners_rows(spark, tmp_path):
    """A retry must validate the CONCURRENTLY APPENDED rows: a clean
    racer lets the constraint land (covering its rows); a violating
    racer makes add_constraint refuse loudly instead of activating a
    constraint the current snapshot breaks."""
    t = AcidTable(str(tmp_path / "ok"))
    t.append(spark.createDataFrame([(1,), (2,)], "id bigint"))
    fired = _race_append(spark, t, [(7,)], "id bigint")
    t.add_constraint(spark, "pos", "id > 0")
    assert fired
    assert t.constraints() == {"pos": "id > 0"}

    bad = AcidTable(str(tmp_path / "bad"))
    bad.append(spark.createDataFrame([(1,), (2,)], "id bigint"))
    fired = _race_append(spark, bad, [(-5,)], "id bigint")
    with pytest.raises(ValueError, match="violated by existing rows"):
        bad.add_constraint(spark, "pos", "id > 0")
    assert fired
    assert bad.constraints() == {}  # never activated
    # the racer's row itself survived — refusal is metadata-only
    assert bad.read(spark).where("id = -5").count() == 1


def test_drop_constraint_survives_concurrent_append(spark, tmp_path):
    t = AcidTable(str(tmp_path / "d"))
    t.append(spark.createDataFrame([(1,)], "id bigint"))
    t.add_constraint(spark, "pos", "id > 0")
    fired = _race_append(spark, t, [(3,)], "id bigint")
    t.drop_constraint("pos")
    assert fired
    assert t.constraints() == {}
    assert t.read(spark).count() == 2
