"""Write-time per-file stats (r11b, AcidTable.set_stats_columns):
declared once, every writer footer-reads [min, max] stats for its new
files, so scan-time file skipping covers appends and partition replaces
the moment they land — previously stats existed only where
optimize_zorder computed them."""

import os

from dbt_jaffleshop_spark.plans.acid import AcidTable
from dbt_jaffleshop_spark.plans.layout import prune_files


def _t(spark, tmp_path):
    t = AcidTable(os.path.join(str(tmp_path), "tbl"))
    t.append(spark.createDataFrame([(i, i * 2) for i in range(100)], "id bigint, v bigint"))
    t.append(
        spark.createDataFrame(
            [(i, i * 2) for i in range(1000, 1100)], "id bigint, v bigint"
        )
    )
    return t


def test_set_stats_columns_backfills_and_prunes(spark, tmp_path):
    t = _t(spark, tmp_path)
    assert t.manifest().get("meta", {}).get("stats", {}) == {}
    t.set_stats_columns(["id"])
    m = t.manifest()
    stats = m["meta"]["stats"]
    assert set(stats) == set(m["files"])  # every live file covered
    kept = prune_files(m, "id", 0, 99)
    assert len(kept) < len(m["files"])  # the 1000-range file pruned


def test_appends_and_replaces_get_stats_immediately(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.set_stats_columns(["id"])
    t.append(
        spark.createDataFrame(
            [(i, 0) for i in range(5000, 5100)], "id bigint, v bigint"
        )
    )
    m = t.manifest()
    assert set(m["meta"]["stats"]) == set(m["files"])
    # the fresh append is immediately skippable for an unrelated range
    assert not any(
        "5000" in str(m["meta"]["stats"][f])
        for f in prune_files(m, "id", 0, 99)
    )

    # partitioned table: replace one partition, stats survive for kept
    # files and cover the replacement files
    p = AcidTable(os.path.join(str(tmp_path), "ptbl"))
    p.append(
        spark.createDataFrame(
            [(1, 10, 0), (2, 2000, 1)], "id bigint, v bigint, part int"
        ),
        partition_by=["part"],
    )
    p.set_stats_columns(["v"])
    p.overwrite_partitions(
        spark.createDataFrame([(3, 30, 1)], "id bigint, v bigint, part int"),
        "part",
        [1],
    )
    m = p.manifest()
    assert set(m["meta"]["stats"]) == set(m["files"])
    assert m["meta"]["stats_columns"] == ["v"]


def test_compaction_recomputes_stats_for_rewritten_files(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.set_stats_columns(["id"])
    t.compact(spark)
    m = t.manifest()
    assert set(m["meta"]["stats"]) == set(m["files"])
    # full range now in one file; a miss-range probe prunes everything
    assert prune_files(m, "id", 10**9, 10**9 + 1) == []


def test_declaration_survives_full_overwrite(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.set_stats_columns(["id"])
    t.overwrite(t.read(spark))
    m = t.manifest()
    assert m["meta"]["stats_columns"] == ["id"]
    assert set(m["meta"]["stats"]) == set(m["files"])


def test_concurrent_declaration_survives_a_retried_commit(spark, tmp_path):
    """The reopened-race recheck (r11 ADVICE): a set_stats_columns that
    lands AFTER a writer's pre-stage manifest read but BEFORE its commit
    must not be dropped by the retry — the per-attempt recompute carries
    the declaration and footer-reads stats for the staged files, the
    same class of fix the constraint recheck pins."""
    from dbt_jaffleshop_spark.plans.acid import CommitConflictError  # noqa: F401

    t = _t(spark, tmp_path)
    racer = AcidTable(t.path)
    before = set(t.manifest()["files"])
    real_commit = t._commit
    fired = []

    def racing_commit(files, partition_by, meta=None, expected_parent=None):
        if not fired:
            fired.append(1)
            # lands a new manifest -> t's first attempt loses its parent
            # check and retries against the declared state
            racer.set_stats_columns(["v"])
        return real_commit(files, partition_by, meta, expected_parent)

    t._commit = racing_commit
    v = t.append(
        spark.createDataFrame([(5000, 9)], "id bigint, v bigint")
    )
    m = t.manifest(v)
    assert m["meta"]["stats_columns"] == ["v"]
    new_files = set(m["files"]) - before
    assert new_files and all(f in m["meta"]["stats"] for f in new_files)
    # ... and the backfilled stats of the pre-existing files carried too
    assert set(m["meta"]["stats"]) == set(m["files"])
