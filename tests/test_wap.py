"""Write-audit-publish branches (r11, VERDICT r10 item 4): a pipeline
run stages new snapshot versions, audits them with the declarative
tests, and publishes atomically only if green — branch-aware readers
see the pre-run state throughout, and failed audits can never corrupt
or unpublish the live state (including via vacuum)."""

import dataclasses
import os

import pytest
from pyspark.sql import functions as F  # noqa: F401

from dbt_jaffleshop_spark.plans import dag
from dbt_jaffleshop_spark.plans.acid import AcidTable
from dbt_jaffleshop_spark.plans.dag import read_mart
from dbt_jaffleshop_spark.plans.wap import PublishPointer, run_pipeline_wap


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_wap_green_run_publishes_all_tables(spark, sf_dir, tmp_path):
    wh = str(tmp_path / "wh")
    results, published = run_pipeline_wap(spark, sf_dir, warehouse_dir=wh)
    assert published
    bad = {k: v for k, v in results.items() if v.get("status") not in ("ok",)}
    assert not bad, bad

    tables = PublishPointer(wh).tables()
    # every table model AND every export is in the published map
    for name, spec in dag.MODELS.items():
        if spec.materialization == "table":
            assert name in tables, name
    exports = [k.removeprefix("export:") for k in results if k.startswith("export:")]
    assert exports and all(e in tables for e in exports)

    # published read ≡ live read right after a publish
    assert _rows(read_mart(spark, wh, "customers", published=True)) == _rows(
        read_mart(spark, wh, "customers")
    )


def test_wap_failed_audit_blocks_publish_readers_see_pre_run(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The core WAP guarantee: a failing data test blocks the publish;
    branch-aware readers see the pre-run state through BOTH failed
    runs (vacuum included — the published version is pin-protected),
    and the next green run publishes normally."""
    wh = str(tmp_path / "wh")
    _, ok = run_pipeline_wap(spark, sf_dir, warehouse_dir=wh)
    assert ok
    pointer = PublishPointer(wh)
    published_before = dict(pointer.tables())
    customers_before = _rows(read_mart(spark, wh, "customers", published=True))

    orig = dag.MODELS["customers"]
    failing = dataclasses.replace(
        orig,
        tests=orig.tests
        + [("always_fails", lambda dfs: dfs["customers"].limit(1))],
    )
    monkeypatch.setitem(dag.MODELS, "customers", failing)

    for attempt in range(2):  # two failed runs stack two staged versions
        results, ok2 = run_pipeline_wap(spark, sf_dir, warehouse_dir=wh)
        assert not ok2
        assert results["customers"]["status"] == "test_failed"
        # pointer unmoved; staged version sits above it, unpublished
        assert pointer.tables() == published_before
        staged_v = AcidTable(os.path.join(wh, "customers")).current_version()
        assert staged_v > published_before["customers"]
        # readers resolve to the pre-run state — vacuum (keep_last=2 +
        # publish pin) must not have reclaimed the published files
        assert (
            _rows(read_mart(spark, wh, "customers", published=True))
            == customers_before
        )

    # audit fixed → green run publishes; readers move forward atomically
    monkeypatch.setitem(dag.MODELS, "customers", orig)
    _, ok3 = run_pipeline_wap(spark, sf_dir, warehouse_dir=wh)
    assert ok3
    assert pointer.tables()["customers"] > published_before["customers"]
    assert _rows(read_mart(spark, wh, "customers", published=True)) == _rows(
        read_mart(spark, wh, "customers")
    )


def test_wap_unpublished_read_fails_loudly(spark, sf_dir, tmp_path):
    wh = str(tmp_path / "wh")
    # plain (non-WAP) build: tables exist but nothing is published
    dag.run_pipeline(spark, sf_dir, warehouse_dir=wh)
    with pytest.raises(KeyError, match="no published version"):
        read_mart(spark, wh, "orders", published=True)
    # unpublished read path is unaffected
    assert read_mart(spark, wh, "orders").count() > 0


def test_wap_composes_with_state_aware(spark, sf_dir, tmp_path):
    """A WAP run with state_aware: the no-change second run reuses
    every table model and export (writes nothing) and still publishes
    green — the published versions simply don't move."""
    wh = str(tmp_path / "wh")
    _, ok = run_pipeline_wap(
        spark, sf_dir, warehouse_dir=wh, state_aware=True
    )
    assert ok
    v1 = dict(PublishPointer(wh).tables())
    results, ok2 = run_pipeline_wap(
        spark, sf_dir, warehouse_dir=wh, state_aware=True
    )
    assert ok2
    reused = [k for k, v in results.items() if v.get("status") == "reused"]
    n_tables = sum(
        1 for s in dag.MODELS.values() if s.materialization == "table"
    )
    n_exports = sum(1 for k in results if k.startswith("export:"))
    assert len(reused) == n_tables + n_exports
    assert PublishPointer(wh).tables() == v1  # nothing moved


def test_export_versions_are_vacuumed(spark, sf_dir, tmp_path):
    """Exports follow the marts' retention policy: repeated builds must
    not accumulate one snapshot set per run forever."""
    wh = str(tmp_path / "wh")
    for _ in range(3):
        dag.run_pipeline(spark, sf_dir, warehouse_dir=wh)
    name = next(
        k.removeprefix("export:")
        for k in dag.run_pipeline(spark, sf_dir, warehouse_dir=wh)
        if k.startswith("export:")
    )
    t = AcidTable(os.path.join(wh, name))
    live = t._all_versions()
    assert len(live) <= 2, live  # keep_last=2 enforced for exports
