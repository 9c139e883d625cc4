"""Occupancy/layout observability (r12 verdict item 3): the manual
scale knobs — grow_ann_cells, repartition_index, rebucket_emb_index —
need a trigger signal a production operator can read. layout_report is
that signal; these tests pin it against the trajectory
scripts/cell_grow_ab.py measured for the frozen-cell failure mode
(15.9 candidates/probe at build → 31.7 after the corpus doubles at a
frozen 16 cells → 10.3 after grow→64): the report must show the
doubling AND show growth curing it, on the same protocol."""

import tempfile

import pytest
from pyspark.sql import functions as F

from dbt_jaffleshop_spark.llm import ann_index as ai
from dbt_jaffleshop_spark.llm.dedup import _quantize_frame
from dbt_jaffleshop_spark.llm.similarity import QUERY_STRIDE
from dbt_jaffleshop_spark.sources import load_table

def _emb(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding"
    )


def test_ann_layout_report_pins_the_cell_grow_ab_trajectory(spark, sf_dir):
    """The cell_grow_ab protocol, measured THROUGH layout_report (the
    script now calls the same function): build half the corpus at 16
    cells, append the rest (occupancy ~doubles — the frozen-cell
    failure mode), grow to 64 (+1 Lloyd round) — occupancy falls back
    to at most ~1.3x the build baseline. Same pass bar as the A/B."""
    emb = _emb(spark, sf_dir)
    mx = int(emb.agg(F.max("vec_id")).collect()[0][0])
    half = mx // 2
    queries = _quantize_frame(
        emb.where(F.col("vec_id") % QUERY_STRIDE == 0)
    ).localCheckpoint()
    root = tempfile.mkdtemp(prefix="layout_report_ann_")
    idx = ai.build_ann_index(
        spark, emb.where(F.col("vec_id") <= half), root,
        train_iters=1, n_cells=16,
    )
    base = ai.layout_report(spark, idx, queries=queries)
    assert base["n_cells"] == 16
    assert base["corpus"] == half + 1
    assert base["mean_candidates_per_probe"] > 0

    ai.append_vectors(spark, emb.where(F.col("vec_id") > half), idx)
    doubled = ai.layout_report(spark, idx, queries=queries)
    assert doubled["n_cells"] == 16
    assert doubled["corpus"] == mx + 1
    # the frozen-cell failure mode: the report must SHOW the growth an
    # operator would act on (the A/B measured 15.9 -> 31.7, i.e. ~2x)
    assert (
        doubled["mean_candidates_per_probe"]
        >= 1.5 * base["mean_candidates_per_probe"]
    )
    assert doubled["balanced_rows_per_cell"] == pytest.approx(
        2 * base["balanced_rows_per_cell"], rel=0.1
    )

    ai.grow_ann_cells(spark, idx, 64, train_iters=1)
    grown = ai.layout_report(spark, idx, queries=queries)
    assert grown["n_cells"] == 64
    assert grown["corpus"] == mx + 1
    # the cure: back to at most ~1.3x the build baseline (A/B bar;
    # measured 10.3 vs the 15.9 baseline — BELOW it)
    assert (
        grown["mean_candidates_per_probe"]
        <= 1.3 * base["mean_candidates_per_probe"]
    )
    # report sanity: occupied cells never exceed the layout, and the
    # probe cost is at least the balanced floor's order of magnitude
    for rep in (base, doubled, grown):
        assert rep["cells_occupied"] <= rep["n_cells"]
        assert rep["max_cell_rows"] >= rep["mean_cell_rows"]
        assert rep["probe_skew"] > 0


def test_ann_layout_report_default_query_workload(spark, sf_dir):
    """Without an explicit workload the report probes with the stored
    vectors at QUERY_STRIDE — the registry's own query set — so a bare
    layout_report(spark, idx) is directly comparable to the A/B."""
    emb = _emb(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="layout_report_dflt_")
    idx = ai.build_ann_index(spark, emb, root, train_iters=0, n_cells=8)
    rep = ai.layout_report(spark, idx)
    assert rep["n_cells"] == 8
    assert rep["corpus"] == emb.count()
    assert rep["mean_candidates_per_probe"] > 0
    assert rep["max_candidates_per_probe"] >= rep["mean_candidates_per_probe"]


def test_dedup_layout_report_rows_per_bucket(spark, sf_dir):
    """The document index flavor: rows/bucket per hash-partitioned
    table, doubled layout halves the per-bucket row counts (the signal
    repartition_index is turned on)."""
    from dbt_jaffleshop_spark.llm.dedup_incremental import (
        build_dedup_index,
        layout_report,
        repartition_index,
    )

    docs = load_table(spark, "documents", sf_dir)
    root = tempfile.mkdtemp(prefix="layout_report_dedup_")
    idx = build_dedup_index(spark, docs, root)
    rep = layout_report(spark, idx)
    n0 = rep["n_doc_buckets"]
    assert set(rep["tables"]) == set(idx._PB_TABLES)
    sh = rep["tables"]["shingles"]
    assert sh["rows"] > 0
    assert sh["buckets_occupied"] <= n0
    assert sh["max_rows_per_bucket"] >= sh["mean_rows_per_bucket"]

    repartition_index(spark, idx, n0 * 4)
    rep2 = layout_report(spark, idx)
    assert rep2["n_doc_buckets"] == n0 * 4
    sh2 = rep2["tables"]["shingles"]
    assert sh2["rows"] == sh["rows"]  # layout-only: content unchanged
    # 4x the buckets → materially lower per-bucket occupancy
    assert sh2["mean_rows_per_bucket"] < sh["mean_rows_per_bucket"]
    assert sh2["balanced_rows_per_bucket"] == pytest.approx(
        sh["balanced_rows_per_bucket"] / 4, rel=0.01
    )


def test_emb_layout_report_rows_per_bucket(spark, sf_dir):
    """The embedding index flavor goes through the same report: both
    flavors share _PB_TABLES, so one call prices vectors/buckets/pairs/
    clusters per p_bucket — and rebucketing the layout shows up."""
    import tempfile

    from dbt_jaffleshop_spark.llm import dedup_incremental as di

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding"
    )
    root = tempfile.mkdtemp(prefix="layout_report_emb_")
    idx = di.build_emb_index(spark, emb, root, n_doc_buckets=4)
    rep = di.layout_report(spark, idx)
    assert rep["n_doc_buckets"] == 4
    assert set(rep["tables"]) == set(idx._PB_TABLES)
    vc = rep["tables"]["vectors"]
    assert vc["rows"] == emb.count()
    assert vc["buckets_occupied"] <= 4
    di.repartition_index(spark, idx, 8)
    rep2 = di.layout_report(spark, idx)
    assert rep2["n_doc_buckets"] == 8
    assert rep2["tables"]["vectors"]["rows"] == vc["rows"]
    assert (
        rep2["tables"]["vectors"]["balanced_rows_per_bucket"]
        == pytest.approx(vc["balanced_rows_per_bucket"] / 2, rel=0.01)
    )
