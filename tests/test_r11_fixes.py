"""Round-11 advisor-finding remediations (ADVICE.md r10):

1. AcidTable.vacuum ``protect_versions`` + index vacuum meta-pinning —
   garbage commits (crashed attempts / losing concurrent folds) must
   never push a pointer-pinned live version out of the keep window.
2. append_from carries the pinned base's per-file column stats forward,
   like append() does for its parent.
3. Entity-hop joins fail loudly when a hop would add a column the
   frame already defines (AMBIGUOUS_REFERENCE prevention).
"""

import dataclasses
import os
import tempfile

import pytest
from pyspark.sql import functions as F


# ------------------------------------------------ 1. vacuum pinning


def test_vacuum_protect_versions_keeps_pinned_snapshot(spark, tmp_path):
    """Table-level contract: three overwrites leave v1 outside
    keep_last=2, but protect_versions={1} must keep its manifest and
    files readable — the mechanism external commit pointers rely on."""
    from dbt_jaffleshop_spark.plans.acid import AcidTable

    t = AcidTable(str(tmp_path / "t"))
    for i in range(3):
        t.overwrite(spark.range(i * 10, i * 10 + 5).toDF("id"))
    assert t.current_version() == 3

    t.vacuum(keep_last=2, protect_versions={1})
    assert t.read(spark, version=1).count() == 5  # pinned: survives
    # and an unprotected vacuum then reclaims it (protection is
    # per-call, not sticky)
    t.vacuum(keep_last=2)
    with pytest.raises(FileNotFoundError):
        t.manifest(1)


def test_index_vacuum_survives_garbage_commits(spark, sf_dir):
    """The r10 advisor's corruption scenario: two data-table commits
    never referenced by meta (crashed removal attempts — clusters
    overwritten, meta swap never reached) land AFTER the meta-pinned
    version. vacuum(keep_last=2) would previously keep only the two
    garbage versions and delete the live snapshot's files; the meta
    pin must keep the index readable and unchanged."""
    from dbt_jaffleshop_spark.llm import dedup_incremental as di
    from dbt_jaffleshop_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    root = tempfile.mkdtemp(prefix="dedup_idx_pin_")
    idx = di.build_dedup_index(
        spark, docs.where(F.col("doc_id") <= mx * 7 // 10), root
    )
    committed = sorted(map(tuple, idx.clusters_df(spark).collect()))

    # two crashed attempts: clusters committed, meta never swapped —
    # the exact garbage shape the transaction protocol produces
    junk = spark.createDataFrame(
        [(10**9, 10**9, 1)], "doc_id bigint, cluster_id bigint, cluster_size bigint"
    )
    pinned_v = int(idx.snapshot(spark)[1]["clusters_v"])
    idx.clusters.overwrite(junk)
    idx.clusters.overwrite(junk)
    assert idx.clusters.current_version() == pinned_v + 2

    idx.vacuum(keep_last=2)
    # the meta-pinned snapshot is intact and the index reads through it
    assert sorted(map(tuple, idx.clusters_df(spark).collect())) == committed
    assert idx.clusters.read(spark, version=pinned_v).count() == len(committed)


def test_emb_index_vacuum_survives_garbage_commits(spark, sf_dir):
    """Same pin contract for the embedding index flavor."""
    from dbt_jaffleshop_spark.llm import dedup_incremental as di
    from dbt_jaffleshop_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    mx = emb.agg(F.max("vec_id")).collect()[0][0]
    root = tempfile.mkdtemp(prefix="emb_idx_pin_")
    idx = di.build_emb_index(
        spark, emb.where(F.col("vec_id") <= mx * 7 // 10), root
    )
    committed = sorted(map(tuple, idx.clusters_df(spark).collect()))
    junk = spark.createDataFrame(
        [(10**9, 10**9, 1)], "doc_id bigint, cluster_id bigint, cluster_size bigint"
    )
    idx.clusters.overwrite(junk)
    idx.clusters.overwrite(junk)
    idx.vacuum(keep_last=2)
    assert sorted(map(tuple, idx.clusters_df(spark).collect())) == committed


# ------------------------------------------- 2. append_from stats


def test_append_from_carries_base_stats(spark, tmp_path, sf_dir):
    """A fold through append_from on a z-ordered (stats-bearing) table
    must keep the base files' per-file column stats in the committed
    manifest — otherwise file skipping silently dies for the whole
    base after one fold."""
    from dbt_jaffleshop_spark.plans.acid import AcidTable
    from dbt_jaffleshop_spark.plans.layout import optimize_zorder

    t = AcidTable(str(tmp_path / "z"))
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") * 7 % 100).alias("x")
    )
    t.overwrite(df)
    optimize_zorder(t, spark, ["id", "x"], target_files=4)
    base_v = t.current_version()
    base_stats = t.manifest(base_v)["meta"]["stats"]
    assert base_stats  # precondition: the base carries stats

    t.append_from(
        spark.range(1000, 1100).select(
            F.col("id"), (F.col("id") * 7 % 100).alias("x")
        ),
        base_version=base_v,
    )
    new_stats = t.manifest()["meta"]["stats"]
    for f, s in base_stats.items():
        assert new_stats.get(f) == s  # every base file's stats survive


# -------------------------------------- 3. entity-hop collision guard


def _mini_model(name, cols_df_fn, dims=(), paths=None):
    from dbt_jaffleshop_spark.semantic.model import (
        Dimension,
        Measure,
        Metric,
        SemanticModel,
    )

    return SemanticModel(
        name=name,
        mart=name,
        base=cols_df_fn,
        agg_time_dimension="ts",
        dimensions={d: Dimension(d) for d in dims},
        measures={"meas": Measure("meas", agg="sum", expr="x")},
        metrics={"m": Metric("m", kind="simple", measure="meas")},
        entity_paths=paths or {},
    )


def test_entity_hop_output_collision_fails_loudly(spark):
    """A base mart already defining a column named like the hop's
    aliased output dimension must raise a clear ValueError instead of
    hitting AMBIGUOUS_REFERENCE downstream."""
    from dbt_jaffleshop_spark.semantic.model import EntityPath, MetricQuery

    def tgt_base(s, sf):
        return s.createDataFrame([(1, "a")], "k bigint, v string")

    target = _mini_model("tgt", tgt_base, dims=("v",))

    def base(s, sf):
        # the base frame ALREADY has the would-be output column name
        return s.createDataFrame(
            [(1, 2, 9, "clash")], "k bigint, x bigint, ts bigint, `loc__v` string"
        )

    model = _mini_model(
        "base", base,
        paths={"loc": EntityPath("loc", hops=(("k", target),))},
    )
    q = MetricQuery(model, metrics=["m"], group_by=["loc__v"])
    with pytest.raises(ValueError, match="already defines"):
        q.to_df(spark)


def test_entity_hop_intermediate_key_collision_fails_loudly(spark):
    """A 2-hop path whose intermediate join key already exists on the
    base frame is the other ambiguity shape — also a loud error."""
    from dbt_jaffleshop_spark.semantic.model import EntityPath, MetricQuery

    def terminal_base(s, sf):
        return s.createDataFrame([(1, "a")], "k2 bigint, v string")

    terminal = _mini_model("terminal", terminal_base, dims=("v",))

    def mid_base(s, sf):
        return s.createDataFrame([(1, 1)], "k bigint, k2 bigint")

    mid = _mini_model("mid", mid_base)

    def base(s, sf):
        # base already carries k2 — hop 0 would add a second one
        return s.createDataFrame(
            [(1, 7, 2, 9)], "k bigint, k2 bigint, x bigint, ts bigint"
        )

    model = _mini_model(
        "base", base,
        paths={
            "loc": EntityPath("loc", hops=(("k", mid), ("k2", terminal)))
        },
    )
    q = MetricQuery(model, metrics=["m"], group_by=["loc__v"])
    with pytest.raises(ValueError, match="already defines"):
        q.to_df(spark)


def test_declared_jaffle_entity_paths_still_resolve(spark, sf_dir):
    """Regression guard: the guard must not reject the two DECLARED
    reference paths (order_items 2-hop, orders 1-hop)."""
    from dbt_jaffleshop_spark.semantic.jaffle_models import (
        ORDER_ITEMS_MODEL,
        ORDERS_MODEL,
    )
    from dbt_jaffleshop_spark.semantic.model import MetricQuery

    two_hop = MetricQuery(
        ORDER_ITEMS_MODEL, metrics=["revenue_cents"],
        group_by=["location__location_name"],
    ).to_df(spark, sf_dir)
    assert two_hop.count() > 0
    one_hop = MetricQuery(
        ORDERS_MODEL, metrics=["orders"],
        group_by=["location__location_name"],
    ).to_df(spark, sf_dir)
    assert one_hop.count() > 0
