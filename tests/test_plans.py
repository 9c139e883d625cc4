"""Physical-plan assertions — the scale contract (SURVEY §4.2, §7.4).

Correctness tests prove the small-SF answer; these prove the *plan* is
the one that survives a 100× scale-up: columns pruned at the parquet
scan, predicates pushed, joins hash-based (never cartesian), and the
hot path free of row-at-a-time Python.
"""

from __future__ import annotations

import pytest


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_staging_projection_prunes_scan(spark, sf_dir):
    """A 2-column projection over stg_orders must not read all of
    orders/lineitem — ReadSchema should carry only the needed fields."""
    from dbt_jaffleshop_spark.models import staging

    df = staging.stg_orders(spark, sf_dir).select("order_id", "order_total_cents")
    plan = _plan(df)
    scans = [ln for ln in plan.splitlines() if "FileScan parquet" in ln]
    assert scans, "expected parquet scans in plan"
    orders_scans = [ln for ln in scans if "orders.parquet" in ln]
    # only the order key is needed from the orders file
    assert any("[o_orderkey" in ln and "o_orderpriority" not in ln for ln in orders_scans)
    # lineitem contributes exactly the join key + price column
    li = [ln for ln in scans if "lineitem.parquet" in ln]
    assert all("l_shipdate" not in ln and "l_returnflag" not in ln for ln in li)


def test_filter_pushdown_reaches_parquet(spark, sf_dir):
    from dbt_jaffleshop_spark.sources import load_table
    from pyspark.sql import functions as F

    df = load_table(spark, "documents", sf_dir).where(F.col("doc_id") < 10).select("doc_id")
    plan = _plan(df)
    assert "PushedFilters: [IsNotNull(doc_id), LessThan(doc_id,10)]" in plan


def test_order_items_uses_hash_joins_no_cartesian(spark, sf_dir):
    from dbt_jaffleshop_spark.models import marts_core

    plan = _plan(marts_core.order_items(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("BroadcastHashJoin" in plan) or ("SortMergeJoin" in plan)


def test_text_ops_stay_jvm_side(spark, sf_dir):
    """Text analysis must compile to Catalyst expressions — any
    BatchEvalPython/ArrowEvalPython span means a Python UDF crept into
    the hot path (the 10-100× slow path)."""
    from dbt_jaffleshop_spark.llm import text

    for fn in (text.text_token_stats, text.text_quality, text.text_langid,
               text.text_fingerprint):
        plan = _plan(fn(spark, sf_dir))
        assert "EvalPython" not in plan, f"{fn.__name__} uses a Python UDF"


def test_r4_operators_stay_jvm_side_no_cartesian(spark, sf_dir):
    """The round-4 operators must hold the same scale contract: no
    Python in the hot path, no cartesian product, and the tf-idf top-k
    window pruned by WindowGroupLimit (partial top-k before the
    exchange). (sim_knn_classify is excluded: its broadcast
    nested-loop scoring is the labeled eval-scale baseline.)"""
    from dbt_jaffleshop_spark.llm import prep, text

    for fn in (prep.doc_dup_grams, prep.corpus_source_stats,
               prep.doc_cdc_chunks, text.text_tfidf_topk):
        plan = _plan(fn(spark, sf_dir))
        assert "EvalPython" not in plan, f"{fn.__name__} uses a Python UDF"
        assert "CartesianProduct" not in plan, fn.__name__

    assert "WindowGroupLimit" in _plan(text.text_tfidf_topk(spark, sf_dir))


def test_dedup_jaccard_no_python_and_hash_joins(spark, sf_dir):
    from dbt_jaffleshop_spark.llm import dedup

    plan = _plan(dedup.dedup_ngram_jaccard(spark, sf_dir))
    assert "EvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_sessionize_single_user_shuffle(spark, sf_dir):
    """Both windows and the final groupBy key on user_id — the plan must
    not shuffle more than twice (window partition + final agg reuse)."""
    from dbt_jaffleshop_spark.llm import events

    plan = _plan(events.events_sessionize(spark, sf_dir))
    n_exchanges = plan.count("Exchange hashpartitioning")
    assert n_exchanges <= 2, f"expected ≤2 shuffles, saw {n_exchanges}"


def test_multimodal_is_arrow_batched(spark, sf_dir):
    """The one intentional Python stage must be the Arrow mapInPandas
    path, not row-at-a-time BatchEvalPython."""
    from dbt_jaffleshop_spark.llm import multimodal

    plan = _plan(multimodal.multimodal_extract(spark, sf_dir))
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan


def test_r5_operators_stay_jvm_side_no_cartesian(spark, sf_dir):
    """Round-5 additions hold the scale contract: transitions, Zipf
    head, and the table profile are pure Catalyst plans; the Zipf global
    top-k is WindowGroupLimit-pruned (partial top-25 per partition
    before the single-partition exchange); the profile computes every
    column's stats over ONE scan (multi-distinct via Expand)."""
    from dbt_jaffleshop_spark.llm import events, text
    from dbt_jaffleshop_spark.testing import profile

    from dbt_jaffleshop_spark.llm import similarity

    for fn in (events.events_transition_topk, text.text_zipf_topk,
               profile.orders_profile, profile.orders_quantiles,
               similarity.emb_kmeans_iter):
        plan = _plan(fn(spark, sf_dir))
        assert "EvalPython" not in plan, f"{fn.__name__} uses a Python UDF"
        assert "CartesianProduct" not in plan, fn.__name__
        if fn not in (text.text_zipf_topk, similarity.emb_kmeans_iter):
            # zipf's ONE nested-loop join is the sanctioned 1-row
            # broadcast of the corpus total onto the 25-row head;
            # emb_kmeans_iter's is the sanctioned 16-row centroid
            # broadcast in the shared _assign_cells E-step (the same
            # scale-safe IVF assignment sim_ivf_topk uses)
            assert "BroadcastNestedLoopJoin" not in plan, fn.__name__

    zipf = _plan(text.text_zipf_topk(spark, sf_dir))
    assert ("TakeOrderedAndProject(limit=25" in zipf) or (
        "WindowGroupLimit" in zipf
    ), "zipf global top-k not pruned before the single-partition stage"
    prof = _plan(profile.orders_profile(spark, sf_dir))
    assert prof.count("FileScan parquet") == 1
    assert "Expand" in prof


def _logical_nodes(df):
    """Every node of the optimized LOGICAL plan (depth-first), as py4j
    objects — the logical tree is stable under AQE, unlike executedPlan."""

    def walk(node):
        yield node
        children = node.children()
        for i in range(children.size()):
            yield from walk(children.apply(i))

    yield from walk(df._jdf.queryExecution().optimizedPlan())


def test_global_rank_windows_only_over_aggregated_relations(spark, sf_dir):
    """W2 skew contract: a GLOBAL (un-partitioned) row_number window
    funnels every input row through ONE task, so it is only scale-safe
    when its input is an already-aggregated, dimension-cardinality
    relation. jaffle_products' four ranking windows satisfy this today
    (they rank product_performance, |products| rows); this pins it so a
    refactor that ranks the raw fact table fails loudly: every Window
    with an empty partitionSpec must have an Aggregate below it in the
    optimized plan."""
    from dbt_jaffleshop_spark.models import marts_analytics

    df = marts_analytics.products(spark, sf_dir)
    global_windows = [
        n for n in _logical_nodes(df)
        if n.nodeName() == "Window" and n.partitionSpec().size() == 0
    ]
    assert global_windows, "expected the ranking windows in the plan"
    for w in global_windows:
        subtree = {
            n.nodeName()
            for child_i in range(w.children().size())
            for n in _walk_node(w.children().apply(child_i))
        }
        assert "Aggregate" in subtree, (
            "global window ranks a non-aggregated relation — "
            f"subtree nodes: {sorted(subtree)}"
        )


def _walk_node(node):
    yield node
    children = node.children()
    for i in range(children.size()):
        yield from _walk_node(children.apply(i))


def test_salted_join_equals_plain_join(spark):
    """salted_join must be row-identical to the plain join on skewed
    data, and its shuffle key must include the salt (N-way spread of the
    hot key's work)."""
    from pyspark.sql import functions as F

    from dbt_jaffleshop_spark.functions.joins import salted_join

    # one dominant key (90% of rows) + a long tail
    fact = spark.range(0, 10_000).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id")).alias("k"),
    )
    dim = spark.range(0, 10_000, 7).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    plain = fact.join(dim, "k", "left").select("row_id", "k", "v")
    salted = salted_join(fact, dim, on=["k"], salt_cols=["row_id"], how="left").select(
        "row_id", "k", "v"
    )
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
    plan = _plan(salted)
    assert "__salt" in plan  # the join key carries the salt


def test_r4b_operators_stay_jvm_side_no_cartesian(spark, sf_dir):
    """This round's additions hold the same scale contract: segment
    dedup, mix sampling, LM scoring, stickiness, and the SCD2 snapshot
    are pure Catalyst plans with hash joins only; emb_project is a
    zero-shuffle scan."""
    from dbt_jaffleshop_spark.llm import events, prep, text
    from dbt_jaffleshop_spark.plans import snapshots

    for fn in (prep.corpus_segment_dedup, prep.corpus_mix_sample,
               prep.emb_project, text.text_lm_score,
               events.events_stickiness, snapshots.jaffle_orders_snapshot):
        plan = _plan(fn(spark, sf_dir))
        assert "EvalPython" not in plan, f"{fn.__name__} uses a Python UDF"
        assert "CartesianProduct" not in plan, fn.__name__

    # emb_project is a pure per-row scan: no exchange at all
    assert "Exchange" not in _plan(prep.emb_project(spark, sf_dir))
    # stickiness computes the sliding-window distinct via an explode +
    # aggregation — the non-equi range join a naive formulation would
    # plan as a nested loop must NOT appear
    sticky = _plan(events.events_stickiness(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in sticky
    assert "Generate explode" in sticky
