"""Round-14 optimization equivalence pins.

Each optimization here is plan REUSE or job OVERLAP — never a semantic
change — so every test asserts byte-identical values between the
optimized path and an unshared per-member rebuild:

* rollups digest: ONE cached order_items→orders chain shared by all six
  members (digests.py materialization context + semantic ref routing)
  == independent per-member builds.
* tests digest: shared cached orders/customers chain == independent
  builds of the five test members.
* op-digest thread-pool construction preserves member order and values
  (acid_digest exercised at sf0.001 — the heaviest eager group).
* semantic MetricQuery.to_df resolves its mart through ref(): inside a
  materialization context the provided frame IS the input (pinned by
  substituting a marker mart).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbt_jaffleshop_spark.models.base import release_cached


def _rows(df: DataFrame) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def test_rollups_digest_shared_chain_matches_unshared(spark, sf_dir):
    from dbt_jaffleshop_spark.queries.digests import (
        BUILDERS,
        DIGEST_GROUPS,
        _digest_df,
        DIGEST_CATALOG,
    )

    release_cached(spark)
    shared = _rows(DIGEST_CATALOG["jaffle_rollups_digest"][0](spark, sf_dir))
    release_cached(spark)
    unshared = sorted(
        tuple(r)
        for m in DIGEST_GROUPS["jaffle_rollups_digest"]
        for r in _digest_df(BUILDERS[m](spark, sf_dir), m).collect()
    )
    release_cached(spark)
    assert shared == unshared


def test_tests_digest_shared_chain_matches_unshared(spark, sf_dir):
    from dbt_jaffleshop_spark.queries.op_digests import (
        _TEST_MEMBERS,
        jaffle_tests_digest,
    )
    from dbt_jaffleshop_spark.queries.digests import digest_df

    release_cached(spark)
    shared = _rows(jaffle_tests_digest(spark, sf_dir))
    release_cached(spark)
    unshared = sorted(
        tuple(r)
        for name, (fn, schema) in _TEST_MEMBERS.items()
        for r in digest_df(fn(spark, sf_dir), name, schema).collect()
    )
    release_cached(spark)
    assert shared == unshared


def test_parallel_group_build_preserves_order_and_values(spark, sf_dir):
    from dbt_jaffleshop_spark.queries.digests import digest_df
    from dbt_jaffleshop_spark.queries.op_digests import (
        _GROUP_SPECS,
        OP_DIGEST_CATALOG,
    )

    release_cached(spark)
    group_df = OP_DIGEST_CATALOG["acid_digest"][0](spark, sf_dir)
    # member order in the union must equal the spec's declared order
    # (pool.map preserves input order) — asserted UNSORTED (r14 ADVICE:
    # the sorted compare could not detect an order regression); each
    # member contributes exactly one digest row, and collect() returns
    # the union's parts in order
    names = [r["model_name"] for r in group_df.select("model_name").collect()]
    assert names == list(_GROUP_SPECS["acid_digest"])
    got = _rows(group_df)
    release_cached(spark)
    want = sorted(
        tuple(r)
        for name, (fn, schema, _sql) in _GROUP_SPECS["acid_digest"].items()
        for r in digest_df(fn(spark, sf_dir), name, schema).collect()
    )
    release_cached(spark)
    assert got == want


def test_semantic_to_df_resolves_mart_through_ref(spark, sf_dir):
    from dbt_jaffleshop_spark.models import materialization_context
    from dbt_jaffleshop_spark.models import marts_core
    from dbt_jaffleshop_spark.semantic.jaffle_models import SAVED_QUERIES

    q = SAVED_QUERIES["sq_orders_by_location"]
    base = q.to_df(spark, sf_dir)
    # substitute the mart with a single-location slice: ref() resolution
    # means the request must now aggregate the SLICE, not the rebuilt
    # full mart
    full = marts_core.orders(spark, sf_dir)
    one_loc = full.where(F.col("location_id") == full.select(
        F.min("location_id")
    ).collect()[0][0])
    with materialization_context({"orders": one_loc}):
        sliced = q.to_df(spark, sf_dir)
    assert sliced.count() == 1
    assert base.count() > 1
