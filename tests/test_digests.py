"""Digest queries: schema-sync guard + oracle parity per group."""

from __future__ import annotations

import pytest

from dbt_jaffleshop_spark.queries.digests import (
    BUILDERS,
    DIGEST_CATALOG,
    DIGEST_GROUPS,
    MODEL_SCHEMAS,
)

from conftest import assert_parity


def test_schemas_current(spark, sf_dir):
    """The static MODEL_SCHEMAS table (which generates the DuckDB oracle
    normalization) must match the live DataFrame schemas exactly — drift
    here would silently weaken the digest."""
    for model, declared in MODEL_SCHEMAS.items():
        df = BUILDERS[model](spark, sf_dir)
        live = [(f.name, f.dataType.simpleString()) for f in df.schema.fields]
        assert live == declared, f"{model}: schema drift {live} != {declared}"


def test_groups_cover_builders():
    grouped = [m for ms in DIGEST_GROUPS.values() for m in ms]
    assert sorted(grouped) == sorted(BUILDERS)
    assert len(grouped) == len(set(grouped))


@pytest.mark.parametrize("group", sorted(DIGEST_GROUPS))
def test_digest_parity(spark, oracle, sf_dir, group):
    fn, sql = DIGEST_CATALOG[group]
    assert_parity(fn(spark, sf_dir), oracle, sql)


def test_digest_detects_mutation(spark, sf_dir):
    """A single changed value must change the digest (sanity: the digest is
    a real content check, not a row count)."""
    from pyspark.sql import functions as F

    from dbt_jaffleshop_spark.queries.digests import _digest_df

    df = BUILDERS["stg_customers"](spark, sf_dir)
    base = _digest_df(df, "stg_customers").collect()[0]
    mutated = df.withColumn(
        "customer_name",
        F.when(F.col("customer_id") == df.select(F.min("customer_id")).collect()[0][0],
               F.lit("MUTATED")).otherwise(F.col("customer_name")),
    )
    changed = _digest_df(mutated, "stg_customers").collect()[0]
    assert base["n_rows"] == changed["n_rows"]
    assert base["content_digest"] != changed["content_digest"]
