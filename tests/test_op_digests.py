"""Operator-group digests (queries/op_digests.py): Spark↔DuckDB parity
plus schema-drift pinning for the normalization schemas."""

from __future__ import annotations

import pytest

from dbt_jaffleshop_spark.queries.op_digests import (
    _GROUP_SPECS,
    _TEST_MEMBERS,
    OP_DIGEST_CATALOG,
)
from tests.conftest import assert_parity


@pytest.mark.parametrize("name", list(OP_DIGEST_CATALOG))
def test_digest_parity(spark, oracle, sf_dir, name):
    fn, sql = OP_DIGEST_CATALOG[name]
    assert_parity(fn(spark, sf_dir), oracle, sql)


def test_tests_digest_covers_five_green_tests(spark, sf_dir):
    rows = {
        r.model_name: r for r in
        OP_DIGEST_CATALOG["jaffle_tests_digest"][0](spark, sf_dir).collect()
    }
    assert set(rows) == set(_TEST_MEMBERS)
    # valid data: every test query returns zero violation rows
    assert all(r.n_rows == 0 and r.content_digest == 0 for r in rows.values())


def test_declared_schemas_match_live_dataframes(spark, sf_dir):
    """The normalization schemas embedded in the oracle SQL must track the
    live DataFrame column names/order — drift here silently weakens the
    digest, so it fails loudly instead. Double-awareness is also pinned:
    a column declared non-double that is live-double would stringify
    engine-dependently and flip the digest."""
    for name, (fn, schema) in _TEST_MEMBERS.items():
        live = fn(spark, sf_dir).columns
        assert [c for c, _ in schema] == live, name
    for group, members in _GROUP_SPECS.items():
        for name, (fn, schema, _sql) in members.items():
            df = fn(spark, sf_dir)
            assert [c for c, _ in schema] == df.columns, (group, name)
            live_types = {
                f.name: f.dataType.simpleString() for f in df.schema.fields
            }
            for col, t in schema:
                assert (t == "double") == (live_types[col] == "double"), (
                    group, name, col,
                )
