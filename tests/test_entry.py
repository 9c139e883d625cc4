"""Smoke the driver contract exactly as the driver does."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as entrymod


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_catalog_keys_align(spark):
    q = entrymod.queries()
    o = entrymod.oracle_sql()
    assert q, "queries() must not be empty"
    unknown = set(o) - set(q)
    assert not unknown, f"oracle_sql keys missing from queries(): {unknown}"
