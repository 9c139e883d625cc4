"""Fixture-injection unit-test runner (SURVEY §2.9 T6).

The reference's unit tests (dbt `unit_tests:` blocks) replace each
ref()/source() input of ONE model with inline `given:` rows — columns not
listed default to NULL — run the model, and compare the full output rows
against `expect:` (subset of columns, order-insensitive).

Engine mechanism: model logic functions take their inputs as DataFrames
(the ``*_logic`` seams in models/), so a unit test builds tiny
``spark.createDataFrame`` fixtures against the declared input schema,
calls the logic, and set-compares the selected output columns.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def fixture_df(
    spark: SparkSession,
    schema: T.StructType,
    rows: list[dict[str, Any]],
) -> DataFrame:
    """Build a fixture DataFrame: every schema column exists; columns not
    mentioned in a row are NULL (dbt `given:` semantics)."""
    filled = [tuple(r.get(f.name) for f in schema.fields) for r in rows]
    return spark.createDataFrame(filled, schema)


def assert_rows_match(
    actual: DataFrame,
    expect: list[dict[str, Any]],
    columns: list[str] | None = None,
) -> None:
    """Order-insensitive comparison of `expect:` rows against the model
    output, projected to the expected columns (dbt compares only declared
    expect columns)."""
    cols = columns or sorted({k for r in expect for k in r})
    got = sorted(
        tuple(row[c] for c in cols) for row in actual.select(*cols).collect()
    )
    want = sorted(tuple(r.get(c) for c in cols) for r in expect)
    assert got == want, f"unit test mismatch\n  columns: {cols}\n  got:  {got}\n  want: {want}"
