"""dbt-style ``ref()`` resolution (see models/__init__ docstring).

Outside a pipeline run, ``ref(name, builder, …)`` calls the builder —
every model is a self-contained lazy DataFrame. Inside
``plans.dag.run_pipeline``, a materialization context maps built model
names to their DataFrames (marts: the re-read of the written table), so
downstream models consume the materialized result instead of recomputing
the lineage — the reference's compute-once/read-many contract (`orders`
feeds 5 models, SURVEY §4.1). At 100 TB this is the difference between
reading a partitioned table and re-running its upstream join tree per
consumer.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame

_MATERIALIZED: dict[str, DataFrame] | None = None


@contextmanager
def materialization_context(tables: dict[str, DataFrame]):
    """Activate a name→DataFrame resolution table (see run_pipeline)."""
    global _MATERIALIZED
    prev = _MATERIALIZED
    _MATERIALIZED = tables
    try:
        yield
    finally:
        _MATERIALIZED = prev


def ref(name: str, builder, spark, sf_dir):
    """Resolve a model reference: materialized result if a pipeline run
    is active and has built it, else the lazy builder."""
    if _MATERIALIZED is not None and name in _MATERIALIZED:
        return _MATERIALIZED[name]
    return builder(spark, sf_dir)
