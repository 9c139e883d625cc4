"""Seed CSV ingestion (SURVEY §2.1 S2; reference: dbt_project.yml:25-29).

The reference loads ``seeds/jaffle-data/*.csv`` into warehouse tables in a
``raw`` schema (schema routing via macros/generate_schema_name.sql:6-7).
Engine analogue: explicit-schema CSV read → saveAsTable/temp view. Explicit
schemas, never inferSchema, so a 100 TB CSV drop doesn't pay a full
inference pass and types are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def load_seed_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    view_name: str | None = None,
) -> DataFrame:
    df = spark.read.csv(path, header=True, schema=schema, mode="FAILFAST")
    if view_name:
        # Schema routing policy: seeds land in the `raw` namespace, mirrored
        # here as a view-name prefix (macros/generate_schema_name.sql:6-7).
        df.createOrReplaceTempView(f"raw_{view_name}" if not view_name.startswith("raw_") else view_name)
    return df
