"""Source layer: seed CSV ingestion (S2/S6) and registry validation (S1)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from dbt_jaffleshop_spark.sources import load_table
from dbt_jaffleshop_spark.sources.seeds import load_seed_csv


@pytest.fixture()
def seed_csv(tmp_path):
    p = tmp_path / "raw_stores.csv"
    p.write_text(
        "id,name,opened_at,tax_rate\n"
        "s1,Philadelphia,2016-09-01T00:00:00,0.06\n"
        "s2,Brooklyn,2017-03-12T00:00:00,0.04\n"
    )
    return str(p)


SEED_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("opened_at", T.TimestampType()),
        T.StructField("tax_rate", T.DoubleType()),
    ]
)


def test_seed_csv_explicit_schema(spark, seed_csv):
    df = load_seed_csv(spark, seed_csv, SEED_SCHEMA)
    assert df.schema == SEED_SCHEMA
    rows = {r["id"]: r for r in df.collect()}
    assert rows["s1"]["tax_rate"] == 0.06
    assert rows["s2"]["name"] == "Brooklyn"


def test_seed_schema_routing_raw_namespace(spark, seed_csv):
    """Seeds land in the raw_ namespace (generate_schema_name.sql:6-7)."""
    load_seed_csv(spark, seed_csv, SEED_SCHEMA, view_name="stores")
    assert spark.table("raw_stores").count() == 2


def test_malformed_seed_fails_fast(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text("id,name,opened_at,tax_rate\nx,y,not_a_timestamp,zz\n")
    with pytest.raises(Exception):
        load_seed_csv(spark, str(p), SEED_SCHEMA).collect()


def test_registry_rejects_unknown_table(spark):
    with pytest.raises(KeyError):
        load_table(spark, "nope")


def test_source_freshness_t7(spark, sf_dir):
    """T7: events are fresh relative to an as-of just after the data's
    max ts, stale relative to a far-future as-of."""
    import datetime as dt

    from dbt_jaffleshop_spark.sources import load_table
    from dbt_jaffleshop_spark.testing.generic import source_freshness

    ev = load_table(spark, "events", sf_dir)
    fresh = source_freshness(
        ev, "ts", max_age_seconds=10 * 366 * 86400, as_of=dt.datetime(2025, 1, 1)
    )
    assert fresh.count() == 0
    stale = source_freshness(
        ev, "ts", max_age_seconds=86400, as_of=dt.datetime(2079, 1, 1)
    )
    rows = stale.collect()
    assert len(rows) == 1 and rows[0]["age_seconds"] > 86400
