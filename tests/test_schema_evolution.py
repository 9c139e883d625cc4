"""Additive schema evolution on AcidTable (r11b): ``append(...,
merge_schema=True)`` evolves the MANIFEST schema — new columns join at
the end, omitted stored columns null-fill, type changes are refused —
and old files are never rewritten: evolved snapshots read through the
manifest schema, so pre-evolution files surface typed nulls for added
columns. At 100 TB an added column costs one manifest commit, not a
corpus rewrite (Delta's mergeSchema contract, manifest-level)."""

import os

import pytest

from dbt_jaffleshop_spark.plans.acid import AcidTable


def _t(tmp_path, name="tbl"):
    return AcidTable(os.path.join(str(tmp_path), name))


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_schema_append_adds_column(spark, tmp_path):
    t = _t(tmp_path)
    t.append(spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string"))
    v0 = t.current_version()
    t.append(
        spark.createDataFrame([(3, "c", 30)], "id bigint, v string, score int"),
        merge_schema=True,
    )

    got = t.read(spark)
    assert got.columns == ["id", "v", "score"]
    assert _rows(got) == [(1, "a", None), (2, "b", None), (3, "c", 30)]
    assert t.manifest().get("meta", {}).get("evolved") is True
    assert t.manifest()["meta"]["schema"] == {
        "id": "bigint", "v": "string", "score": "int",
    }
    # time travel: the pre-evolution snapshot keeps its original schema
    assert t.read(spark, version=v0).columns == ["id", "v"]


def test_merge_schema_null_fills_omitted_stored_columns(spark, tmp_path):
    t = _t(tmp_path)
    t.append(spark.createDataFrame([(1, "a")], "id bigint, v string"))
    # the evolving write omits `v` AND adds `score`
    t.append(
        spark.createDataFrame([(2, 20)], "id bigint, score int"),
        merge_schema=True,
    )
    assert _rows(t.read(spark).select("id", "v", "score")) == [
        (1, "a", None),
        (2, None, 20),
    ]


def test_merge_schema_refuses_type_changes(spark, tmp_path):
    t = _t(tmp_path)
    t.append(spark.createDataFrame([(1, "a")], "id bigint, v string"))
    with pytest.raises(ValueError, match="additive-only"):
        t.append(
            spark.createDataFrame([(2, 2)], "id bigint, v int"),
            merge_schema=True,
        )


def test_plain_append_after_evolution_requires_evolved_schema(spark, tmp_path):
    t = _t(tmp_path)
    t.append(spark.createDataFrame([(1, "a")], "id bigint, v string"))
    t.append(
        spark.createDataFrame([(2, "b", 20)], "id bigint, v string, score int"),
        merge_schema=True,
    )
    # the PRE-evolution shape is now a schema drift — fail loudly
    with pytest.raises(ValueError, match="does not match table schema"):
        t.append(spark.createDataFrame([(3, "c")], "id bigint, v string"))
    # a full-evolved-schema append works, and the sticky marker keeps
    # the read projecting the pre-evolution files
    t.append(
        spark.createDataFrame([(3, "c", 30)], "id bigint, v string, score int")
    )
    assert t.manifest().get("meta", {}).get("evolved") is True
    assert _rows(t.read(spark)) == [
        (1, "a", None), (2, "b", 20), (3, "c", 30),
    ]


def test_evolution_on_partitioned_table_keeps_partition_reads(spark, tmp_path):
    t = _t(tmp_path)
    t.append(
        spark.createDataFrame([(1, "a", 0), (2, "b", 1)], "id bigint, v string, p int"),
        partition_by=["p"],
    )
    t.append(
        spark.createDataFrame(
            [(3, "c", 0, 30)], "id bigint, v string, p int, score int"
        ),
        merge_schema=True,
    )
    got = t.read(spark)
    assert _rows(got.select("id", "v", "p", "score")) == [
        (1, "a", 0, None), (2, "b", 1, None), (3, "c", 0, 30),
    ]
    # partition pruning survives the explicit-schema read path
    plan = (
        got.where(got.p == 0)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PartitionFilters" in plan and "p" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0], plan


def test_pinned_base_and_partition_replace_carry_evolved_flag(spark, tmp_path):
    t = _t(tmp_path)
    t.append(
        spark.createDataFrame([(1, "a", 0)], "id bigint, v string, p int"),
        partition_by=["p"],
    )
    t.append(
        spark.createDataFrame(
            [(2, "b", 1, 20)], "id bigint, v string, p int, score int"
        ),
        merge_schema=True,
    )
    base_v = t.current_version()
    t.append_from(
        spark.createDataFrame(
            [(3, "c", 1, 30)], "id bigint, v string, p int, score int"
        ),
        base_v,
    )
    assert t.manifest().get("meta", {}).get("evolved") is True
    t.overwrite_partitions(
        spark.createDataFrame(
            [(4, "d", 1, 40)], "id bigint, v string, p int, score int"
        ),
        "p",
        [1],
    )
    assert t.manifest().get("meta", {}).get("evolved") is True
    # partition 0 still holds a pre-evolution file — the projection must
    # survive both commit flavors
    assert _rows(t.read(spark).select("id", "v", "p", "score")) == [
        (1, "a", 0, None), (4, "d", 1, 40),
    ]
