"""dbt-audit-helper analogue (r6): compare_relations semantics, oracle
parity of the registered drift-diff pair, and the 100 TB plan shape.
Reference: packages.yml:6 declares dbt-audit-helper; README.md:54-57 is
the write-audit-publish workflow this implements."""

from __future__ import annotations

from conftest import assert_parity


def test_compare_relations_semantics(spark):
    """Planted micro-case covering every audit outcome: pk only in a,
    pk only in b, value match, value mismatch, and NULL-safe equality
    (both-NULL matches; NULL vs value mismatches)."""
    from dbt_jaffleshop_spark.testing.audit import compare_relations

    a = spark.createDataFrame(
        [(1, "x", 10), (2, "y", None), (3, None, 30), (4, "w", 40)],
        "pk long, s string, v long",
    )
    b = spark.createDataFrame(
        [(1, "x", 10), (2, "z", None), (3, "q", 30), (5, "e", 50)],
        "pk long, s string, v long",
    )
    summary, mism = compare_relations(a, b, "pk", ["s", "v"])
    rows = {r.col_name: r for r in summary.collect()}
    for col in ("s", "v"):
        assert rows[col].n_pk_only_a == 1  # pk 4
        assert rows[col].n_pk_only_b == 1  # pk 5
        assert rows[col].n_pk_both == 3
    # s: pk1 match, pk2 y≠z, pk3 NULL≠q
    assert rows["s"].n_matched == 1 and rows["s"].n_mismatched == 2
    assert rows["s"].match_bp == 3333
    # v: pk1 match, pk2 NULL<=>NULL match, pk3 match
    assert rows["v"].n_matched == 3 and rows["v"].n_mismatched == 0
    assert rows["v"].match_bp == 10000
    m = {(r.col_name, r.pk): (r.a_repr, r.b_repr) for r in mism.collect()}
    assert m == {("s", 2): ("y", "z"), ("s", 3): (None, "q")}


def test_audit_compare_relations_matches_oracle(spark, oracle, sf_dir):
    from dbt_jaffleshop_spark.testing import audit

    assert_parity(
        audit.audit_compare_relations(spark, sf_dir),
        oracle,
        audit.ORACLES["audit_compare_relations"],
    )


def test_audit_mismatch_sample_matches_oracle(spark, oracle, sf_dir):
    from dbt_jaffleshop_spark.testing import audit

    assert_parity(
        audit.audit_mismatch_sample(spark, sf_dir),
        oracle,
        audit.ORACLES["audit_mismatch_sample"],
    )


def test_audit_drift_is_actually_planted(spark, sf_dir):
    """The registered pair must exercise every outcome class at the test
    scale — an audit fixture where every row matches verifies nothing."""
    from dbt_jaffleshop_spark.testing import audit

    rows = {r.col_name: r for r in
            audit.audit_compare_relations(spark, sf_dir).collect()}
    assert any(r.n_pk_only_a > 0 for r in rows.values())
    assert any(r.n_pk_only_b > 0 for r in rows.values())
    assert rows["o_orderstatus"].n_mismatched > 0
    assert rows["o_totalprice_cents"].n_mismatched > 0
    assert rows["o_orderdate"].n_mismatched > 0
    # untouched columns stay fully matched over the shared keys
    assert rows["o_custkey"].n_mismatched == 0
    assert rows["o_custkey"].match_bp == 10000


def test_audit_plan_shape(spark, sf_dir):
    """100 TB contract: the summary is ONE full-outer hash join on the
    PK + explode + partial-aggregated groupBy — no windows, no Python,
    no cartesian; the sample's per-column top-k is WindowGroupLimit-
    pruned so no task holds more than k·partitions mismatch candidates."""
    from dbt_jaffleshop_spark.testing import audit

    summary_plan = audit.audit_compare_relations(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in summary_plan
    assert "CartesianProduct" not in summary_plan
    assert "BroadcastNestedLoopJoin" not in summary_plan
    assert "Window" not in summary_plan
    assert "FullOuter" in summary_plan

    sample_plan = audit.audit_mismatch_sample(
        spark, sf_dir
    )._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in sample_plan
    assert "CartesianProduct" not in sample_plan
    assert "WindowGroupLimit" in sample_plan


def test_compare_relation_columns(spark):
    """Schema diff: columns aligned by name with per-side presence,
    types, and a match flag — metadata-only, no job runs."""
    from dbt_jaffleshop_spark.testing.audit import compare_relation_columns

    a = spark.createDataFrame([], "pk long, x string, y double")
    b = spark.createDataFrame([], "pk long, x int, z string")
    rows = {r["col_name"]: r for r in compare_relation_columns(a, b)}
    assert rows["pk"]["type_match"] and rows["pk"]["in_a"] and rows["pk"]["in_b"]
    assert rows["x"]["in_a"] and rows["x"]["in_b"] and not rows["x"]["type_match"]
    assert rows["x"]["a_type"] == "string" and rows["x"]["b_type"] == "int"
    assert rows["y"]["in_a"] and not rows["y"]["in_b"] and not rows["y"]["type_match"]
    assert rows["z"]["in_b"] and not rows["z"]["in_a"]
    # a's column order first, then b-only extras
    assert [r["col_name"] for r in compare_relation_columns(a, b)] == [
        "pk", "x", "y", "z"
    ]
