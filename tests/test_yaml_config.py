"""Declarative YAML test surface: parser contract + registry parity."""

from __future__ import annotations

import pytest

from dbt_jaffleshop_spark.plans.yaml_config import load_model_tests


def test_yaml_covers_reference_test_inventory():
    """The YAML declares the reference's full generic-test surface:
    13 unique+not_null PK pairs, 3 relationships, 4 expression
    invariants, 1 accepted_values (SURVEY §5-1/2)."""
    suite = load_model_tests()
    names = [n for tests in suite.values() for n, _ in tests]
    assert len(names) == len(set(names))
    # every registered model carries the reference's unique+not_null PK
    # pair (the reference's sites plus the generated time spine)
    assert sum(n.startswith("not_null_") for n in names) == 15
    assert sum(n.startswith("unique_") for n in names) == 15
    assert sum(n.startswith("fk_") for n in names) == 3
    assert {"orders_conservation", "order_items_subtotal_matches",
            "order_total_conservation", "lifetime_conservation",
            "customer_type_values"} <= set(names)


def test_yaml_matches_dag_registry():
    """The DAG runner consumes exactly the YAML-declared tests."""
    from dbt_jaffleshop_spark.plans.dag import MODELS

    suite = load_model_tests()
    for model, spec in MODELS.items():
        assert [n for n, _ in spec.tests] == [n for n, _ in suite[model]]


def test_nested_arguments_form_is_required(tmp_path):
    """flags.require_generic_test_arguments_property rejects dbt's
    legacy inline-argument shape (dbt_project.yml:37-38 semantics)."""
    bad = tmp_path / "models.yml"
    bad.write_text(
        """
flags:
  require_generic_test_arguments_property: true
models:
  - name: m
    columns:
      - name: c
        data_tests:
          - accepted_values:
              values: [a, b]
"""
    )
    with pytest.raises(ValueError, match="nested `arguments:` form"):
        load_model_tests(str(bad))


def test_inline_arguments_accepted_without_flag(tmp_path):
    p = tmp_path / "models.yml"
    p.write_text(
        """
models:
  - name: m
    columns:
      - name: c
        data_tests:
          - accepted_values:
              values: [a, b]
"""
    )
    suite = load_model_tests(str(p))
    assert [n for n, _ in suite["m"]] == ["accepted_values_m_c"]


def test_yaml_factories_execute(spark):
    """A YAML-built factory runs the real generic test engine."""
    suite = load_model_tests()
    df = spark.createDataFrame([(1,), (1,), (None,)], "customer_id: long")
    failures = {
        name: fn({"stg_customers": df}).count()
        for name, fn in suite["stg_customers"]
    }
    assert failures == {
        "not_null_stg_customers_customer_id": 1,
        "unique_stg_customers_customer_id": 1,
    }
