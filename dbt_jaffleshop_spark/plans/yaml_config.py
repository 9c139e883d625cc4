"""Declarative YAML test surface (SURVEY §2.9 / §3.1-1).

Parses ``config/models.yml`` — the engine analogue of the reference's
per-model schema YAML — into the ``(test_name, factory)`` tuples the DAG
runner attaches to each ModelSpec. Supported generic tests mirror the
reference exactly: ``not_null``, ``unique``, ``accepted_values``,
``relationships`` (left-anti), ``expression_is_true``.

Honors ``flags.require_generic_test_arguments_property`` (the nested
``arguments:`` form the reference opts into, dbt_project.yml:37-38):
when set, a parameterized test whose configuration carries anything but
``name``/``arguments`` keys — i.e. dbt's legacy inline-argument shape —
is rejected at load time.
"""

from __future__ import annotations

import os
import re
from collections.abc import Callable

import yaml

from ..testing import generic

_DEFAULT_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "config", "models.yml",
)

_REF_RE = re.compile(r"^ref\('([A-Za-z0-9_]+)'\)$")


def _parse_ref(to: str) -> str:
    m = _REF_RE.match(to.strip())
    if not m:
        raise ValueError(f"relationships `to` must be ref('<model>'): {to!r}")
    return m.group(1)


def _make_factory(test: str, model: str, column: str | None, args: dict):
    """Closure producing the violation-rows DataFrame from the
    materialized-model dict (the dag runner's `dfs`)."""
    if test == "not_null":
        return lambda dfs: generic.not_null(dfs[model], column)
    if test == "unique":
        return lambda dfs: generic.unique(dfs[model], column)
    if test == "accepted_values":
        values = args["values"]
        return lambda dfs: generic.accepted_values(dfs[model], column, values)
    if test == "relationships":
        parent = _parse_ref(args["to"])
        field = args["field"]
        return lambda dfs: generic.relationships(
            dfs[model], column, dfs[parent], field
        )
    if test == "expression_is_true":
        expression = args["expression"]
        return lambda dfs: generic.expression_is_true(dfs[model], expression)
    raise ValueError(f"unknown generic test {test!r} on {model}")


def _normalize(entry, model: str, column: str | None, require_args: bool):
    """One data_tests list element -> (test, name, args)."""
    if isinstance(entry, str):
        return entry, f"{entry}_{model}_{column}", {}
    if not (isinstance(entry, dict) and len(entry) == 1):
        raise ValueError(f"malformed test entry on {model}: {entry!r}")
    test, cfg = next(iter(entry.items()))
    cfg = cfg or {}
    extra = set(cfg) - {"name", "arguments"}
    if extra:
        if require_args:
            raise ValueError(
                f"{model}.{test}: inline arguments {sorted(extra)} rejected —"
                " flags.require_generic_test_arguments_property demands the"
                " nested `arguments:` form"
            )
        args = {k: v for k, v in cfg.items() if k != "name"}
    else:
        args = cfg.get("arguments", {}) or {}
    name = cfg.get("name") or f"{test}_{model}_{column or 'model'}"
    return test, name, args


_CONTRACTS_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "config", "contracts.yml",
)


def load_model_contracts(
    path: str = _CONTRACTS_PATH,
) -> dict[str, list[tuple[str, str]]]:
    """model name -> declared [(column, data_type)], for models whose
    contract is `enforced` (config/contracts.yml — the reference's
    per-model column declarations, dbt `contract: enforced` semantics)."""
    with open(path) as fh:
        doc = yaml.safe_load(fh)
    out: dict[str, list[tuple[str, str]]] = {}
    for m in doc.get("models", []):
        cfg = (m.get("config") or {}).get("contract") or {}
        if not cfg.get("enforced"):
            continue
        out[m["name"]] = [
            (c["name"], c["data_type"]) for c in m.get("columns", [])
        ]
    return out


def load_model_tests(
    path: str = _DEFAULT_PATH,
) -> dict[str, list[tuple[str, Callable]]]:
    """model name -> [(test_name, factory)] in declaration order."""
    with open(path) as fh:
        doc = yaml.safe_load(fh)
    require_args = bool(
        (doc.get("flags") or {}).get("require_generic_test_arguments_property")
    )
    out: dict[str, list[tuple[str, Callable]]] = {}
    for m in doc.get("models", []):
        model = m["name"]
        tests: list[tuple[str, Callable]] = []
        for col in m.get("columns", []):
            for entry in col.get("data_tests", []) or []:
                test, name, args = _normalize(
                    entry, model, col["name"], require_args
                )
                tests.append((name, _make_factory(test, model, col["name"], args)))
        for entry in m.get("data_tests", []) or []:
            test, name, args = _normalize(entry, model, None, require_args)
            tests.append((name, _make_factory(test, model, None, args)))
        out[model] = tests
    return out
