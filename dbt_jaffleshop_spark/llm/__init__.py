"""LLM-data-pipeline operators (beyond-reference extensions): dedup,
similarity search, text analysis, multimodal plumbing, event analytics.

`LLM_CATALOG` maps query name → (callable, oracle_sql | None) for
registration in queries/catalog.py. Every operator here carries an exact
DuckDB oracle — including the approximate (LSH/SimHash) ones, whose
oracles run the identical fixed-seed algorithm.
"""

from __future__ import annotations

from collections.abc import Callable

from . import dedup, events, multimodal, similarity, text

LLM_CATALOG: dict[str, tuple[Callable, str | None]] = {}

for _mod in (text, dedup, similarity, events, multimodal):
    for _name, _sql in _mod.ORACLES.items():
        LLM_CATALOG[_name] = (getattr(_mod, _name), _sql)
