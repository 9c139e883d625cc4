"""LLM-data-pipeline operators (beyond-reference extensions): dedup,
similarity search, text analysis, multimodal plumbing, event analytics.

`LLM_CATALOG` maps query name → (callable, oracle_sql | None) for
registration in queries/catalog.py. Every operator here carries an exact
DuckDB oracle — including the approximate (LSH/SimHash) ones, whose
oracles run the identical fixed-seed algorithm.
"""

from __future__ import annotations

from collections.abc import Callable

from . import corpus, dedup, events, multimodal, similarity, text

LLM_CATALOG: dict[str, tuple[Callable, str | None]] = {}

# registration order = driver check order; the cheap text scans go LAST
# so that if the driver's budget truncates anything, it is the ~0.5 s
# queries, not the heavy dedup/streaming evidence.
for _mod in (dedup, corpus, similarity, events, multimodal, text):
    for _name, _sql in _mod.ORACLES.items():
        LLM_CATALOG[_name] = (getattr(_mod, _name), _sql)
