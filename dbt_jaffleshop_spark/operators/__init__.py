"""Operator index.

This engine expresses every operator as composable DataFrame functions
organized by layer rather than as a flat operator library — the layer
determines reuse, materialization, and testing policy:

* relational operators over the jaffle pipeline → ``models/``
  (staging projections, join shapes J1–J7, aggregations A1–A12,
  windows W1–W5, scalar families F1–F14)
* declarative test operators T1–T7 → ``testing/generic.py`` /
  ``testing/unit.py``
* semantic-layer query generation M1–M7 → ``semantic/``
* LLM-data-pipeline operators (dedup, similarity, text, multimodal,
  events incl. the as-of join) → ``llm/``
* Structured Streaming operators → ``streaming/``

``PARITY.md`` (repo root) maps every SURVEY §2 operator ID to its
implementation and driver-checked query.
"""
