from .parity import canonical_rows, compare_frames
from .generic import (
    accepted_values,
    expression_is_true,
    not_null,
    relationships,
    unique,
    run_checks,
)

__all__ = [
    "canonical_rows",
    "compare_frames",
    "not_null",
    "unique",
    "accepted_values",
    "relationships",
    "expression_is_true",
    "run_checks",
]
