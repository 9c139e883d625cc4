"""Money expressions (reference: macros/cents_to_dollars.sql:3-21).

The reference's macro compiles ``({col} / 100)::numeric(16,2)`` per
warehouse dialect; here the "macro language" is Python returning Columns.

Exactness policy (SURVEY §7.4 "exact-decimal parity"): money is carried as
integer **cents** (LongType) through all arithmetic — sums/differences of
longs are exact and order-independent, so aggregations are deterministic
under any shuffle/partitioning. Conversion to dollars happens once at the
output edge: either as DecimalType(16,2) (reference parity) or as a double
``cents / 100.0`` (bit-deterministic across engines, used for the DuckDB
oracle comparisons).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cents_to_dollars(col: Column | str) -> Column:
    """Cents (int) → dollars as DECIMAL(16,2) — the reference's type."""
    c = F.col(col) if isinstance(col, str) else col
    return (c / 100.0).cast(T.DecimalType(16, 2))


def cents_to_dollars_double(col: Column | str) -> Column:
    """Cents (int) → dollars as double.

    ``long / 100.0`` is a single IEEE division — identical in Spark and
    DuckDB given identical cents, hence hash-stable for the oracle gate.
    """
    c = F.col(col) if isinstance(col, str) else col
    return c / F.lit(100.0)


def dollars_to_cents(col: Column | str) -> Column:
    """2-decimal dollars stored as double → exact integer cents.

    ``round(x * 100, 0)`` then cast: the true value is an integer, the
    double error is ~1 ulp, so round() recovers it exactly; both Spark and
    DuckDB compute the identical product and round half-up for positives.
    (Direct cast double→bigint would diverge: Spark truncates, DuckDB
    rounds.)
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100, 0).cast(T.LongType())
