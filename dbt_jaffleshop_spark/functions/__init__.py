from .money import cents_to_dollars, dollars_to_cents, cents_to_dollars_double
from .keys import surrogate_key
from .dates import date_spine, day, month_start, week_start
from .ladders import safe_divide, tier

__all__ = [
    "cents_to_dollars",
    "cents_to_dollars_double",
    "dollars_to_cents",
    "surrogate_key",
    "date_spine",
    "day",
    "week_start",
    "month_start",
    "safe_divide",
    "tier",
]
