"""Driver-facing query catalog: queries() + oracle_sql() (see catalog.py)."""
