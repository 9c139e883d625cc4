from .registry import TESTDATA_TABLES, load_table, register_testdata
from .seeds import load_seed_csv

__all__ = ["TESTDATA_TABLES", "load_table", "register_testdata", "load_seed_csv"]
