"""Sources & sinks (SURVEY §2.1, S1–S10)."""

from .catalog import load_tables, table
from .readers import read_csv, read_jdbc, read_parquet
from .state_reader import state_metadata, state_rows

__all__ = [
    "load_tables",
    "table",
    "read_csv",
    "read_parquet",
    "read_jdbc",
    "state_metadata",
    "state_rows",
]
