from .catalog import TABLES, load_table, load_tables, register_views
from .readers import read_csv, read_parquet
from .sinks import write_csv, write_parquet

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "read_csv",
    "read_parquet",
    "write_csv",
    "write_parquet",
]
