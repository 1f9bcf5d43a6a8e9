from mapreduce_rust_spark.sources.tables import TABLE_NAMES, load_table, load_tables
from mapreduce_rust_spark.sources.text import (
    list_input_files,
    read_lines_numbered,
    read_whole_files,
)

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "list_input_files",
    "read_lines_numbered",
    "read_whole_files",
]
