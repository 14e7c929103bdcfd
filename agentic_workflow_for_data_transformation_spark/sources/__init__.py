from .io import (
    read_csv,
    read_events,
    read_json,
    read_parquet_table,
    read_tables,
    write_csv_dir,
    write_csv_single,
    write_json_dir,
    write_parquet,
    unique_output_path,
    records_sample,
    TPCH_TABLES,
)

__all__ = [
    "read_csv",
    "read_events",
    "read_json",
    "read_parquet_table",
    "read_tables",
    "write_csv_dir",
    "write_csv_single",
    "write_json_dir",
    "write_parquet",
    "unique_output_path",
    "records_sample",
    "TPCH_TABLES",
]
