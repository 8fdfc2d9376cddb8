from .io import (
    read_csv_with_declared_schema,
    save_data,
    scan_data,
    write_bucketed,
    write_compacted,
    write_sized,
    rebalance_scan,
    write_sorted,
    write_zorder,
)

__all__ = [
    "read_csv_with_declared_schema",
    "save_data",
    "scan_data",
    "write_bucketed",
    "write_compacted",
    "write_sized",
    "rebalance_scan",
    "write_sorted",
    "write_zorder",
]
