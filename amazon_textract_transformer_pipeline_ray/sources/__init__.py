"""Sources: column-pruned parquet readers and broadcast helpers."""
