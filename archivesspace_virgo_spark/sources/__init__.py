from archivesspace_virgo_spark.sources.snapshot_table import (
    SnapshotTable,
    read_iceberg,
    wrap_parquet_dir,
)

__all__ = ["SnapshotTable", "read_iceberg", "wrap_parquet_dir"]
