from archivesspace_virgo_spark.sources.snapshot_table import SnapshotTable

__all__ = ["SnapshotTable"]
