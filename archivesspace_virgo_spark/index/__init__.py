from archivesspace_virgo_spark.index.build import build_index
from archivesspace_virgo_spark.index.query import QueryEngine

__all__ = ["build_index", "QueryEngine"]
