from archivesspace_virgo_spark.index.build import build_index
from archivesspace_virgo_spark.index.multi import MultiIndexEngine
from archivesspace_virgo_spark.index.query import QueryEngine
from archivesspace_virgo_spark.index.query_parser import parse_query

__all__ = ["build_index", "MultiIndexEngine", "QueryEngine", "parse_query"]
