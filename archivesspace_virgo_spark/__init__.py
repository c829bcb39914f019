"""archivesspace_virgo_spark — a PySpark-native inverted-index + BM25 engine.

A from-scratch re-expression of the capability surface of
``uvalib/archivesspace-virgo`` (reference at /root/reference): the reference is
an indexing-pipeline feeder that emits Solr documents and delegates the actual
search-engine work (tokenization, posting lists, BM25, top-k, facets) to
Solr/Lucene.  This package builds that delegated half natively on Spark:

- ``tokenizer``   — the single shared analysis function (engine + oracle)
- ``codec``       — delta-gap + varbyte posting compression, block-max metadata
- ``index.build`` — distributed posting-list construction (doc-sharded)
- ``index.query`` — BM25 top-k (k1=1.2, b=0.75, Lucene-default IDF), facets
- ``index.incremental`` — delta detection + shard-scoped rebuild (the
  reference's IndexRecords.java:64-75 change-propagation semantics)
- ``operators``   — dedup / similarity / text-stats / ETL parity operators
- ``oracle``      — pure-numpy brute-force BM25 used as the golden reference

Everything here derives from public knowledge: the Apache Spark / PySpark API,
the reference repo's observable behavior, and published IR papers (BM25:
Robertson & Zaragoza 2009; block-max indexes: Ding & Suel, SIGIR 2011).
"""

from archivesspace_virgo_spark.config import IndexConfig

__all__ = ["IndexConfig"]
__version__ = "0.1.0"
