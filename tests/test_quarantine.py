"""Fail-soft row-level error isolation (SURVEY.md §4.1: the reference's
per-record try/catch + nonzero exit, IndexRecords.java:97-101, 110-115)."""

from pyspark.sql import functions as F

from archivesspace_virgo_spark.config import IndexConfig
from archivesspace_virgo_spark.index.build import build_index
from archivesspace_virgo_spark.index.query import QueryEngine
from archivesspace_virgo_spark.index.storage import IndexStorage

CFG = IndexConfig(docs_per_shard=16, block_size=8)

ROWS = [
    # (doc_id, repo, path, commit, lang, content)
    (0, "r", "p/0", "c", "py", "good tokens here"),
    (1, "r", "p/1", "c", "py", None),            # null content
    (None, "r", "p/2", "c", "py", "orphan row"),  # null doc_id
    (-5, "r", "p/3", "c", "py", "negative id"),   # negative doc_id
    (4, "r", "p/4", "c", "py", "dup one"),        # duplicate pair ->
    (4, "r", "p/5", "c", "py", "dup two"),        #   both quarantined
    (6, "r", "p/6", "c", "py", "more good tokens"),
]


def _corpus(spark):
    return spark.createDataFrame(
        ROWS,
        "doc_id long, repo string, path string, commit string, "
        "lang string, content string",
    )


def test_quarantine_routes_bad_rows(spark, tmp_path):
    d = str(tmp_path / "idx")
    meta = build_index(spark, _corpus(spark), d, CFG, validate=True,
                       build_id="qbuild")
    assert meta["n_docs"] == 2  # only doc 0 and doc 6 survive

    errors = IndexStorage(d).read(spark, "_errors")
    got = {(r["path"], r["reason"]) for r in errors.collect()}
    assert got == {
        ("p/1", "null_content"),
        ("p/2", "null_doc_id"),
        ("p/3", "negative_doc_id"),
        ("p/4", "duplicate_doc_id"),
        ("p/5", "duplicate_doc_id"),
    }
    assert {r["build_id"] for r in errors.collect()} == {"qbuild"}

    # the index itself is consistent: only clean docs are queryable
    engine = QueryEngine(spark, d, CFG)
    assert engine.n_docs == 2
    hits = {r["doc_id"] for r in engine.search(["tokens"], k=10).collect()}
    assert hits == {0, 6}


def test_validate_off_by_default_is_lean(spark, tmp_path):
    """Without validate=True a clean corpus builds with no _errors table."""
    import os

    clean = _corpus(spark).filter(
        F.col("doc_id").isNotNull() & (F.col("doc_id") >= 0)
        & F.col("content").isNotNull()
    ).dropDuplicates(["doc_id"])
    d = str(tmp_path / "idx")
    build_index(spark, clean, d, CFG)
    assert not os.path.exists(os.path.join(d, "_errors"))
