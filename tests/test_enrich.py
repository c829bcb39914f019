"""J6 HTTP manifest enrichment join (mapInPandas, injected fetch) +
P3/P7 dedicated visibility/role filters."""

from pyspark.sql import functions as F

from archivesspace_virgo_spark.operators.enrich import (
    fake_manifest_fetch,
    http_manifest_join,
)
from archivesspace_virgo_spark.operators.etl import (
    creator_role_filter,
    publish_filter,
)


def test_manifest_join_projects_fields(spark):
    df = spark.createDataFrame(
        [(1, "https://iiif.example/m/11"), (2, "https://iiif.example/m/22"),
         (3, None), (4, "https://iiif.example/m/11")],
        "doc_id long, manifest_url string",
    )
    out = http_manifest_join(df, "manifest_url", fetch=fake_manifest_fetch)
    rows = {r["doc_id"]: r for r in out.collect()}
    assert len(rows) == 4
    assert rows[1]["label"] == "Manifest 11"
    assert rows[1]["thumbnail"] == "https://iiif.example/m/11/thumb.jpg"
    assert rows[1]["manifest_id"] == "https://iiif.example/m/11"
    assert rows[1]["license"].startswith("http://creativecommons.org")
    # same url → same projection (memoized within batch)
    assert rows[4]["label"] == rows[1]["label"]
    # NULL url passes through with NULL manifest fields
    assert rows[3]["label"] is None and rows[3]["thumbnail"] is None
    # original columns survive
    assert rows[2]["manifest_url"] == "https://iiif.example/m/22"


def test_manifest_join_fail_soft(spark):
    def broken(url):
        if url.endswith("bad"):
            raise IOError("boom")
        return fake_manifest_fetch(url)

    df = spark.createDataFrame(
        [(1, "https://x/ok"), (2, "https://x/bad")],
        "doc_id long, manifest_url string",
    )
    rows = {r["doc_id"]: r for r in
            http_manifest_join(df, "manifest_url", fetch=broken).collect()}
    assert rows[1]["label"] == "Manifest ok"
    assert rows[2]["label"] is None  # per-record fail-soft, stage survives


def test_publish_and_role_filters(spark):
    df = spark.createDataFrame(
        [(1, True, "creator"), (2, False, "creator"), (3, True, "subject")],
        "id long, publish boolean, role string",
    )
    assert {r["id"] for r in publish_filter(df).collect()} == {1, 3}
    assert {r["id"] for r in creator_role_filter(df).collect()} == {1, 2}
    assert {r["id"] for r in
            creator_role_filter(publish_filter(df)).collect()} == {1}
