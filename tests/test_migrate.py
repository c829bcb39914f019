"""Golden tests for the v3→v4 field-map migration — the Spark analog of
IndexRecordsForV4Test.java:14-25 (Special Collections library must project
into source_f_stored; any other library must not)."""

from pyspark.sql import functions as F

from archivesspace_virgo_spark.operators.migrate import (
    GUIDE_LABEL,
    schema_migrate_v3_to_v4,
)


def _v3_docs(spark):
    rows = [
        ("as:3r754", "Special Collections", "ms 123", 1912, "Online",
         "http://guides.example/3r754", '{"location": "stacks"}'),
        ("as:4r686", "Law Library", None, None, "Book", None, None),
    ]
    return spark.createDataFrame(
        rows,
        "id string, library_facet string, call_number_facet string, "
        "date_multisort_i int, format_facet string, online_url_display string, "
        "special_collections_holding_display string",
    )


def test_special_collections_projects_source(spark):
    out = schema_migrate_v3_to_v4(_v3_docs(spark), record_date="2026-01-01T00:00:00Z")
    rows = {r["id"]: r for r in out.collect()}
    assert rows["as:3r754"]["source_f_stored"] == "Special Collections"
    # testLawXslt: must NOT emit a Law source
    assert rows["as:4r686"]["source_f_stored"] is None


def test_transforms_and_constants(spark):
    out = schema_migrate_v3_to_v4(_v3_docs(spark), record_date="2026-01-01T00:00:00Z")
    rows = {r["id"]: r for r in out.collect()}
    sc = rows["as:3r754"]
    assert sc["pool_f"] == "archival" and sc["circulating_f"] == "false"
    assert sc["record_date_stored"] == "2026-01-01T00:00:00Z"
    assert sc["call_number_tsearch_stored"] == "MS 123"
    assert sc["mss_work_key_sort"] == "MS_123"
    assert sc["published_date"] == "1912-01-01T00:00:00Z"
    assert sc["sc_availability_large_single"] == '{"current_location": "stacks"}'
    assert sc["url_supp_a"] == "http://guides.example/3r754"
    assert sc["url_label_supp_a"] == GUIDE_LABEL
    assert sc["uva_availability_f_stored"] == ["Online", "On shelf"]
    law = rows["as:4r686"]
    assert law["uva_availability_f_stored"] == ["On shelf"]
    assert law["url_label_supp_a"] is None
    assert law["published_date"] is None


def test_wallclock_stamp_default(spark):
    """F16 (aspace-solr-v3-to-v4.xsl:38-40): without a pinned record_date the
    migration stamps the current wall-clock time in the XSLT's ISO shape —
    the nondeterministic branch excluded from the driver oracle, pinned here
    by format instead of value."""
    import re
    from datetime import datetime, timezone

    before = datetime.now(timezone.utc).replace(microsecond=0)
    out = schema_migrate_v3_to_v4(_v3_docs(spark)).collect()
    after = datetime.now(timezone.utc)
    for r in out:
        stamp = r["record_date_stored"]
        assert re.fullmatch(r"\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}Z", stamp)
        t = datetime.strptime(stamp, "%Y-%m-%dT%H:%M:%SZ").replace(
            tzinfo=timezone.utc
        )
        assert before <= t <= after


def test_unmapped_v3_fields_dropped(spark):
    v3 = _v3_docs(spark).withColumn("junk_v3_only_field", F.lit("x"))
    out = schema_migrate_v3_to_v4(v3, record_date="2026-01-01T00:00:00Z")
    assert "junk_v3_only_field" not in out.columns


def test_plan_is_single_projection(spark):
    out = schema_migrate_v3_to_v4(_v3_docs(spark), record_date="2026-01-01T00:00:00Z")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
