"""J5 (JDBC dimension lookup) + P5/U2 (route/split writes) tests.

J5 mirrors the reference's MySQL rights-statement lookup
(ASpaceObject.java:559-593): a real ``spark.read.jdbc`` scan of an embedded
Derby database (the JDBC engine that ships with Spark) broadcast-joined to
the fact side — the same plan a MySQL dimension would produce, minus the
driver class name.
"""

import os

from pyspark.sql import functions as F

from archivesspace_virgo_spark.operators import etl as E


def test_jdbc_dimension_broadcast_join(spark, tmp_path):
    db = str(tmp_path / "derbydb")
    url = f"jdbc:derby:{db};create=true"
    # Derby system home must be writable (derby.log)
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(tmp_path))
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate(
        "CREATE TABLE use_rights (uri VARCHAR(64), statement VARCHAR(128))"
    )
    for i in range(5):
        st.executeUpdate(
            f"INSERT INTO use_rights VALUES ('uri-{i}', 'rights-{i}')"
        )
    st.close()
    conn.close()

    dim = spark.read.jdbc(url, "use_rights")
    assert dim.count() == 5

    facts = spark.range(20).select(
        F.col("id").alias("obj_id"),
        F.concat(F.lit("uri-"), (F.col("id") % 5).cast("string")).alias("URI"),
    )
    joined = facts.join(F.broadcast(dim), "URI", "left").select(
        "obj_id", "STATEMENT"
    )
    rows = {r["obj_id"]: r["STATEMENT"] for r in joined.collect()}
    assert rows[7] == "rights-2" and rows[10] == "rights-0"
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_route_split_writes(spark, tmp_path):
    p = spark.range(100).select(
        F.col("id"),
        E.route_label(
            "id",
            [
                (F.col("id") % 3 == 0, "digital_object"),
                (F.col("id") % 3 == 1, "container"),
            ],
        ).alias("route"),
    )
    out = str(tmp_path / "routed")
    E.write_routed(p, "route", out)
    dirs = {d for d in os.listdir(out) if d.startswith("route=")}
    assert dirs == {"route=digital_object", "route=container", "route=other"}
    back = spark.read.parquet(out)
    assert back.filter(F.col("route") == "digital_object").count() == 34
    assert back.count() == 100
