"""Real-Iceberg integration smoke for ``read_iceberg`` (VERDICT r4 item 8).

The container ships no iceberg-spark-runtime jar, so this test SKIPS with a
reason here; on a deployment image that has the jar (or sets
``ICEBERG_SPARK_RUNTIME_JAR``), it runs for real: a local Hadoop catalog,
two append commits, and the three scan shapes ``read_iceberg`` promises
(full / ``snapshot-id`` / ``start-snapshot-id``), asserting the same
semantics ``SnapshotTable`` implements on parquet (snapshot pin = first
commit only; diff = second commit only).

Runs in a SUBPROCESS because the Iceberg catalog confs
(``spark.sql.catalog.*``) must be set before the JVM starts — the shared
session fixture can't be reconfigured.
"""

import glob
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _find_iceberg_jar():
    explicit = os.environ.get("ICEBERG_SPARK_RUNTIME_JAR")
    if explicit and os.path.exists(explicit):
        return explicit
    roots = []
    try:
        import pyspark

        roots.append(os.path.join(os.path.dirname(pyspark.__file__), "jars"))
    except ImportError:
        pass
    if os.environ.get("SPARK_HOME"):
        roots.append(os.path.join(os.environ["SPARK_HOME"], "jars"))
    for root in roots:
        hits = glob.glob(os.path.join(root, "iceberg-spark-runtime*.jar"))
        if hits:
            return hits[0]
    return None


_DRIVER = r"""
import json, sys
from pyspark.sql import SparkSession

warehouse, jar = sys.argv[1], sys.argv[2]
spark = (
    SparkSession.builder.master("local[2]")
    .config("spark.jars", jar)
    .config("spark.sql.extensions",
            "org.apache.iceberg.spark.extensions"
            ".IcebergSparkSessionExtensions")
    .config("spark.sql.catalog.it",
            "org.apache.iceberg.spark.SparkCatalog")
    .config("spark.sql.catalog.it.type", "hadoop")
    .config("spark.sql.catalog.it.warehouse", warehouse)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
from archivesspace_virgo_spark.sources import read_iceberg

spark.sql("CREATE TABLE it.db.corpus (repo STRING, path STRING, "
          "content STRING) USING iceberg")
spark.sql("INSERT INTO it.db.corpus VALUES ('r1','a','one'), ('r1','b','two')")
spark.sql("INSERT INTO it.db.corpus VALUES ('r2','c','three')")
snaps = [r["snapshot_id"] for r in spark.sql(
    "SELECT snapshot_id FROM it.db.corpus.snapshots "
    "ORDER BY committed_at").collect()]
out = {
    "n_snapshots": len(snaps),
    "full": read_iceberg(spark, "it.db.corpus").count(),
    "pinned": read_iceberg(spark, "it.db.corpus",
                           snapshot_id=snaps[0]).count(),
    "diff": read_iceberg(spark, "it.db.corpus",
                         start_snapshot_id=snaps[0]).count(),
}
print("ICEBERG_RESULT " + json.dumps(out))
spark.stop()
"""


@pytest.mark.skipif(
    _find_iceberg_jar() is None,
    reason="no iceberg-spark-runtime jar in this environment "
    "(set ICEBERG_SPARK_RUNTIME_JAR or install into pyspark/jars); "
    "the cluster path is pinned by test_read_iceberg_option_names",
)
def test_read_iceberg_against_local_hadoop_catalog(tmp_path):
    jar = _find_iceberg_jar()
    script = tmp_path / "iceberg_drive.py"
    script.write_text(_DRIVER)
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO
    proc = subprocess.run(
        [sys.executable, str(script), str(tmp_path / "warehouse"), jar],
        capture_output=True, text=True, timeout=600, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [ln for ln in proc.stdout.splitlines()
            if ln.startswith("ICEBERG_RESULT ")][-1]
    got = json.loads(line.split(" ", 1)[1])
    # two commits; pin = first commit's 2 rows; diff after it = 1 new row
    assert got == {"n_snapshots": 2, "full": 3, "pinned": 2, "diff": 1}
