"""Real-catalog Iceberg exercise (round-4 VERDICT missing #2 / next #8).

The sandbox has no Iceberg runtime jar and no network, so this module
SKIPS — loudly, with the probe's story — unless a jar is discoverable
(SPARK_GRAFT_ICEBERG_JAR / ~/.ivy2/jars / pyspark jars) or the caller
allows a maven fetch (SPARK_GRAFT_ICEBERG_FETCH=1). Wherever the jar
exists, the same TableStore calls that today run on the parquet fallback
execute against a real hadoop-catalog Iceberg warehouse: write, read
round-trip, partition upsert, snapshot listing and rollback.

The exercise runs in a SUBPROCESS: spark.jars is a static conf, so the
Iceberg session must launch its own JVM — the pytest process already
holds a jar-less shared session (get_spark_iceberg refuses to run next
to an active session for exactly this reason).
"""

import os
import subprocess
import sys

import pytest

from rayjoin_spark.session import find_iceberg_jar

_jar = find_iceberg_jar()
_fetch = os.environ.get("SPARK_GRAFT_ICEBERG_FETCH") == "1"

pytestmark = pytest.mark.skipif(
    _jar is None and not _fetch,
    reason=(
        "Iceberg runtime jar unavailable: SPARK_GRAFT_ICEBERG_JAR unset, "
        "no *iceberg-spark-runtime*.jar in ~/.ivy2/jars or the pyspark "
        "jars dir, and SPARK_GRAFT_ICEBERG_FETCH!=1 (offline sandbox). "
        "Provide either to exercise the real catalog branch."
    ),
)

_EXERCISE = """
import sys
from pyspark.sql import functions as F
from rayjoin_spark.session import get_spark_iceberg
from rayjoin_spark.sources.tables import TableStore

wh = sys.argv[1]
spark = get_spark_iceberg("ice_test", warehouse=wh, cpus=4)
store = TableStore(spark, warehouse=wh + "/wh2")
assert store.backend() == "iceberg", "seam must pick the real catalog"
df = spark.range(10).withColumn("p", (F.col("id") % 2).cast("int"))
store.write(df, "t", partition_by=["p"])
assert store.read("t").count() == 10
up = spark.range(3).withColumn("p", F.lit(0))
store.upsert(up, "t", partition_by=["p"])
got = store.read("t")
assert got.filter("p = 0").count() == 3
assert got.filter("p = 1").count() == 5
snaps = store.snapshots("t")
assert len(snaps) >= 2, snaps
store.rollback("t", snaps[0])
assert store.read("t").count() == 10
spark.stop()
print("ICEBERG-OK")
"""


def test_tablestore_real_catalog_roundtrip_upsert_rollback(tmp_path):
    env = dict(os.environ)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", _EXERCISE, str(tmp_path)],
        capture_output=True,
        text=True,
        env=env,
        timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "ICEBERG-OK" in out.stdout
