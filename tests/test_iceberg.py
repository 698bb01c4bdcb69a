"""Iceberg sink bootstrap tests.

The append+read-back test needs the iceberg-spark-runtime jar (absent in
this container) and skips cleanly without it; the bootstrap error paths are
always exercised.
"""

import pytest

from mega_data_factory_spark.config import SinkConfig
from mega_data_factory_spark.sinks import write_sink
from mega_data_factory_spark.sinks.iceberg import find_iceberg_jar, iceberg_catalog_conf


def test_missing_jar_raises_actionable_error(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_ICEBERG_JAR", raising=False)
    if find_iceberg_jar() is not None:
        pytest.skip("runtime jar installed; the no-jar path is untestable here")
    with pytest.raises(RuntimeError, match="Iceberg runtime jar not found"):
        iceberg_catalog_conf()


def test_unconfigured_catalog_raises_before_write(spark):
    df = spark.range(3).toDF("id")
    with pytest.raises(RuntimeError, match="needs catalog 'nocat' configured"):
        write_sink(df, SinkConfig(format="iceberg", path="nocat.db.t"))


def test_env_override_wins(monkeypatch, tmp_path):
    jar = tmp_path / "iceberg-spark-runtime-test.jar"
    jar.write_bytes(b"")
    monkeypatch.setenv("SPARK_GRAFT_ICEBERG_JAR", str(jar))
    assert find_iceberg_jar() == str(jar)
    conf = iceberg_catalog_conf("lake", warehouse=str(tmp_path / "wh"))
    assert conf["spark.sql.catalog.lake.type"] == "hadoop"
    assert conf["spark.jars"] == str(jar)


@pytest.mark.skipif(find_iceberg_jar() is None, reason="iceberg-spark-runtime jar not installed")
def test_append_and_read_back(tmp_path):
    """Full catalog bootstrap + writeTo append + read-back. Runs only where
    the runtime jar is installed (dedicated session: catalog classes must
    load with the JVM)."""
    from pyspark.sql import SparkSession

    from mega_data_factory_spark.session import get_spark

    active = SparkSession.getActiveSession()
    if active is not None:
        pytest.skip("needs a fresh JVM to load the catalog jar")
    spark = get_spark("iceberg-test", cpus=2, extra_conf=iceberg_catalog_conf("local", str(tmp_path / "wh")))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS local.db")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string")
    df.writeTo("local.db.t").create()
    write_sink(df, SinkConfig(format="iceberg", path="local.db.t"))
    assert spark.table("local.db.t").count() == 4
