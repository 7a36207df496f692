import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    from pyspark.sql import SparkSession

    # Hive-enabled (embedded Derby in a per-session tmp dir) so the
    # SparkHiveMetastore DDL paths run for real, mirroring the reference's
    # SparkHiveSuite rig (spark/src/test/.../SparkHiveSuite.scala:42-88).
    hive_dir = tmp_path_factory.mktemp("hive")
    s = (
        SparkSession.builder.master("local[4]")
        .appName("chronicles-spark-tests")
        .config("spark.sql.shuffle.partitions", "8")  # small for test speed
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config(
            "spark.hadoop.javax.jdo.option.ConnectionURL",
            f"jdbc:derby:;databaseName={hive_dir}/metastore;create=true",
        )
        .config("spark.sql.warehouse.dir", str(hive_dir / "warehouse"))
        .config("spark.driver.extraJavaOptions", f"-Dderby.system.home={hive_dir}")
        .enableHiveSupport()
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
