"""Testdata source layer: schema-normalized loads of the driver's parquet.

The driver's synthetic tables (TESTDATA.md) store timestamps as parquet
``TIMESTAMP(NANOS)``, which Spark's parquet reader rejects by default
(PARQUET_TYPE_ILLEGAL) while DuckDB reads them as microsecond timestamps.
We flip ``spark.sql.legacy.parquet.nanosAsLong`` (runtime-settable) and
convert ns→µs with integer division — float division would lose precision
at 1.7e18 — so both engines see identical microsecond instants.

All loads go through here so every operator sees one canonical schema.
Session timezone is forced to UTC to keep date casts engine-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# table → columns stored as TIMESTAMP(NANOS) in the driver's parquet
_NANOS_TS_COLUMNS = {
    "events": ("ts",),
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
}

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_session_confs(spark: SparkSession) -> None:
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table with normalized (timestamp-typed) schema.

    Timestamp columns may arrive as NANOS (→ long under nanosAsLong) or as
    plain µs TIMESTAMP depending on how the generator wrote each table, so
    conversion is conditional on the physical type actually read. Target
    type is TIMESTAMP_NTZ — the same naive microsecond instants DuckDB sees.
    """
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c, dtype in df.dtypes:
        if c in _NANOS_TS_COLUMNS.get(name, ()) and dtype == "bigint":
            df = df.withColumn(
                c, F.timestamp_micros(F.expr(f"{c} div 1000")).cast("timestamp_ntz")
            )
        elif c in _NANOS_TS_COLUMNS.get(name, ()) and dtype == "timestamp":
            df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register normalized temp views so SQL text can run unchanged on
    Spark and on DuckDB (where the driver pre-registers the same names)."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
