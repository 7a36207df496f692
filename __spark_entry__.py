"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship versioned-lake slice on sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2 (plus
the training-data pipeline operators); each callable (spark, sf_dir) → DataFrame.
``oracle_sql()`` — equivalent ANSI SQL for DuckDB on the same parquet views.

Column names are aliased identically on both sides; SQL texts avoid
backslash escapes and dialect-specific types so many texts run unchanged
on both engines (see chronicles_spark/plans/synthetic_log.py docstring).
"""

from __future__ import annotations

import tempfile
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
from chronicles_spark.functions.strings import (
    VERSION_LABEL_RE,
    base_path_of,
    hive_partition_expr,
    partition_of_path,
    version_label_parts,
    version_of_path,
)
from chronicles_spark.plans import log_queries as LQ
from chronicles_spark.plans.synthetic_log import LOG_CTE, head_ref_df, ops_log_df
from chronicles_spark.sources import load_table, register_views
from chronicles_spark.spark import read_current, versioned_insert_into
from chronicles_spark.spark.reader import read_at_commit
from chronicles_spark.trackers import FileBackedVersionTracker

SF0001 = "/root/testdata/sf0.001"

# ---------------------------------------------------------------------------
# flagship


def entry(spark: SparkSession) -> DataFrame:
    """Versioned-lake slice (SURVEY §7 phase 2): init a date-partitioned
    versioned table from sf0.001 events, write all partitions, overwrite one
    partition with reprocessed data, then aggregate over the current view —
    proves write/commit/fold/read end-to-end."""
    tmp = tempfile.mkdtemp(prefix="chronicles_entry_")
    tracker = FileBackedVersionTracker(tmp + "/_log")
    table = TableDefinition(
        TableName("demo", "events"), tmp + "/events", PartitionSchema(("event_date",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="entry")

    events = load_table(spark, SF0001, "events").withColumn(
        "event_date", F.col("ts").cast("date").cast("string")
    )
    versioned_insert_into(events, table, tracker, "entry", "initial load")
    # reprocess one partition (same rows, fresh version — overwrite semantics)
    reprocessed = events.where(F.col("event_date") == "2024-01-05")
    versioned_insert_into(reprocessed, table, tracker, "entry", "reprocess 2024-01-05")

    view = read_current(spark, table, tracker)
    return (
        view.groupBy("event_date")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("approx_users"),
            F.max("value").alias("max_value"),
        )
        .orderBy("event_date")
    )


# ---------------------------------------------------------------------------
# shared SQL fragments (dialect-neutral: Spark SQL + DuckDB)

# deterministic version labels derived from event dates (md5 → uuid shape)
LBL_CTE = """
WITH built AS (
  SELECT d,
    replace(d, '-', '') || '-120000.000000000-' ||
    substr(h, 1, 8) || '-' || substr(h, 9, 4) || '-' || substr(h, 13, 4) || '-' ||
    substr(h, 17, 4) || '-' || substr(h, 21, 12) AS label
  FROM (
    SELECT DISTINCT CAST(CAST(ts AS DATE) AS STRING) AS d,
           md5(CAST(CAST(ts AS DATE) AS STRING)) AS h
    FROM events
  ) x
)
"""

_FOLD_INNER = """
  SELECT part, version FROM (
    SELECT o.part, o.version, o.operation_type,
           ROW_NUMBER() OVER (
             PARTITION BY o.part
             ORDER BY o.sequence_id DESC, o.index_in_commit DESC) AS rk
    FROM ops_log o {join_head}
    WHERE o.table_name = 'demo.events' {cutoff}
      AND o.operation_type IN ('add_part_version', 'remove_part')
  ) f
  WHERE rk = 1 AND operation_type = 'add_part_version'
"""

FOLD_AT_HEAD = _FOLD_INNER.format(
    join_head="JOIN head_ref h ON o.table_name = h.table_name",
    cutoff="AND o.sequence_id <= h.head_seq",
)
FOLD_LATEST = _FOLD_INNER.format(join_head="", cutoff="")


def _mk_lbl_paths_sql(path_prefix: str) -> str:
    return LBL_CTE + (
        ", paths AS (SELECT d, label, '"
        + path_prefix
        + "' || d || '/_version=' || label AS path FROM built)"
    )


# ---------------------------------------------------------------------------
# versioned-write helpers for the roundtrip/time-travel queries


def _write_versioned_events(spark: SparkSession, sf_dir: str):
    """Write events as a versioned table: v1 = all partitions, then one
    partition overwritten with identical data (fresh version). Returns
    (table, tracker, first_commit_id)."""
    tmp = tempfile.mkdtemp(prefix="chronicles_q_")
    tracker = FileBackedVersionTracker(tmp + "/_log")
    table = TableDefinition(
        TableName("demo", "events"), tmp + "/events", PartitionSchema(("event_date",))
    )
    tracker.init_table(table.name, is_snapshot=False, user_id="q")
    events = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.col("ts").cast("date").cast("string")
    )
    versioned_insert_into(events, table, tracker, "q", "v1 load")
    first_commit = tracker.table_state(table.name).current_version
    redo = events.where(F.col("event_date") == "2024-01-05")
    versioned_insert_into(redo, table, tracker, "q", "overwrite 2024-01-05")
    return table, tracker, first_commit


_EVENTS_VIEW_COLS = ["event_id", "user_id", "event_type", "value", "event_date"]

_EVENTS_ORACLE = """
SELECT event_id, user_id, event_type, value,
       CAST(CAST(ts AS DATE) AS STRING) AS event_date
FROM events
"""


# ---------------------------------------------------------------------------
# queries


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q: dict[str, Callable[[SparkSession, str], DataFrame]] = {}

    # --- V: commit-log algebra (distributed DataFrame plans) ---------------

    def q_current_version_fold(spark, sf):
        return LQ.current_version_fold(
            ops_log_df(spark, sf), head_ref_df(spark, sf), "demo.events"
        )

    def q_compute_changes(spark, sf):
        ops = ops_log_df(spark, sf)
        cur = LQ.current_version_fold(ops, head_ref_df(spark, sf), "demo.events")
        tgt = LQ.current_version_fold(ops, None, "demo.events")
        return LQ.compute_changes_df(cur, tgt)

    def q_snapshot_version_fold(spark, sf):
        return LQ.snapshot_version_fold(
            ops_log_df(spark, sf), head_ref_df(spark, sf), "demo.users"
        )

    def q_updates_log(spark, sf):
        return LQ.updates_log(ops_log_df(spark, sf))

    def q_table_state_group(spark, sf):
        return LQ.table_state_group(ops_log_df(spark, sf))

    def q_tables_list(spark, sf):
        return LQ.tables_list(ops_log_df(spark, sf))

    def q_is_snapshot(spark, sf):
        return LQ.is_snapshot(ops_log_df(spark, sf))

    # --- W: write/read surface --------------------------------------------

    def q_partition_values(spark, sf):
        ev = load_table(spark, sf, "events")
        return (
            ev.select(
                F.col("ts").cast("date").cast("string").alias("event_date"),
                "event_type",
            )
            .distinct()
        )

    def q_partition_filter(spark, sf):
        ev = load_table(spark, sf, "events")
        return (
            ev.where(F.col("ts").cast("date").cast("string") == "2024-01-05")
            .groupBy("event_type")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.countDistinct("user_id").alias("users"),
                F.min("value").alias("min_value"),
                F.max("value").alias("max_value"),
            )
        )

    def q_current_view(spark, sf):
        table, tracker, _ = _write_versioned_events(spark, sf)
        return read_current(spark, table, tracker).select(*_EVENTS_VIEW_COLS)

    def q_time_travel_read(spark, sf):
        table, tracker, first_commit = _write_versioned_events(spark, sf)
        return read_at_commit(spark, table, tracker, first_commit).select(
            *_EVENTS_VIEW_COLS
        )

    def q_versioned_write_roundtrip(spark, sf):
        # rows-only: write → read back through the current view
        table, tracker, _ = _write_versioned_events(spark, sf)
        return read_current(spark, table, tracker).select(*_EVENTS_VIEW_COLS)

    # --- string algebra as column functions --------------------------------

    def q_version_parse(spark, sf):
        register_views(spark, sf, ("events",))
        df = spark.sql(LBL_CTE + "SELECT label FROM built")
        t, n, u = version_label_parts(F.col("label"))
        return df.select(
            "label", t.alias("ts_part"), n.alias("nanos_part"), u.alias("uuid_part")
        )

    def q_version_paths(spark, sf):
        register_views(spark, sf, ("events",))
        df = spark.sql(
            _mk_lbl_paths_sql("s3://warehouse/events/date=") + "SELECT path FROM paths"
        )
        return df.select(
            "path",
            version_of_path(F.col("path")).alias("version_label"),
            base_path_of(F.col("path")).alias("base_path"),
        )

    def q_parse_versions_from_paths(spark, sf):
        register_views(spark, sf, ("events",))
        df = spark.sql(
            _mk_lbl_paths_sql("s3://warehouse/events/date=") + "SELECT path FROM paths"
        )
        return df.select(
            partition_of_path(F.col("path"), "date").alias("part"),
            version_of_path(F.col("path")).alias("version_label"),
        )

    def q_partition_parse(spark, sf):
        ev = load_table(spark, sf, "events")
        parts = ev.select(
            F.concat(
                F.lit("event_date="),
                F.col("ts").cast("date").cast("string"),
                F.lit("/event_type="),
                F.col("event_type"),
            ).alias("part_str")
        ).distinct()
        pat = "^([a-z][a-z0-9_]*)=([^/]+)/([a-z][a-z0-9_]*)=(.+)$"
        return parts.select(
            "part_str",
            F.regexp_extract("part_str", pat, 1).alias("col1"),
            F.regexp_extract("part_str", pat, 2).alias("val1"),
            F.regexp_extract("part_str", pat, 3).alias("col2"),
            F.regexp_extract("part_str", pat, 4).alias("val2"),
        )

    def q_partition_expr_render(spark, sf):
        ev = load_table(spark, sf, "events")
        d = ev.select(
            F.col("ts").cast("date").cast("string").alias("event_date"),
            "event_type",
        ).distinct()
        return d.select(
            "event_date",
            "event_type",
            hive_partition_expr(
                ("event_date", F.col("event_date")), ("event_type", F.col("event_type"))
            ).alias("hive_expr"),
        )

    # --- user-data query surface (Spark's own, over normalized sources) ----

    def q_tpch_q1(spark, sf):
        li = load_table(spark, sf, "lineitem")
        dec = lambda c: F.col(c).cast("decimal(18,2)")
        return (
            li.where(F.col("l_shipdate") <= "1998-09-02")
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
                F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
                F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
                .cast("double")
                .alias("sum_disc_price"),
                F.count(F.lit(1)).alias("count_order"),
            )
        )

    def q_tpch_q3(spark, sf):
        cust = load_table(spark, sf, "customer")
        orders = load_table(spark, sf, "orders")
        li = load_table(spark, sf, "lineitem")
        dec = lambda c: F.col(c).cast("decimal(18,2)")
        return (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(
                F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")),
                orders.o_custkey == F.col("c_custkey"),
            )
            .where(
                (F.col("o_orderdate") < "1998-03-15")
                & (F.col("l_shipdate") > "1998-03-15")
            )
            .groupBy(
                "o_orderkey",
                F.col("o_orderdate").cast("date").cast("string").alias("orderdate"),
                "o_orderpriority",
            )
            .agg(
                F.sum(dec("l_extendedprice") * (F.lit(1) - dec("l_discount")))
                .cast("double")
                .alias("revenue")
            )
        )

    for name, fn in list(locals().items()):
        if name.startswith("q_"):
            q[name] = fn
    return q


# ---------------------------------------------------------------------------
# oracles


def oracle_sql() -> dict[str, str]:
    fold_re = "^" + VERSION_LABEL_RE + "$"
    return {
        "q_current_version_fold": LOG_CTE + FOLD_AT_HEAD,
        "q_compute_changes": LOG_CTE
        + ", fold_head AS ("
        + FOLD_AT_HEAD
        + "), fold_latest AS ("
        + FOLD_LATEST
        + """)
SELECT COALESCE(c.part, t.part) AS part,
       CASE WHEN c.part IS NULL THEN 'add_partition'
            WHEN t.part IS NULL THEN 'remove_partition'
            ELSE 'update_partition_version' END AS change_type,
       t.version AS new_version
FROM fold_head c FULL OUTER JOIN fold_latest t ON c.part = t.part
WHERE c.part IS NULL OR t.part IS NULL OR c.version <> t.version
""",
        "q_snapshot_version_fold": LOG_CTE
        + """
SELECT o.version AS current_table_version
FROM ops_log o JOIN head_ref h ON o.table_name = h.table_name
WHERE o.table_name = 'demo.users'
  AND o.operation_type = 'add_table_version'
  AND o.sequence_id <= h.head_seq
ORDER BY o.sequence_id DESC, o.index_in_commit DESC
LIMIT 1
""",
        "q_updates_log": LOG_CTE
        + """
SELECT sequence_id, commit_id, table_name, user_id, message
FROM ops_log WHERE index_in_commit = 0
""",
        "q_table_state_group": LOG_CTE
        + """
SELECT commit_id, COUNT(*) AS n_ops,
       string_agg(operation_type, ',' ORDER BY index_in_commit) AS ops_csv
FROM ops_log GROUP BY commit_id
""",
        "q_tables_list": LOG_CTE + "SELECT DISTINCT table_name FROM ops_log",
        "q_is_snapshot": LOG_CTE
        + """
SELECT table_name, is_snapshot_table
FROM ops_log WHERE operation_type = 'init_table'
""",
        "q_partition_values": """
SELECT DISTINCT CAST(CAST(ts AS DATE) AS STRING) AS event_date, event_type
FROM events
""",
        "q_partition_filter": """
SELECT event_type, COUNT(*) AS cnt, COUNT(DISTINCT user_id) AS users,
       MIN(value) AS min_value, MAX(value) AS max_value
FROM events
WHERE CAST(CAST(ts AS DATE) AS STRING) = '2024-01-05'
GROUP BY event_type
""",
        "q_current_view": _EVENTS_ORACLE,
        "q_time_travel_read": _EVENTS_ORACLE,
        # q_versioned_write_roundtrip: rows-only by design (side-effecting write)
        "q_version_parse": LBL_CTE
        + f"""
SELECT label,
       regexp_extract(label, '{fold_re}', 1) AS ts_part,
       regexp_extract(label, '{fold_re}', 2) AS nanos_part,
       regexp_extract(label, '{fold_re}', 3) AS uuid_part
FROM built
""",
        "q_version_paths": _mk_lbl_paths_sql("s3://warehouse/events/date=")
        + """
SELECT path,
       regexp_extract(path, '_version=([^/]+)$', 1) AS version_label,
       regexp_replace(path, '/_version=[^/]+$', '') AS base_path
FROM paths
""",
        "q_parse_versions_from_paths": _mk_lbl_paths_sql("s3://warehouse/events/date=")
        + """
SELECT regexp_extract(path, '(date=[^/]+)', 1) AS part,
       regexp_extract(path, '_version=([^/]+)$', 1) AS version_label
FROM paths
""",
        "q_partition_parse": """
WITH parts AS (
  SELECT DISTINCT 'event_date=' || CAST(CAST(ts AS DATE) AS STRING) ||
         '/event_type=' || event_type AS part_str
  FROM events
)
SELECT part_str,
       regexp_extract(part_str, '^([a-z][a-z0-9_]*)=([^/]+)/([a-z][a-z0-9_]*)=(.+)$', 1) AS col1,
       regexp_extract(part_str, '^([a-z][a-z0-9_]*)=([^/]+)/([a-z][a-z0-9_]*)=(.+)$', 2) AS val1,
       regexp_extract(part_str, '^([a-z][a-z0-9_]*)=([^/]+)/([a-z][a-z0-9_]*)=(.+)$', 3) AS col2,
       regexp_extract(part_str, '^([a-z][a-z0-9_]*)=([^/]+)/([a-z][a-z0-9_]*)=(.+)$', 4) AS val2
FROM parts
""",
        "q_partition_expr_render": """
SELECT event_date, event_type,
       '(event_date=''' || event_date || ''',event_type=''' || event_type || ''')' AS hive_expr
FROM (
  SELECT DISTINCT CAST(CAST(ts AS DATE) AS STRING) AS event_date, event_type
  FROM events
) x
""",
        "q_tpch_q1": """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
        "q_tpch_q3": """
SELECT o_orderkey,
       CAST(CAST(o_orderdate AS DATE) AS STRING) AS orderdate,
       o_orderpriority,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY o_orderkey, CAST(CAST(o_orderdate AS DATE) AS STRING), o_orderpriority
""",
    }
