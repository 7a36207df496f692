"""Deterministic synthetic commit log, derived from the testdata.

The oracle harness (FIXTURES.md F5) needs an ops-log table both engines can
construct bit-identically from the same parquet inputs, with the shapes the
fold/diff algebra must handle: a partition with two versions, a
removed-then-re-added partition (fresh version, tombstone semantics —
reference: core/src/test/.../VersionTrackerSpec.scala:184-190), a
multi-operation commit, a second (snapshot) table in the same log, and a
head pointer that is NOT at the latest commit (time-travel cutoff —
reference: core/.../VersionTracker.scala:41-44).

The SQL below is dialect-neutral (runs unchanged on Spark SQL and DuckDB):
no backslash escapes (ANSI string literals), STRING type alias, ``||``
concat, lpad, window ROW_NUMBER. Derivation: one commit per distinct
``events`` date (30 at every SF), then the special commits on top.

Flattened schema (≙ chronicle_table_updates_v1 ⋈ chronicle_table_operations_v1,
reference: db/.../DbVersionTracker.scala:140-190):
  sequence_id BIGINT, commit_id STRING, table_name STRING, user_id STRING,
  message STRING, index_in_commit INT, operation_type STRING,
  version STRING, part STRING, is_snapshot_table BOOLEAN
(the partition column is named ``part`` — ``partition`` is reserved in
Spark SQL).
"""

# CTE block: defines dates, nn, ops_log, head_ref. Compose queries after it.
# The dates/nn bodies are template parameters: the oracle (DuckDB) keeps the
# self-contained inline form (LOG_CTE below, unchanged semantics), while the
# Spark side substitutes a checkpointed 30-row view — Spark inlines CTEs, so
# the inline form re-scans `events` and re-runs the DISTINCT + global window
# once per UNION ALL leg (9 legs → ~34-60 Exchanges in every downstream
# fold/diff plan).  One scan suffices; see ``_spark_log_cte``.
_DATES_BODY = """
  SELECT d, CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS rn
  FROM (SELECT DISTINCT CAST(CAST(ts AS DATE) AS STRING) AS d FROM events) x
"""
_NN_BODY = "SELECT MAX(rn) AS n FROM dates"
_LOG_CTE_TEMPLATE = """
WITH dates AS ({dates}),
nn AS ({nn}),
ops_log AS (
  SELECT CAST(0 AS BIGINT) AS sequence_id, 'c0000' AS commit_id,
         'demo.events' AS table_name, 'alice' AS user_id, 'init table' AS message,
         0 AS index_in_commit, 'init_table' AS operation_type,
         CAST(NULL AS STRING) AS version, CAST(NULL AS STRING) AS part,
         FALSE AS is_snapshot_table
  UNION ALL
  SELECT rn, 'c' || lpad(CAST(rn AS STRING), 4, '0'),
         'demo.events', 'alice', 'load ' || d, 0, 'add_part_version',
         'v' || lpad(CAST(rn AS STRING), 4, '0'), 'date=' || d,
         CAST(NULL AS BOOLEAN)
  FROM dates
  UNION ALL
  SELECT n + 1, 'c' || lpad(CAST(n + 1 AS STRING), 4, '0'),
         'demo.events', 'bob', 'reprocess ' || d, 0, 'add_part_version',
         'v' || lpad(CAST(n + 1 AS STRING), 4, '0'), 'date=' || d,
         CAST(NULL AS BOOLEAN)
  FROM dates, nn WHERE rn = 1
  UNION ALL
  SELECT n + 2, 'c' || lpad(CAST(n + 2 AS STRING), 4, '0'),
         'demo.events', 'bob', 'drop ' || d, 0, 'remove_part',
         CAST(NULL AS STRING), 'date=' || d, CAST(NULL AS BOOLEAN)
  FROM dates, nn WHERE rn = 2
  UNION ALL
  SELECT n + 3, 'c' || lpad(CAST(n + 3 AS STRING), 4, '0'),
         'demo.events', 'carol', 'readd and extend', 0, 'add_part_version',
         'v' || lpad(CAST(n + 3 AS STRING), 4, '0'), 'date=' || d,
         CAST(NULL AS BOOLEAN)
  FROM dates, nn WHERE rn = 2
  UNION ALL
  SELECT n + 3, 'c' || lpad(CAST(n + 3 AS STRING), 4, '0'),
         'demo.events', 'carol', 'readd and extend', 1, 'add_part_version',
         'v' || lpad(CAST(n + 3 AS STRING), 4, '0'), 'date=9999-12-31',
         CAST(NULL AS BOOLEAN)
  FROM nn
  UNION ALL
  SELECT n + 4, 'c' || lpad(CAST(n + 4 AS STRING), 4, '0'),
         'demo.users', 'alice', 'init users', 0, 'init_table',
         CAST(NULL AS STRING), CAST(NULL AS STRING), TRUE
  FROM nn
  UNION ALL
  SELECT n + 5, 'c' || lpad(CAST(n + 5 AS STRING), 4, '0'),
         'demo.users', 'alice', 'users v1', 0, 'add_table_version',
         'v' || lpad(CAST(n + 5 AS STRING), 4, '0'), CAST(NULL AS STRING),
         CAST(NULL AS BOOLEAN)
  FROM nn
  UNION ALL
  SELECT n + 6, 'c' || lpad(CAST(n + 6 AS STRING), 4, '0'),
         'demo.users', 'dave', 'users v2', 0, 'add_table_version',
         'v' || lpad(CAST(n + 6 AS STRING), 4, '0'), CAST(NULL AS STRING),
         CAST(NULL AS BOOLEAN)
  FROM nn
),
head_ref AS (
  SELECT 'demo.events' AS table_name, n + 2 AS head_seq FROM nn
  UNION ALL
  SELECT 'demo.users', n + 6 FROM nn
)
"""

LOG_CTE = _LOG_CTE_TEMPLATE.format(dates=_DATES_BODY, nn=_NN_BODY)

OPS_LOG_SQL = LOG_CTE + "SELECT * FROM ops_log"
HEAD_REF_SQL = LOG_CTE + "SELECT * FROM head_ref"

_DATES_VIEW = "_chronicles_synth_log_dates"


def _spark_log_cte(spark, sf_dir: str) -> str:
    """Spark-side LOG_CTE: compute ``dates`` ONCE (one events scan + one
    DISTINCT + one 30-row global window), pin the result with
    ``localCheckpoint`` (blocks freed when the plan is GC'd — the house
    pattern for relations consumed by a RETURNED plan), and splice a view
    reference into the template.  ``n`` is inlined as a literal (max(rn) ==
    count(dates) by row_number construction — one 30-row action, metadata
    scale).  Everything is recomputed from the parquet inputs on every call;
    nothing is memoized across invocations."""
    from ..sources import register_views

    register_views(spark, sf_dir, ("events",))
    dates = spark.sql(_DATES_BODY)
    ckpt = dates.localCheckpoint(eager=True)
    ckpt.createOrReplaceTempView(_DATES_VIEW)
    n = ckpt.count()
    return _LOG_CTE_TEMPLATE.format(
        dates=f"SELECT d, rn FROM {_DATES_VIEW}",
        nn=f"SELECT CAST({n} AS BIGINT) AS n",
    )


def ops_log_df(spark, sf_dir: str):
    """Build the synthetic ops-log DataFrame (requires the ``events`` view)."""
    return spark.sql(_spark_log_cte(spark, sf_dir) + "SELECT * FROM ops_log")


def head_ref_df(spark, sf_dir: str):
    return spark.sql(_spark_log_cte(spark, sf_dir) + "SELECT * FROM head_ref")
