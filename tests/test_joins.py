"""Salted join == plain join; bucketed join plans with no Exchange."""

import os

import pytest
from pyspark.sql import functions as F

from chronicles_spark.operators.joins import bucketed_join, salted_join, write_bucketed
from chronicles_spark.sources import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def test_salted_join_equals_plain_join(spark):
    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    dim = events.select("event_type").distinct().withColumn(
        "type_code", F.upper(F.col("event_type"))
    )
    plain = events.join(dim, "event_type")
    salted = salted_join(events, dim, "event_type", F.col("event_id"), n_salts=8)
    key = lambda r: (r["event_id"], r["event_type"], r["type_code"])
    assert sorted(map(key, salted.collect())) == sorted(map(key, plain.collect()))


def test_salted_join_splits_hot_key(spark):
    events = load_table(spark, SF_DIR, "events")
    salted = events.withColumn("_salt", F.pmod(F.hash("event_id"), F.lit(8)))
    # every event_type (hot key) must actually spread over multiple salts
    spread = (
        salted.groupBy("event_type")
        .agg(F.countDistinct("_salt").alias("n_salts"))
        .agg(F.min("n_salts").alias("m"))
        .collect()[0]["m"]
    )
    assert spread >= 4


def test_bucketed_join_has_no_exchange(spark):
    orders = load_table(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
    lineitem = load_table(spark, SF_DIR, "lineitem").select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=4)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", n_buckets=4)

    # at test SF the planner would just broadcast the tiny side; disable it
    # so the plan shows what bucketing buys at scale: a merge join whose
    # both sides read pre-bucketed files with NO Exchange
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        # and the result matches the plain (shuffling) join
        plain = orders.join(lineitem, "o_orderkey")
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_as_of_join_semantics(spark):
    from datetime import datetime as dt

    from chronicles_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [
            (1, "u1", dt(2020, 1, 1, 10)),   # before any right row -> null
            (2, "u1", dt(2020, 1, 1, 12)),   # exactly at right ts -> match
            (3, "u1", dt(2020, 1, 1, 15)),   # after both -> latest wins
            (4, "u2", dt(2020, 1, 1, 12)),   # other key, no right rows
        ],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [
            ("u1", dt(2020, 1, 1, 12), 100.0),
            ("u1", dt(2020, 1, 1, 14), 200.0),
        ],
        ["user_id", "ts", "amount"],
    )
    got = {r["event_id"]: r["amount"] for r in as_of_join(left, right, "user_id").collect()}
    assert got == {1: None, 2: 100.0, 3: 200.0, 4: None}


def test_as_of_join_null_payload_surfaces(spark):
    """A matched right row whose payload value is NULL must yield NULL —
    not fall through to an older right row's value."""
    from datetime import datetime as dt

    from chronicles_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [(1, "u", dt(2020, 1, 1, 15))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [("u", dt(2020, 1, 1, 10), 100.0), ("u", dt(2020, 1, 1, 14), None)],
        ["user_id", "ts", "amount"],
    )
    rows = as_of_join(left, right, "user_id").collect()
    assert rows[0]["amount"] is None  # the matched (14:00) row's NULL, not 100.0


def test_as_of_join_payload_row_atomicity(spark):
    """Multi-column payload must come from ONE right row even when some of
    its fields are NULL — no mixing across right rows."""
    from datetime import datetime as dt

    from chronicles_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [(1, "u", dt(2020, 1, 1, 15))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [
            ("u", dt(2020, 1, 1, 10), 100.0, "old"),
            ("u", dt(2020, 1, 1, 14), None, "new"),
        ],
        ["user_id", "ts", "amount", "tag"],
    )
    r = as_of_join(left, right, "user_id").collect()[0]
    assert (r["amount"], r["tag"]) == (None, "new")  # whole 14:00 row, atomically


def test_as_of_join_duplicate_ts_deterministic(spark):
    """Equal (key, ts) right rows resolve to the greatest payload struct,
    stable across shuffles/re-runs."""
    from datetime import datetime as dt

    from chronicles_spark.operators.joins import as_of_join

    left = spark.createDataFrame(
        [(1, "u", dt(2020, 1, 1, 15))], ["event_id", "user_id", "ts"]
    )
    right = spark.createDataFrame(
        [("u", dt(2020, 1, 1, 14), 100.0), ("u", dt(2020, 1, 1, 14), 200.0)],
        ["user_id", "ts", "amount"],
    )
    for n_parts in (1, 4):
        got = as_of_join(
            left.repartition(n_parts), right.repartition(n_parts), "user_id"
        ).collect()[0]["amount"]
        assert got == 200.0


def test_as_of_join_rejects_column_collision(spark):
    from datetime import datetime as dt

    import pytest as _pytest

    from chronicles_spark.operators.joins import as_of_join

    left = spark.createDataFrame([(1, "u", dt(2020, 1, 1), 5.0)], ["id", "k", "ts", "v"])
    right = spark.createDataFrame([("u", dt(2020, 1, 1), 7.0)], ["k", "ts", "v"])
    with _pytest.raises(ValueError, match="collide"):
        as_of_join(left, right, "k")


def test_as_of_join_single_shuffle(spark):
    from datetime import datetime as dt

    from chronicles_spark.operators.joins import as_of_join

    left = spark.createDataFrame([(1, "u", dt(2020, 1, 1))], ["id", "k", "ts"])
    right = spark.createDataFrame([("u", dt(2020, 1, 1), 7.0)], ["k", "ts", "v"])
    plan = as_of_join(left, right, "k")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_range_join_boundaries_and_buckets(spark):
    from datetime import datetime as dt

    from chronicles_spark.operators.joins import range_join

    points = spark.createDataFrame(
        [
            (1, "k", dt(2020, 1, 1, 0, 0, 0)),    # == start -> in
            (2, "k", dt(2020, 1, 2, 23, 59, 59)), # just before end -> in
            (3, "k", dt(2020, 1, 3, 0, 0, 0)),    # == end -> out (exclusive)
            (4, "k", dt(2019, 12, 31, 23, 59)),   # before start -> out
            (5, "x", dt(2020, 1, 1, 12, 0)),      # wrong key -> out
        ],
        ["pid", "key", "ts"],
    )
    intervals = spark.createDataFrame(
        [("k", dt(2020, 1, 1), dt(2020, 1, 3))],  # spans 2 day-buckets
        ["key", "start_ts", "end_ts"],
    )
    got = sorted(
        r["pid"]
        for r in range_join(points, intervals, "key", "ts", "start_ts", "end_ts").collect()
    )
    assert got == [1, 2]


def test_range_join_no_duplicate_matches(spark):
    from datetime import datetime as dt

    from chronicles_spark.operators.joins import range_join

    points = spark.createDataFrame([(1, "k", dt(2020, 1, 2, 12))], ["pid", "key", "ts"])
    intervals = spark.createDataFrame(
        [("k", dt(2020, 1, 1), dt(2020, 1, 5))], ["key", "start_ts", "end_ts"]
    )
    rows = range_join(points, intervals, "key", "ts", "start_ts", "end_ts").collect()
    assert len(rows) == 1  # interval covers 4 buckets; point matches once


def test_range_join_drops_inverted_intervals(spark):
    from datetime import datetime as dt

    from chronicles_spark.operators.joins import range_join

    points = spark.createDataFrame([(1, "k", dt(2020, 1, 2))], ["pid", "key", "ts"])
    bad = spark.createDataFrame(
        [("k", dt(2020, 6, 1), dt(2020, 1, 1))], ["key", "start_ts", "end_ts"]
    )
    assert range_join(points, bad, "key", "ts", "start_ts", "end_ts").count() == 0


def test_as_of_join_rejects_reserved_names(spark):
    from datetime import datetime as dt

    import pytest as _pytest

    from chronicles_spark.operators.joins import as_of_join

    left = spark.createDataFrame([(1, "u", dt(2020, 1, 1), 0)], ["id", "k", "ts", "_is_left"])
    right = spark.createDataFrame([("u", dt(2020, 1, 1), 7.0)], ["k", "ts", "v"])
    with _pytest.raises(ValueError, match="reserved"):
        as_of_join(left, right, "k")


def test_salted_join_rejects_right_and_full(spark):
    import pytest as _pytest

    from chronicles_spark.operators.joins import salted_join

    df = spark.createDataFrame([(1, "k")], ["id", "key"])
    for how in ("right", "full", "outer"):
        with _pytest.raises(ValueError, match="inner/left"):
            salted_join(df, df, "key", F.col("id"), how=how)


def test_as_of_join_map_payload_raises_upfront(spark):
    """A map-typed payload column cannot participate in the struct
    tie-break; the error must be a clear ValueError at call time, not a
    plan-time analyzer failure."""
    from pyspark.sql import functions as F

    from chronicles_spark.operators.joins import as_of_join

    left = spark.createDataFrame([(1, 10)], ["k", "ts"])
    right = spark.createDataFrame([(1, 5, "a")], ["k", "ts", "v"]).select(
        "k", "ts", F.create_map(F.lit("x"), F.col("v")).alias("attrs")
    )
    with pytest.raises(ValueError, match="orderable"):
        as_of_join(left, right, "k")
