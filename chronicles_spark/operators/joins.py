"""Join strategies for scale: salted joins for skewed keys, bucketed
tables for shuffle-free co-located joins.

Spark's partial aggregation already absorbs most aggregation skew
map-side; the place skew actually kills a job is a shuffle JOIN where one
key holds a disproportionate share of rows — every row of the hot key
lands on one reducer.  ``salted_join`` is the classic fix: split each hot
key into ``n_salts`` synthetic sub-keys (deterministically, by hashing the
probe row's id), replicate the build side once per sub-key, and join on
(key, salt).  The hot partition becomes ``n_salts`` partitions; results
are identical to the plain join.

``bucketed_join`` uses Spark bucketing (hash-partitioned, sorted table
layout in the session catalog): two tables bucketed by the same key and
count join WITHOUT a shuffle — the plan has no Exchange on either side.
At 100 TB pre-bucketing the fact tables amortizes the shuffle across every
downstream join on that key (the tests assert the Exchange-free plan, not
just the result).

AQE (``spark.sql.adaptive.skewJoin.enabled``) handles moderate runtime
skew automatically; explicit salting remains the tool when a single key is
pathologically hot or the join is not an AQE-supported shape.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_src: Column,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the shuffle key salted.

    ``salt_src`` is any deterministic column of the big side with good
    entropy (an id); the salt is ``pmod(hash(salt_src), n_salts)``, so the
    result is reproducible.  The small side is replicated ``n_salts``
    times (explode of a literal range — cheap for dimension-sized
    inputs).  Result columns = plain join's.

    Only inner/left joins are meaningful: in a right or full join, every
    UNMATCHED small-side row would surface once per replica."""
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    salted_big = big.withColumn("_salt", F.pmod(F.hash(salt_src), F.lit(n_salts)))
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")


def write_bucketed(
    df: DataFrame, table_name: str, key: str, n_buckets: int = 8
) -> None:
    """Persist ``df`` as a bucketed+sorted session-catalog table; every
    later equi-join between tables bucketed on the same (key, n_buckets)
    is shuffle-free."""
    (
        df.write.bucketBy(n_buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table_name)
    )


def _orderable(dt) -> bool:
    """Whether Spark can sort values of this type (maps cannot; arrays and
    structs are orderable iff their element/field types are)."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    if isinstance(dt, MapType):
        return False
    if isinstance(dt, ArrayType):
        return _orderable(dt.elementType)
    if isinstance(dt, StructType):
        return all(_orderable(f.dataType) for f in dt.fields)
    return True


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """Backward as-of join: for every left row, attach the LATEST right row
    of the same ``key`` with ``right_ts <= left_ts`` (nulls when none) —
    the time-series join Spark has no native operator for (DuckDB/ kdb
    ``ASOF JOIN`` semantics, equal timestamps match).

    Implementation is the union-tag trick, a pure composition of built-in
    ops: tag both sides, sort per key by (ts, tag) in ONE window, and carry
    the last non-null right payload forward onto left rows.  The payload
    travels as ONE struct, so the matched right ROW is carried atomically:
    a NULL field of the matched row surfaces as NULL (it is not silently
    replaced by an older row's value) and a multi-column payload can never
    mix values from different right rows.  Ties — multiple right rows with
    equal (key, ts) — resolve deterministically to the row with the
    greatest payload struct (Spark struct ordering), which requires the
    payload fields to be orderable types — a map-typed payload column
    raises a clear ValueError up front instead of a plan-time analyzer
    error.  Cost: a single
    shuffle on ``key`` — no range-explode, no per-row Python, and skew
    behaves like any keyed window (salt the key upstream if one key
    dominates).  Right payload columns must not collide with left columns;
    rename before joining."""
    from pyspark.sql import Window as W
    from pyspark.sql.types import StructField, StructType

    payload = [c for c in right.columns if c not in (key, right_ts)]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(f"right payload columns collide with left: {sorted(overlap)}")
    reserved = {"_ts", "_is_left", "_payload"} & (
        set(left.columns) | set(right.columns)
    )
    if reserved:
        raise ValueError(f"reserved column names in input: {sorted(reserved)}")
    if not payload:
        raise ValueError("right side has no payload columns besides key/ts")

    left_rest = [c for c in left.columns if c != key]
    unorderable = [
        c for c in payload if not _orderable(right.schema[c].dataType)
    ]
    if unorderable:
        raise ValueError(
            "as_of_join tie-breaks on the payload struct, which requires "
            f"orderable payload types; non-orderable columns: {sorted(unorderable)} "
            "— cast map columns to orderable shapes (e.g. sorted "
            "map_entries arrays) or attach a surrogate tie-break column "
            "before joining"
        )
    payload_type = StructType(
        [StructField(c, right.schema[c].dataType, True) for c in payload]
    )
    l_tagged = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        *left_rest,
        F.lit(None).cast(payload_type).alias("_payload"),
    )
    r_tagged = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_rest
        ],
        F.struct(*payload).alias("_payload"),
    )

    unioned = l_tagged.unionByName(r_tagged)
    # right rows (tag 0) sort before left rows (tag 1) at equal ts, so an
    # exactly-simultaneous right row IS matched (ASOF >= semantics); the
    # payload struct is the deterministic tie-break among equal-ts right
    # rows (left rows all have NULL payload — their mutual order is moot)
    w = (
        W.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_is_left").asc(), F.col("_payload").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    carried = unioned.select(
        key,
        "_is_left",
        *left_rest,
        F.last("_payload", ignorenulls=True).over(w).alias("_payload"),
    )
    return carried.where(F.col("_is_left") == 1).select(
        key,
        *left_rest,
        *[F.col(f"_payload.{c}").alias(c) for c in payload],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 86400,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Point-in-interval join (``start <= point < end``, same ``key``)
    without the cartesian blow-up of a naive non-equi join.

    The classic bucketize composition: every interval explodes into the
    time buckets it covers, every point maps to its one bucket, and the
    join becomes an EQUI-join on (key, bucket) followed by the exact range
    filter.  Shuffle volume is O(points + intervals · buckets_per_interval)
    instead of O(points · intervals); pick ``bucket_seconds`` near the
    typical interval length so intervals explode into ~1-2 buckets.

    ``broadcast_intervals=True`` is for PROVABLY dimension-sized interval
    sets (calendars, maintenance windows, per-key config epochs): the
    exploded interval side broadcasts and the corpus-scale point side is
    never shuffled at all (guide §3.1 — size estimates after a distinct/
    derive are unreliable, so the caller's knowledge beats the planner's).
    Leave False when the interval set can scale with the corpus."""
    bucket_of = lambda c: F.floor(F.unix_timestamp(c) / bucket_seconds)
    p = points.withColumn("_b", bucket_of(F.col(point_col)))
    # an inverted interval (end <= start) can never match, and would make
    # F.sequence emit a huge DESCENDING bucket list — drop it up front
    intervals = intervals.where(F.col(end_col) > F.col(start_col))
    iv = intervals.withColumn(
        "_b",
        F.explode(
            F.sequence(
                bucket_of(F.col(start_col)),
                # end is exclusive: a zero-length tail bucket is still listed,
                # the exact filter below discards non-matches
                bucket_of(F.expr(f"{end_col} - INTERVAL 1 SECOND")),
            )
        ),
    )
    if broadcast_intervals:
        iv = F.broadcast(iv)
    return (
        p.join(iv, [key, "_b"])
        .where(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("_b")
    )


def bucketed_join(
    spark, left_table: str, right_table: str, key: str, select: Sequence[str] = ()
) -> DataFrame:
    """Join two same-bucketed catalog tables on ``key``.  The physical plan
    contains no Exchange: each task reads bucket i of both sides."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    out = lt.join(rt, key)
    return out.select(*select) if select else out
