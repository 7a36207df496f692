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
    inputs).  Result columns = plain join's."""
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


def bucketed_join(
    spark, left_table: str, right_table: str, key: str, select: Sequence[str] = ()
) -> DataFrame:
    """Join two same-bucketed catalog tables on ``key``.  The physical plan
    contains no Exchange: each task reads bucket i of both sides."""
    lt = spark.table(left_table)
    rt = spark.table(right_table)
    out = lt.join(rt, key)
    return out.select(*select) if select else out
