"""The local gate's driver-shape lint (scripts/check_oracle.py).

Round-4 incident: `q_emb_transform` returned top-level array columns; the
driver's pandas canonicalizer threw ``unhashable type: 'list'`` before any
value comparison, leaving a value-correct query red on the scoreboard for a
whole round.  The lint makes that class of failure fail LOCALLY: any
hash-checked ``queries()`` entry whose Spark schema has a top-level
Array/Map/Struct column is rejected by ``scripts/check_oracle.py`` before
the compare runs.
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from check_oracle import complex_top_level_cols  # noqa: E402

# slow tier: re-runs every hash-checked query; scripts/check_oracle.py covers the same surface more strictly (run via -m "slow or not slow")
pytestmark = pytest.mark.slow


def test_lint_rejects_synthetic_array_map_struct(spark):
    from pyspark.sql import functions as F

    df = spark.range(3).select(
        "id",
        F.array(F.lit(1), F.lit(2)).alias("arr"),
        F.create_map(F.lit("k"), F.lit(1)).alias("mp"),
        F.struct(F.lit(1).alias("a")).alias("st"),
        F.lit("ok").alias("s"),
    )
    assert complex_top_level_cols(df.schema) == ["arr", "mp", "st"]


def test_lint_accepts_scalar_schema(spark):
    from pyspark.sql import functions as F

    df = spark.range(3).select("id", F.lit(1.5).alias("x"), F.lit("s").alias("y"))
    assert complex_top_level_cols(df.schema) == []


def test_all_hash_checked_queries_are_scalar_shaped(spark):
    """Every queries() entry WITH an oracle must produce a scalar-only
    top-level schema.  Schema-only check (limit(0)-style plan analysis —
    no data is computed), so it is cheap enough to sweep all entries.

    Entries whose schema needs the lifecycle fixture to materialize are
    exercised via the real check_oracle gate instead (they build temp
    tables; running them all here would duplicate the gate).  We sweep the
    pure-read entries, which include every past offender shape.
    """
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    sf = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")
    # lifecycle entries build temp versioned tables; skip for speed
    lifecycle = {
        "q_versioned_write_roundtrip",
        "q_time_travel_read",
        "q_compact_roundtrip",
        "q_read_changes",
        "q_vacuum_dry_run",
        "q_log_json_read",
    }
    offenders = {}
    for name, fn in qs.items():
        if name not in oracles or name in lifecycle:
            continue
        try:
            sdf = fn(spark, sf)
        except Exception as e:  # pragma: no cover - surfaced as test failure
            pytest.fail(f"{name} failed to build a plan: {e}")
        bad = complex_top_level_cols(sdf.schema)
        if bad:
            offenders[name] = bad
    assert offenders == {}, f"driver-shape lint offenders: {offenders}"
