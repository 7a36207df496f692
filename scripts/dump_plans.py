"""Dump full `.explain("formatted")` output for declared queries into a
directory — the before/after plan evidence for optimization rounds.

Usage:
    python scripts/dump_plans.py <outdir> <suffix> [q_name ...]
e.g.
    python scripts/dump_plans.py plans/r14 before          # all queries()
    python scripts/dump_plans.py plans/r14 after q_tpch_q3
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_AUDIT", "/root/testdata/sf0.01")


def main() -> int:
    outdir, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    os.makedirs(outdir, exist_ok=True)

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("chronicles-dump-plans")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = dict(entry.queries())

    def _q_fold_incremental(spark, sf):
        # bench-only row (merged into q_current_version_fold in r6)
        from chronicles_spark.plans import log_queries as LQ
        from chronicles_spark.plans.synthetic_log import head_ref_df, ops_log_df

        ops = ops_log_df(spark, sf)
        ckpt = LQ.fold_state_checkpoint(ops, upto_seq=15, table_name="demo.events")
        return LQ.current_version_fold_incremental(
            ops, ckpt, 15, head_ref_df(spark, sf), "demo.events"
        )

    qs["q_fold_incremental"] = _q_fold_incremental
    if not names:
        names = sorted(qs)
    failed = 0
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as e:
            plan = f"PLAN FAILED: {type(e).__name__}: {e}\n"
            failed += 1
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"{name}: {len(plan)} bytes")
    spark.stop()
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
