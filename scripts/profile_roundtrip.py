"""Per-phase profile of the versioned-write roundtrip (round-14 VERDICT
#9: q_versioned_write_roundtrip is the most serial heavy row — find the
driver sections before picking a fix).

Times each phase of the bench's `_fresh_roundtrip` body (fresh table, v1
insert of every events partition, one-partition overwrite, current-view
read-back) and, within each versioned_insert_into, the write job vs the
listing discovery vs the commit — via cProfile cumulative times of the
writer's internals.  Prints one JSON line.
"""

from __future__ import annotations

import cProfile
import io
import json
import os
import pstats
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    from chronicles_spark.core.model import PartitionSchema, TableDefinition, TableName
    from chronicles_spark.trackers.files import FileBackedVersionTracker
    from chronicles_spark.spark.writer import versioned_insert_into
    from chronicles_spark.spark.reader import read_current

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("profile-roundtrip")
        .config("spark.sql.shuffle.partitions", str(2 * int(CPUS)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    events = (
        spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
        .withColumn("event_date", F.col("ts").cast("date").cast("string"))
    )
    one_day = events.where(F.col("event_date") == "2024-01-05")

    out = {"runs": []}
    for run in range(3):
        rt_dir = tempfile.mkdtemp(prefix="profile_rt_")
        trk = FileBackedVersionTracker(rt_dir + "/_log")
        tbl = TableDefinition(
            TableName("bench", "rt"), rt_dir + "/events",
            PartitionSchema(("event_date",)),
        )
        trk.init_table(tbl.name, is_snapshot=False, user_id="bench")
        phases = {}
        pr = cProfile.Profile()
        pr.enable()
        t0 = time.monotonic()
        versioned_insert_into(events, tbl, trk, "bench", "v1")
        phases["v1_insert"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        versioned_insert_into(one_day, tbl, trk, "bench", "redo")
        phases["overwrite"] = round(time.monotonic() - t0, 3)
        t0 = time.monotonic()
        read_current(spark, tbl, trk).count()
        phases["read_back"] = round(time.monotonic() - t0, 3)
        pr.disable()
        s = io.StringIO()
        st = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        st.print_stats(
            r"writer\.py|reader\.py|trackers|filesystem|discovery|schema_guard|stats\.py"
        )
        hot = [
            ln for ln in s.getvalue().splitlines()
            if "chronicles_spark" in ln
        ][:25]
        out["runs"].append({"phases": phases, "hot": hot})
        spark.catalog.clearCache()
        import shutil

        shutil.rmtree(rt_dir, ignore_errors=True)

    print(json.dumps(out, indent=1))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
