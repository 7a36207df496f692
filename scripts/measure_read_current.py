"""Measure read_current's driver-side O(partitions) term (round 14,
VERDICT r13 #7): the current-view read materializes the live path list
on the DRIVER (spark/reader.py::live_paths) and hands Spark a
load(paths) plan with one concrete directory per partition.  This
script characterizes both halves at wide-table scale so docs/scale.md
records a MEASURED bound, not an argued one:

* metadata plane (no Spark): fold-state -> live_paths wall time and
  path-list memory at 1e5 and 1e6 synthetic partitions;
* Spark plane (real files): read_version plan+count wall time at
  geometrically growing REAL partition counts (one tiny parquet per
  partition), so the per-partition planning cost is a fitted slope.

Run: python scripts/measure_read_current.py [--max-real 32000]
Prints one JSON object; paste the numbers into docs/scale.md when they
move materially.
"""

import argparse
import json
import os
import shutil
import sys
import time
import tracemalloc

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from chronicles_spark.core.model import (  # noqa: E402
    Partition,
    PartitionSchema,
    TableDefinition,
    TableName,
)
from chronicles_spark.core.version import generate_version  # noqa: E402
from chronicles_spark.core.model import (  # noqa: E402
    PartitionedTableVersion,
)


def measure_metadata_plane(n: int) -> dict:
    from chronicles_spark.spark.reader import live_paths

    table = TableDefinition(
        TableName("db", "wide"), "/data/wide", PartitionSchema(("p",))
    )
    v = generate_version()
    pv = {Partition.of(("p", str(i))): v for i in range(n)}
    state = PartitionedTableVersion(pv)
    tracemalloc.start()
    t0 = time.monotonic()
    paths = live_paths(table, state)
    dt = time.monotonic() - t0
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    total_bytes = sum(sys.getsizeof(p) for p in paths)
    return {
        "partitions": n,
        "live_paths_sec": round(dt, 3),
        "path_list_bytes": total_bytes,
        "tracemalloc_peak_bytes": peak,
    }


def _make_wide_table(root: str, p: int, seed_file: str, label: str):
    for i in range(p):
        d = os.path.join(root, f"p={i}", f"_version={label}")
        os.makedirs(d)
        shutil.copyfile(seed_file, os.path.join(d, "part-0.parquet"))


def measure_spark_plane(spark, tmp: str, counts) -> list:
    from chronicles_spark.spark.reader import read_version

    label = generate_version().label
    seed_dir = os.path.join(tmp, "_seed")
    spark.range(1).selectExpr("id", "id * 2 AS v").coalesce(1).write.parquet(
        seed_dir
    )
    seed_file = next(
        os.path.join(seed_dir, f)
        for f in os.listdir(seed_dir)
        if f.endswith(".parquet")
    )
    out = []
    for p in counts:
        root = os.path.join(tmp, f"wide_{p}")
        t0 = time.monotonic()
        _make_wide_table(root, p, seed_file, label)
        setup = time.monotonic() - t0
        table = TableDefinition(
            TableName("db", f"wide{p}"), root, PartitionSchema(("p",))
        )
        v = generate_version()
        v = type(v)(label)  # the label the dirs carry
        pv = {Partition.of(("p", str(i))): v for i in range(p)}
        state = PartitionedTableVersion(pv)
        t0 = time.monotonic()
        df = read_version(spark, table, state)
        plan_sec = time.monotonic() - t0
        t0 = time.monotonic()
        n = df.count()
        count_sec = time.monotonic() - t0
        assert n == p
        out.append(
            {
                "partitions": p,
                "plan_sec": round(plan_sec, 2),
                "count_sec": round(count_sec, 2),
                "setup_sec": round(setup, 1),
            }
        )
        print(json.dumps(out[-1]), file=sys.stderr, flush=True)
        shutil.rmtree(root)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-real", type=int, default=32000)
    args = ap.parse_args()

    result = {"metadata_plane": [], "spark_plane": []}
    for n in (100_000, 1_000_000):
        result["metadata_plane"].append(measure_metadata_plane(n))
        print(json.dumps(result["metadata_plane"][-1]), file=sys.stderr)

    import tempfile

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    counts = [2000, 8000]
    if args.max_real >= 32000:
        counts.append(32000)
    with tempfile.TemporaryDirectory() as tmp:
        result["spark_plane"] = measure_spark_plane(spark, tmp, counts)
    # fitted per-partition slope between the two largest real points
    a, b = result["spark_plane"][-2], result["spark_plane"][-1]
    tot_a = a["plan_sec"] + a["count_sec"]
    tot_b = b["plan_sec"] + b["count_sec"]
    result["per_partition_us"] = round(
        (tot_b - tot_a) / (b["partitions"] - a["partitions"]) * 1e6, 1
    )
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
