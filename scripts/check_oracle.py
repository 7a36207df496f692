"""Local replica of the driver's correctness gate.

Runs each ``queries()`` entry on Spark AND its ``oracle_sql()`` on DuckDB
over the same sf parquet tables, then compares row count, column names, and
an order-insensitive value comparison. Usage:

    python scripts/check_oracle.py [q_name ...]        # default: all, sf0.01
    SF_DIR=/root/testdata/sf0.001 python scripts/check_oracle.py q_tpch_q1
"""

from __future__ import annotations

import datetime as _dt
import decimal
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return v
    if isinstance(v, decimal.Decimal):
        return float(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if hasattr(v, "item"):  # numpy scalar
        return _norm_cell(v.item())
    if isinstance(v, (list, tuple)):
        return tuple(_norm_cell(x) for x in v)
    return v


def complex_top_level_cols(schema) -> list:
    """Driver-compatibility lint: column names whose top-level type is
    Array/Map/Struct.  The driver's pandas canonicalizer sorts rows by
    value and throws ``unhashable type: 'list'`` on such columns (round-4
    `q_emb_transform` incident), so any hash-checked ``queries()`` entry
    returning one is a guaranteed red driver row even when values are
    correct.  Rows-only entries (no oracle) are exempt — the driver never
    value-compares them."""
    from pyspark.sql import types as T

    return [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]


def _normalize(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[i]) for i in order))
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


def main():
    import duckdb

    import __spark_entry__ as entrymod
    from pyspark.sql import SparkSession

    wanted = sys.argv[1:]
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = wanted or sorted(qs)

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("oracle-check")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{p}'")

    n_pass = n_fail = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NO SUCH QUERY")
            n_fail += 1
            continue
        t0 = time.time()
        try:
            sdf = qs[name](spark, SF_DIR)
            if name in oracles:
                bad = complex_top_level_cols(sdf.schema)
                if bad:
                    print(
                        f"{name}: DRIVER-SHAPE LINT FAIL — top-level "
                        f"array/map/struct columns {bad} break the driver's "
                        f"pandas canonicalizer; serialize them (to_json / "
                        f"concat_ws) on both sides"
                    )
                    n_fail += 1
                    continue
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"{name}: SPARK ERROR: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"{name}: rows-only (no oracle) — {len(s_rows)} rows "
                  f"[{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            res = con.execute(oracles[name])
            d_cols = [d[0] for d in res.description]
            d_rows = res.fetchall()
        except Exception as e:
            print(f"{name}: DUCKDB ERROR: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        sc, sn = _normalize(s_cols, s_rows)
        dc, dn = _normalize(d_cols, d_rows)
        ok = True
        msgs = []
        if sc != dc:
            ok = False
            msgs.append(f"cols spark={sc} duckdb={dc}")
        if len(sn) != len(dn):
            ok = False
            msgs.append(f"rowcount spark={len(sn)} duckdb={len(dn)}")
        if ok and sn != dn:
            ok = False
            diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            msgs.append(f"values differ, first diffs: {diffs}")
        if ok:
            print(f"{name}: OK ({len(sn)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"{name}: MISMATCH — " + "; ".join(msgs))
            n_fail += 1
    print(f"\n{n_pass} ok, {n_fail} failed")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
