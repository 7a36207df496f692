"""Plan-shape audit: print each headline query's physical plan summary —
Exchange (shuffle) count, WholeStageCodegen spans, Python evals, pushed
filters — so plan regressions are visible as a diff, not a bench delta.

Usage:
    python scripts/explain_audit.py [q_name ...]       # default: headline set
    python scripts/explain_audit.py --full q_tpch_q3   # full formatted plan

Heuristics flagged (printed with '!!'):
  * BatchEvalPython / ArrowEvalPython outside the multimodal decode ops
    (Python on a hot path);
  * CartesianProduct anywhere;
  * a scan with no PushedFilters on a query that filters.
"""

from __future__ import annotations

import io
import os
import re
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_AUDIT", "/root/testdata/sf0.01")

HEADLINE = [
    "q_current_version_fold", "q_compute_changes", "q_partition_filter",
    "q_tpch_q3", "q_token_count", "q_repetition_signals",
    "q_dedup_exact", "q_dedup_minhash_lsh", "q_dedup_ngram_jaccard",
    "q_dedup_simhash_pairs", "q_dedup_embedding", "q_dedup_clusters",
    "q_ann_cosine_topk", "q_ann_index_search", "q_mm_decode_meta",
    "q_asof_join", "q_range_join", "q_sessionize", "q_curate_corpus",
    "q_pack_sequences", "q_training_shards", "q_stratified_sample",
    # round 8 (the q_updates_log adjudication): the log-algebra rows are
    # audited too, so "byte-identical plans" is checked, not asserted
    "q_updates_log", "q_snapshot_version_fold", "q_tables_list",
    "q_table_state_group", "q_lang_id", "q_dedup_incremental",
    "q_emb_transform", "q_running_totals",
    # round 9: the checkpointed incremental fold (bench-only since its
    # row merged into q_current_version_fold) — audited so plan drift is
    # a diff, not an inference (the r8 q_fold_incremental adjudication);
    # plus the embedding dedup index's new hash-checked row
    "q_fold_incremental", "q_dedup_emb_incremental",
    # round 10: the incremental cluster-fold row
    "q_dedup_clusters_incremental",
    # round 11 (VERDICT r10 #4): the two sub-second metadata movers not
    # previously audited — their r10 1.3-1.5x drift adjudicated as
    # session-floor wobble (plans byte-identical; BASELINE.md r11 note);
    # audited from now on so future drift is a diff
    "q_version_paths", "q_partition_expr_render",
    # round 14: the merged top-ngrams+contamination union row (its plan
    # changed by construction) and the SemDeDup family's new
    # hash-checked row — audited from day one
    "q_top_ngrams", "q_semantic_dedup",
]

# Python appears legitimately only where Python IS the payload
PYTHON_OK = {"q_mm_decode_meta"}  # frame-sample merged in (round 10)

# queries whose scans MUST show pushed filters (a selective predicate on a
# parquet source); pushed_filter_scans == 0 here means pushdown broke
EXPECT_PUSHDOWN = {"q_partition_filter", "q_tpch_q3", "q_ann_cosine_topk",
                   "q_ann_index_search", "q_asof_join",
                   "q_range_join"}


def _plan_text(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def summarize(name: str, plan: str) -> str:
    n_exchange = len(re.findall(r"\bExchange\b", plan))
    n_codegen = len(
        set(re.findall(r"WholeStageCodegen \((\d+)\)", plan))
        | set(re.findall(r"codegen id : (\d+)", plan))
    )
    n_python = len(re.findall(r"(?:Batch|Arrow)EvalPython|MapInPandas|FlatMapGroupsInPandas", plan))
    n_cartesian = len(re.findall(r"CartesianProduct", plan))
    n_bcast = len(re.findall(r"BroadcastExchange|BroadcastHashJoin|BroadcastNestedLoop", plan))
    pushed = len(re.findall(r"PushedFilters: \[[^\]]", plan))
    flags = []
    if n_python and name not in PYTHON_OK:
        flags.append(f"!! {n_python} Python eval(s)")
    if n_cartesian:
        flags.append(f"!! {n_cartesian} CartesianProduct")
    if name in EXPECT_PUSHDOWN and pushed == 0:
        flags.append("!! filter pushdown lost")
    return (
        f"{name:28s} exchanges={n_exchange:2d} codegen_spans={n_codegen:2d} "
        f"broadcast={n_bcast:2d} python={n_python} pushed_filter_scans={pushed}"
        + ("  " + " ".join(flags) if flags else "")
    )


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    full = "--full" in sys.argv

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[4]")
        .appName("chronicles-explain-audit")
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
        # not a queries() row (merged into q_current_version_fold in r6)
        # but still benchmarked — audit the plan of the checkpointed
        # O(tail) fold path directly
        from chronicles_spark.plans import log_queries as LQ
        from chronicles_spark.plans.synthetic_log import (
            head_ref_df,
            ops_log_df,
        )

        ops = ops_log_df(spark, sf)
        ckpt = LQ.fold_state_checkpoint(
            ops, upto_seq=15, table_name="demo.events"
        )
        return LQ.current_version_fold_incremental(
            ops, ckpt, 15, head_ref_df(spark, sf), "demo.events"
        )

    qs["q_fold_incremental"] = _q_fold_incremental
    names = args or [n for n in HEADLINE if n in qs]
    bad = 0
    for name in names:
        try:
            plan = _plan_text(qs[name](spark, SF_DIR))
        except Exception as e:  # plan-time failure is itself a finding
            print(f"{name:28s} PLAN FAILED: {type(e).__name__}: {str(e)[:120]}")
            bad += 1
            continue
        line = summarize(name, plan)
        print(line)
        if "!!" in line:
            bad += 1
        if full:
            print(plan)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
