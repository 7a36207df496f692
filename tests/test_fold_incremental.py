"""Checkpointed (incremental) V4 fold: merge(fold(log[..S]), fold(log[S..]))
must equal fold(log) at EVERY split point S — the associativity the
Delta-style checkpoint path relies on."""

import os

from chronicles_spark.plans import log_queries as LQ
from chronicles_spark.plans.synthetic_log import head_ref_df, ops_log_df

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_TEST", "/root/testdata/sf0.001")


def _rows(df):
    return sorted((r["part"], r["version"]) for r in df.collect())


def test_incremental_fold_equals_full_at_every_split(spark):
    ops = ops_log_df(spark, SF_DIR).cache()
    head = head_ref_df(spark, SF_DIR)
    full = _rows(LQ.current_version_fold(ops, head, "demo.events"))

    # precondition: checkpoint_seq <= head cutoff (a checkpoint taken past
    # the head would bake in ops the time-travel cutoff must exclude)
    head_seq = head.where(head.table_name == "demo.events").collect()[0]["head_seq"]
    # sweep split points incl. 0 (empty checkpoint) and head_seq (empty tail)
    for s in {0, 1, 5, 15, head_seq // 2, head_seq - 1, head_seq}:
        ckpt = LQ.fold_state_checkpoint(ops, upto_seq=s, table_name="demo.events")
        inc = LQ.current_version_fold_incremental(
            ops, ckpt, s, head, "demo.events"
        )
        assert _rows(inc) == full, f"split at seq {s} diverged"
    ops.unpersist()


def test_checkpoint_roundtrips_through_parquet(spark, tmp_path):
    ops = ops_log_df(spark, SF_DIR)
    head = head_ref_df(spark, SF_DIR)
    full = _rows(LQ.current_version_fold(ops, head, "demo.events"))

    path = str(tmp_path / "fold_ckpt")
    LQ.fold_state_checkpoint(ops, upto_seq=10).write.parquet(path)
    ckpt = spark.read.parquet(path)
    inc = LQ.current_version_fold_incremental(ops, ckpt, 10, head, "demo.events")
    assert _rows(inc) == full
