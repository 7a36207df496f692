"""CLI behaviour tests ≙ cli/src/test/scala/dev/chronicles/cli/
ChroniclesCliSpec.scala:13-131 (parser, config, end-to-end console output),
plus the partition add/remove verbs (exercised there via CliClient)."""

from __future__ import annotations

import re

import pytest

from chronicles_spark import cli as C
from chronicles_spark.core.model import TableName
from chronicles_spark.trackers import InMemoryVersionTracker
from chronicles_spark.versioned_metastore import VersionedMetastore


def make_client(console=None):
    console = console or C.CapturingConsole()
    tracker = InMemoryVersionTracker()
    client = C.CliClient(VersionedMetastore(tracker, C.StubMetastore()), console)
    return client, console


# -- argument parsing (ChroniclesCliSpec.scala:15-40) -----------------------


def test_no_command_complains_with_usage():
    with pytest.raises(C.CliError, match="Usage"):
        C.parse_action([])


def test_tables_command_parses():
    _, action = C.parse_action(["tables"])
    assert action == C.ListTables()


def test_tables_with_extra_args_is_error():
    with pytest.raises(C.CliError):
        C.parse_action(["tables", "foo"])


def test_log_command_parses_table_name():
    _, action = C.parse_action(["log", "schema.table_name"])
    assert action == C.ShowTableHistory(TableName("schema", "table_name"))


def test_init_requires_message():
    with pytest.raises(C.CliError):
        C.parse_action(["init", "db.t"])


def test_partition_parses_add_and_remove():
    _, add = C.parse_action(["partition", "add", "db.t", "date=2019-01-01", "--message", "m"])
    assert add == C.AddPartitionAction(TableName("db", "t"), "date=2019-01-01", "m")
    _, rem = C.parse_action(["partition", "remove", "db.t", "date=2019-01-01", "--message", "m"])
    assert rem == C.RemovePartitionAction(TableName("db", "t"), "date=2019-01-01", "m")


def test_partition_bogus_operation_is_error():
    with pytest.raises(C.CliError):
        C.parse_action(["partition", "frobnicate", "db.t", "date=1", "--message", "m"])


# -- config parsing (ChroniclesCliSpec.scala:42-100) ------------------------


def test_mem_config_parses():
    assert C.parse_config('type: "mem-config"') == C.Config(type="mem-config")


def test_db_config_parses():
    cfg = C.parse_config(
        """
        type: "db-config"
        db-type: sqlite
        db-name: "/tmp/foo.db"
        """
    )
    assert cfg == C.Config(type="db-config", db_name="/tmp/foo.db")


def test_files_config_parses():
    cfg = C.parse_config("type: files-config\nroot: /tmp/log")
    assert cfg == C.Config(type="files-config", root="/tmp/log")


def test_unknown_db_type_is_invalid_configuration():
    with pytest.raises(C.CliError, match="[Ii]nvalid configuration"):
        C.parse_config("type: db-config\ndb-type: bogobase\ndb-name: x")


def test_unknown_config_type_is_invalid_configuration():
    with pytest.raises(C.CliError, match="[Ii]nvalid configuration"):
        C.parse_config("type: wat-config")


# -- end-to-end console scenarios (ChroniclesCliSpec.scala:102-131) ---------


def test_add_and_list_tables_shows_all_tables():
    client, console = make_client()
    C.run(["tables"], client, console, "user-1")
    C.run(["init", "db.test_table", "--message", "Initial commit"], client, console, "user-1")
    C.run(["tables"], client, console, "user-1")
    assert console.out == ["Initialised table db.test_table", "db.test_table"]


def test_invalid_table_name_reports_helpful_error():
    client, console = make_client()
    code = C.run(["init", "invalid name", "--message", "m"], client, console, "user-1")
    assert code == 1
    assert console.out == []
    assert len(console.err) == 1
    assert "invalid name" in console.err[0]


def test_partition_add_list_remove_roundtrip():
    client, console = make_client()
    C.run(["init", "db.t", "--message", "init"], client, console, "u")
    code = C.run(
        ["partition", "add", "db.t", "date=2019-01-31", "--message", "add it"],
        client, console, "u",
    )
    assert code == 0
    assert console.out[-1] == "Added partition 'date=2019-01-31' to table 'db.t'"

    C.run(["partitions", "db.t"], client, console, "u")
    # "<partition> <version-label>" lines (CliClient.scala:38-41)
    assert re.match(r"^date=2019-01-31 \d{8}-\d{6}\.\d{9}-[0-9a-f-]{36}$", console.out[-1])

    code = C.run(
        ["partition", "remove", "db.t", "date=2019-01-31", "--message", "drop it"],
        client, console, "u",
    )
    assert code == 0
    # reference bug (prints "Added", CliClient.scala:94) deliberately not copied
    assert console.out[-1] == "Removed partition 'date=2019-01-31' from table 'db.t'"

    C.run(["partitions", "db.t"], client, console, "u")
    assert console.out[-1] == ""


def test_log_lists_history_most_recent_first():
    client, console = make_client()
    C.run(["init", "db.t", "--message", "first"], client, console, "u")
    C.run(["partition", "add", "db.t", "date=2019-01-01", "--message", "second"], client, console, "u")
    C.run(["log", "db.t"], client, console, "u")
    log_lines = console.out[2:]
    assert len(log_lines) == 2
    # id \t timestamp \t user \t message (CliClient.scala:60-66)
    assert log_lines[0].split("\t")[3] == "second"
    assert log_lines[1].split("\t")[3] == "first"
    assert all(len(l.split("\t")) == 4 for l in log_lines)


def test_partitions_on_snapshot_table_errors():
    client, console = make_client()
    C.run(["init", "db.snap", "--isSnapshot", "--message", "m"], client, console, "u")
    code = C.run(["partitions", "db.snap"], client, console, "u")
    assert code == 1
    assert "unpartitioned" in console.err[-1]


def test_log_unknown_table_errors():
    client, console = make_client()
    code = C.run(["log", "db.nope"], client, console, "u")
    assert code == 1
    assert "db.nope" in console.err[-1]


# -- main() end-to-end with a files-config over separate invocations --------


def test_main_files_config_persists_across_invocations(tmp_path, monkeypatch, capsys):
    cfg = tmp_path / "config"
    cfg.write_text(f"type: files-config\nroot: {tmp_path}/log\n")
    monkeypatch.setenv("CHRONICLES_CONFIG", str(cfg))

    assert C.main(["init", "db.events", "--message", "init"]) == 0
    assert C.main(["partition", "add", "db.events", "date=2024-01-01", "--message", "m"]) == 0
    assert C.main(["tables"]) == 0
    assert C.main(["partitions", "db.events"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert "Initialised table db.events" in out
    assert "db.events" in out
    assert any(l.startswith("date=2024-01-01 ") for l in out)


def test_main_missing_config_reports_error(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("CHRONICLES_CONFIG", str(tmp_path / "nope"))
    assert C.main(["tables"]) == 1
    assert "configuration" in capsys.readouterr().err.lower()


def test_main_db_config_sqlite(tmp_path, monkeypatch, capsys):
    cfg = tmp_path / "config"
    cfg.write_text(f'type: db-config\ndb-type: sqlite\ndb-name: {tmp_path}/c.db\n')
    monkeypatch.setenv("CHRONICLES_CONFIG", str(cfg))
    assert C.main(["init", "db.t", "--message", "m"]) == 0
    assert C.main(["tables"]) == 0
    out = capsys.readouterr().out.splitlines()
    assert out == ["Initialised table db.t", "db.t"]


def test_checkout_parses():
    _, action = C.parse_action(["checkout", "db.t", "abc-123"])
    assert action == C.CheckoutAction(C.TableName.parse("db.t"), "abc-123")


def test_checkout_rolls_back_and_forward():
    client, console = make_client()
    C.run(["init", "db.t", "--message", "init"], client, console, "u")
    C.run(["partition", "add", "db.t", "date=2019-01-01", "--message", "w1"],
          client, console, "u")
    C.run(["partition", "add", "db.t", "date=2019-01-02", "--message", "w2"],
          client, console, "u")

    # find the commit id that added only the first partition
    C.run(["log", "db.t"], client, console, "u")
    lines = [l for l in console.out if "\t" in l]
    w1_commit = [l.split("\t")[0] for l in lines if l.endswith("w1")][0]
    head_commit = [l.split("\t")[0] for l in lines if l.endswith("w2")][0]

    code = C.run(["checkout", "db.t", w1_commit], client, console, "u")
    assert code == 0
    assert console.out[-1] == f"Checked out commit '{w1_commit}' on table 'db.t'"
    C.run(["partitions", "db.t"], client, console, "u")
    assert "date=2019-01-01" in console.out[-1]
    assert "date=2019-01-02" not in console.out[-1]

    # roll forward to head again
    C.run(["checkout", "db.t", head_commit], client, console, "u")
    C.run(["partitions", "db.t"], client, console, "u")
    assert "date=2019-01-02" in console.out[-1]


def test_checkout_unknown_commit_errors():
    client, console = make_client()
    C.run(["init", "db.t", "--message", "init"], client, console, "u")
    code = C.run(["checkout", "db.t", "no-such-commit"], client, console, "u")
    assert code == 1


# -- vacuum verb (extension; spark/vacuum.py driver path) -------------------


def test_vacuum_parses_and_defaults_to_dry_run():
    _, action = C.parse_action(["vacuum", "db.t", "--location", "/lake/t"])
    assert action == C.VacuumAction(TableName("db", "t"), "/lake/t", 1, False)
    _, action = C.parse_action(
        ["vacuum", "db.t", "--location", "/lake/t", "--keep-last", "3", "--apply"]
    )
    assert action == C.VacuumAction(TableName("db", "t"), "/lake/t", 3, True)


def test_vacuum_requires_location():
    with pytest.raises(C.CliError):
        C.parse_action(["vacuum", "db.t"])


def test_vacuum_dry_run_then_apply(tmp_path):
    """End-to-end over real directories: dry-run lists the superseded dir
    and deletes nothing; --apply removes it and keeps the live dir."""
    import os

    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import (
        AddPartitionVersion,
        TableUpdate,
        TableUpdateMetadata,
    )
    from chronicles_spark.core.version import generate_version

    client, console = make_client()
    t = TableName("db", "ev")
    client.delegate.tracker.init_table(t, is_snapshot=False, user_id="u")
    p = Partition.parse("date=2019-01-01")
    v_old, v_new = generate_version(), generate_version()
    for v in (v_old, v_new):
        client.delegate.tracker.commit(
            t, TableUpdate(TableUpdateMetadata.new("u", "w"), (AddPartitionVersion(p, v),))
        )
    loc = tmp_path / "ev"
    for v in (v_old, v_new):
        d = loc / "date=2019-01-01" / f"_version={v.label}"
        d.mkdir(parents=True)
        (d / "part-0.parquet").write_bytes(b"x")

    client.vacuum(C.VacuumAction(t, str(loc), 1, False))  # dry run
    out = console.out[-2:]
    assert v_old.label in out[0] and "Would remove 1" in out[1]
    assert os.path.exists(loc / "date=2019-01-01" / f"_version={v_old.label}")

    client.vacuum(C.VacuumAction(t, str(loc), 1, True))  # apply
    assert "Removed 1" in console.out[-1]
    assert not os.path.exists(loc / "date=2019-01-01" / f"_version={v_old.label}")
    assert os.path.exists(loc / "date=2019-01-01" / f"_version={v_new.label}")


def test_vacuum_sweep_orphans_flag(tmp_path):
    """--sweep-orphans parses and reclaims an aged, never-committed version
    directory the default verb leaves behind; depth comes from the log's
    real partitions, not the CLI's placeholder schema."""
    import os
    from datetime import datetime, timedelta, timezone

    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import (
        AddPartitionVersion,
        TableUpdate,
        TableUpdateMetadata,
    )
    from chronicles_spark.core.version import generate_version

    _, action = C.parse_action(
        ["vacuum", "db.t", "--location", "/lake/t", "--sweep-orphans",
         "--orphan-min-age-days", "2"]
    )
    assert action.sweep_orphans and action.orphan_min_age_days == 2.0

    client, console = make_client()
    t = TableName("db", "mp")
    client.delegate.tracker.init_table(t, is_snapshot=False, user_id="u")
    # TWO partition columns — the placeholder schema ("p",) would walk at
    # the wrong depth if vacuum didn't re-derive it from the log
    p = Partition.parse("date=2019-01-01/region=eu")
    v_live = generate_version()
    client.delegate.tracker.commit(
        t, TableUpdate(TableUpdateMetadata.new("u", "w"), (AddPartitionVersion(p, v_live),))
    )
    loc = tmp_path / "mp"
    live = loc / "date=2019-01-01" / "region=eu" / f"_version={v_live.label}"
    live.mkdir(parents=True)
    (live / "part-0.parquet").write_bytes(b"x")
    v_orph = generate_version(datetime.now(timezone.utc) - timedelta(days=9))
    orphan = loc / "date=2019-01-01" / "region=us" / f"_version={v_orph.label}"
    orphan.mkdir(parents=True)
    import time

    old = time.time() - 9 * 86400
    os.utime(orphan, (old, old))  # the sweep checks storage mtime too

    client.vacuum(C.VacuumAction(t, str(loc), 1, False))  # default: blind
    assert "Would remove 0" in console.out[-1]

    client.vacuum(C.VacuumAction(t, str(loc), 1, True, sweep_orphans=True))
    assert "Removed 1" in console.out[-1]
    assert not os.path.exists(orphan)
    assert os.path.exists(live)


def test_tag_verb_pin_list_delete():
    """tag verb: pin at head or --commit, list, immutability, --force,
    --delete; errors surface as exit-1 console messages."""
    client, console = make_client()
    t = TableName("db", "tg")
    client.delegate.tracker.init_table(t, is_snapshot=True, user_id="u")
    head = client.delegate.tracker.table_state(t).current_version

    assert C.run(["tag", "db.tg", "v1"], client, console, "u") == 0
    assert f"Tagged commit '{head}' as 'v1'" in console.out[-1]
    assert C.run(["tag", "db.tg"], client, console, "u") == 0
    assert console.out[-1] == f"v1 {head}"

    # immutable without --force; --force moves it; --delete drops it
    assert C.run(["tag", "db.tg", "v1"], client, console, "u") == 1
    assert "immutable" in console.err[-1]
    assert C.run(
        ["tag", "db.tg", "v1", "--commit", head, "--force"], client, console, "u"
    ) == 0
    assert C.run(["tag", "db.tg", "v1", "--delete"], client, console, "u") == 0
    assert C.run(["tag", "db.tg", "v1", "--delete"], client, console, "u") == 1
    assert "unknown tag" in console.err[-1]
    assert C.run(["tag", "db.tg", "--delete"], client, console, "u") == 1  # needs name


def test_parse_config_commit_mode(tmp_path):
    import chronicles_spark.cli as C

    cfg = C.parse_config("type: files-config\nroot: /tmp/log\ncommit-mode: cas")
    assert cfg.commit_mode == "cas"
    cfg = C.parse_config("type: files-config\nroot: /tmp/log\ncommit-mode: lock")
    assert cfg.commit_mode == "lock"
    assert C.parse_config("type: files-config\nroot: /x").commit_mode is None
    with __import__("pytest").raises(C.CliError, match="commit-mode"):
        C.parse_config("type: files-config\nroot: /x\ncommit-mode: wat")


def test_tracker_from_config_commit_modes(tmp_path):
    import chronicles_spark.cli as C

    tr = C.tracker_from_config(
        C.Config(type="files-config", root=str(tmp_path / "a"), commit_mode="cas")
    )
    assert tr._use_cas and not tr._use_lock
    tr = C.tracker_from_config(
        C.Config(type="files-config", root=str(tmp_path / "b"), commit_mode="lock")
    )
    assert tr._use_lock and not tr._use_cas
    tr = C.tracker_from_config(
        C.Config(type="files-config", root=str(tmp_path / "c"))
    )
    assert not tr._use_lock and not tr._use_cas


# -- round 8: the ANN index family's shell surface ---------------------------


def test_index_parse_and_validation():
    _, action = C.parse_action(
        ["index", "build", "db.idx", "--location", "/tmp/idx",
         "--input", "/tmp/emb.parquet", "--id-map-shards", "0"]
    )
    assert action.operation == "build" and action.id_map_shards is None
    with pytest.raises(C.CliError, match="needs --input"):
        C.parse_action(["index", "build", "db.idx", "--location", "/x"])
    with pytest.raises(C.CliError, match="needs --input"):
        C.parse_action(["index", "extend", "db.idx", "--location", "/x"])
    with pytest.raises(C.CliError):  # unknown operation rejected by argparse
        C.parse_action(["index", "explode", "db.idx", "--location", "/x"])
    _, va = C.parse_action(
        ["index", "vacuum-artifacts", "db.idx", "--location", "/x", "--apply"]
    )
    assert va.operation == "vacuum-artifacts" and va.apply


def test_index_lifecycle_end_to_end(spark, tmp_path):
    """build → partitions → extend → verify → rebuild → vacuum-artifacts,
    all through the console surface against a tmp-path index."""
    import os

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    emb = spark.range(24).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            F.sin(F.col("id") * F.lit(0.3 + j)).cast("double") for j in range(8)
        ]).alias("embedding"),
    )
    src1 = str(tmp_path / "emb1.parquet")
    src2 = str(tmp_path / "emb2.parquet")
    emb.where("vec_id < 16").write.parquet(src1)
    emb.where("vec_id >= 16").write.parquet(src2)
    loc = str(tmp_path / "idx")

    client, console = make_client()
    args = ["db.idx", "--location", loc, "--n-clusters", "2", "--m", "4",
            "--k-sub", "4", "--iters", "1", "--id-map-shards", "4"]
    assert C.run(
        ["index", "build", *args, "--input", src1], client, console, "u"
    ) == 0
    assert any("Built index 'db.idx'" in l for l in console.out)

    assert C.run(
        ["index", "extend", "db.idx", "--location", loc, "--input", src2],
        client, console, "u",
    ) == 0
    assert any("Extended index 'db.idx'" in l for l in console.out)

    assert C.run(
        ["index", "verify", "db.idx", "--location", loc], client, console, "u"
    ) == 0
    assert any("agree" in l for l in console.out)

    assert C.run(
        ["index", "rebuild", "db.idx", "--location", loc], client, console, "u"
    ) == 0
    assert C.run(
        ["index", "verify", "db.idx", "--location", loc], client, console, "u"
    ) == 0

    # make the build's superseded artifact sidecar reclaimable: vacuum the
    # data (keep only live versions), then sweep sidecars via the CLI
    from chronicles_spark.core.model import (
        PartitionSchema, TableDefinition, TableName,
    )
    from chronicles_spark.spark.vacuum import vacuum as run_vacuum

    tdef = TableDefinition(
        TableName("db", "idx"), loc, PartitionSchema(("bucket",))
    )
    run_vacuum(tdef, client.delegate.tracker, keep_last=1, dry_run=False)
    n_side = len([f for f in os.listdir(loc) if f.startswith("_ann_artifacts")])
    console.out.clear()
    assert C.run(
        ["index", "vacuum-artifacts", "db.idx", "--location", loc],
        client, console, "u",
    ) == 0
    assert any("Would remove" in l for l in console.out)
    assert C.run(
        ["index", "vacuum-artifacts", "db.idx", "--location", loc, "--apply"],
        client, console, "u",
    ) == 0
    left = len([f for f in os.listdir(loc) if f.startswith("_ann_artifacts")])
    assert left <= n_side

    # verify FAILS loudly (exit 1) when the map diverges: tear it by
    # rolling the MAP table back one commit
    tracker = client.delegate.tracker
    map_name = TableName("db", "idx_ids")
    ups = tracker.table_state(map_name).updates
    # roll back to the BUILD's map (missing every extended id)
    tracker.set_current_version(map_name, ups[1].metadata.commit_id)
    console.out.clear()
    assert C.run(
        ["index", "verify", "db.idx", "--location", loc], client, console, "u"
    ) == 1
    assert any("DISAGREE" in l for l in console.out or [])


# -- round 9: the dedup index families' shell surface -------------------------


def test_dedup_parse_and_validation():
    _, action = C.parse_action(
        ["dedup", "build", "db.dd", "--location", "/tmp/dd",
         "--input", "/tmp/docs.parquet", "--band-shards", "8"]
    )
    assert action.operation == "build" and action.band_shards == 8
    assert action.family == "text" and action.id_col is None
    with pytest.raises(C.CliError, match="needs --input"):
        C.parse_action(["dedup", "build", "db.dd", "--location", "/x"])
    with pytest.raises(C.CliError, match="needs --input"):
        C.parse_action(["dedup", "extend", "db.dd", "--location", "/x"])
    with pytest.raises(C.CliError, match="needs --dim"):
        C.parse_action(
            ["dedup", "build", "db.dd", "--location", "/x",
             "--family", "embedding", "--input", "/tmp/e.parquet"]
        )
    with pytest.raises(C.CliError):  # unknown operation rejected by argparse
        C.parse_action(["dedup", "explode", "db.dd", "--location", "/x"])
    _, va = C.parse_action(
        ["dedup", "vacuum-artifacts", "db.dd", "--location", "/x", "--apply"]
    )
    assert va.operation == "vacuum-artifacts" and va.apply


def test_dedup_lifecycle_end_to_end(spark, tmp_path):
    """build → extend --pairs → verify → rebuild → repair-pairs →
    vacuum-artifacts, all through the console surface; verify exits
    non-zero once the pair is torn by a single-table rollback."""
    import os

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    words = [
        F.concat(
            F.lit("w"),
            ((F.col("id") * F.lit(7 + 13 * j) + F.lit(j * j)) % 97).cast(
                "string"
            ),
        )
        for j in range(20)
    ]
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )
    src1 = str(tmp_path / "docs1.parquet")
    src2 = str(tmp_path / "docs2.parquet")
    docs.where("doc_id < 20").write.parquet(src1)
    # the extend batch re-uses doc 3's word pattern under a new id → a
    # guaranteed verified pair
    docs.where("doc_id >= 20").unionByName(
        docs.where("doc_id = 3").select(
            (F.col("doc_id") + 100).alias("doc_id"), "text"
        )
    ).write.parquet(src2)
    loc = str(tmp_path / "dd")

    client, console = make_client()
    assert C.run(
        ["dedup", "build", "db.dd", "--location", loc, "--input", src1,
         "--band-shards", "8", "--doc-shards", "4"],
        client, console, "u",
    ) == 0
    assert any("Built text dedup index 'db.dd'" in l for l in console.out)

    assert C.run(
        ["dedup", "extend", "db.dd", "--location", loc, "--input", src2,
         "--pairs"],
        client, console, "u",
    ) == 0
    ext = [l for l in console.out if "Extended text dedup index" in l]
    assert ext and "0 verified" not in ext[0]  # the planted pair was found

    assert C.run(
        ["dedup", "verify", "db.dd", "--location", loc], client, console, "u"
    ) == 0
    assert any("agree" in l for l in console.out)

    assert C.run(
        ["dedup", "rebuild", "db.dd", "--location", loc,
         "--band-shards", "16", "--pairs"],
        client, console, "u",
    ) == 0
    assert any("Rebuilt text dedup index" in l for l in console.out)
    assert C.run(
        ["dedup", "verify", "db.dd", "--location", loc], client, console, "u"
    ) == 0

    assert C.run(
        ["dedup", "repair-pairs", "db.dd", "--location", loc],
        client, console, "u",
    ) == 0
    assert any("nothing to repair" in l for l in console.out)

    # make the superseded builds' sidecars reclaimable, then sweep
    from chronicles_spark.core.model import (
        PartitionSchema, TableDefinition, TableName,
    )
    from chronicles_spark.spark.vacuum import vacuum as run_vacuum

    tdef = TableDefinition(
        TableName("db", "dd"), loc, PartitionSchema(("band_shard",))
    )
    run_vacuum(tdef, client.delegate.tracker, keep_last=1, dry_run=False)
    n_side = len(
        [f for f in os.listdir(loc) if f.startswith("_dedup_artifacts")]
    )
    console.out.clear()
    assert C.run(
        ["dedup", "vacuum-artifacts", "db.dd", "--location", loc],
        client, console, "u",
    ) == 0
    assert any("Would remove" in l for l in console.out)
    assert C.run(
        ["dedup", "vacuum-artifacts", "db.dd", "--location", loc, "--apply"],
        client, console, "u",
    ) == 0
    left = len(
        [f for f in os.listdir(loc) if f.startswith("_dedup_artifacts")]
    )
    assert left <= n_side

    # verify FAILS loudly (exit 1) once the doc store diverges: roll the
    # docs line back one commit so band rows outrun their shingles
    tracker = client.delegate.tracker
    docs_name = TableName("db", "dd_docs")
    ups = tracker.table_state(docs_name).updates
    tracker.set_current_version(docs_name, ups[1].metadata.commit_id)
    console.out.clear()
    assert C.run(
        ["dedup", "verify", "db.dd", "--location", loc], client, console, "u"
    ) == 1
    assert any("DISAGREE" in l for l in console.out or [])
    # ... and the next extend refuses the torn pair with exit 1, naming
    # the repair (TornPairError is an expected console outcome)
    console.err.clear()
    assert C.run(
        ["dedup", "extend", "db.dd", "--location", loc, "--input", src2],
        client, console, "u",
    ) == 1
    assert any("build_dedup_index" in l for l in console.err)


def test_dedup_embedding_cli_family(spark, tmp_path):
    """The embedding family rides the same verbs: build --family
    embedding --dim, extend, verify."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    emb = spark.range(24).select(
        F.col("id").alias("vec_id"),
        # +1 offset: vec_id=0 must not yield the all-zero vector (its
        # cosine is undefined — the one-shot operator rejects it too)
        F.array(*[
            F.sin((F.col("id") + 1) * F.lit(0.3 + j)).cast("float")
            for j in range(8)
        ]).alias("embedding"),
    )
    src1 = str(tmp_path / "e1.parquet")
    src2 = str(tmp_path / "e2.parquet")
    emb.where("vec_id < 16").write.parquet(src1)
    emb.where("vec_id >= 16").write.parquet(src2)
    loc = str(tmp_path / "edd")

    client, console = make_client()
    args = ["db.edd", "--location", loc, "--family", "embedding"]
    assert C.run(
        ["dedup", "build", *args, "--input", src1, "--dim", "8",
         "--n-planes", "8", "--bands", "4", "--band-shards", "8",
         "--doc-shards", "4"],
        client, console, "u",
    ) == 0
    assert any(
        "Built embedding dedup index 'db.edd'" in l for l in console.out
    )
    assert C.run(
        ["dedup", "extend", *args, "--input", src2, "--threshold", "0.99"],
        client, console, "u",
    ) == 0
    assert any(
        "Extended embedding dedup index" in l for l in console.out
    )
    assert C.run(
        ["dedup", "verify", *args], client, console, "u"
    ) == 0
    assert any("agree" in l for l in console.out)


def test_dedup_simhash_cli_family(spark, tmp_path):
    """The simhash family rides the same verbs: build --family simhash
    --bits, extend --max-hamming, verify, rebuild."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    words = [
        F.concat(
            F.lit("w"),
            ((F.col("id") * F.lit(5 + 11 * j) + F.lit(j)) % 89).cast("string"),
        )
        for j in range(16)
    ]
    docs = spark.range(24).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )
    src1 = str(tmp_path / "sd1.parquet")
    src2 = str(tmp_path / "sd2.parquet")
    docs.where("doc_id < 16").write.parquet(src1)
    docs.where("doc_id >= 16").write.parquet(src2)
    loc = str(tmp_path / "sdd")

    client, console = make_client()
    args = ["db.sdd", "--location", loc, "--family", "simhash"]
    assert C.run(
        ["dedup", "build", *args, "--input", src1, "--bits", "32",
         "--bands", "4", "--band-shards", "8", "--doc-shards", "4"],
        client, console, "u",
    ) == 0
    assert any(
        "Built simhash dedup index 'db.sdd'" in l for l in console.out
    )
    assert C.run(
        ["dedup", "extend", *args, "--input", src2, "--max-hamming", "2"],
        client, console, "u",
    ) == 0
    assert any(
        "Extended simhash dedup index" in l for l in console.out
    )
    assert C.run(["dedup", "verify", *args], client, console, "u") == 0
    assert any("agree" in l for l in console.out)
    assert C.run(
        ["dedup", "rebuild", *args, "--bands", "8", "--band-shards", "16"],
        client, console, "u",
    ) == 0
    assert C.run(["dedup", "verify", *args], client, console, "u") == 0


def test_dedup_rebuild_rejects_immutable_geometry_flags(spark, tmp_path):
    """ADVICE r9: 'dedup rebuild' used to silently DROP --width/--bits
    (the immutable, payload-defining fields); asking to change them now
    errors, pointing at a fresh build."""
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    loc = str(tmp_path / "dd")
    client, console = make_client()
    assert C.run(
        ["dedup", "rebuild", "db.dd", "--location", loc, "--width", "5"],
        client, console, "u",
    ) == 1
    assert any("--width cannot change" in l for l in console.err)
    console.err.clear()
    assert C.run(
        ["dedup", "rebuild", "db.dd", "--location", loc,
         "--family", "simhash", "--bits", "16"],
        client, console, "u",
    ) == 1
    assert any("--bits cannot change" in l for l in console.err)


def test_dedup_fold_clusters_end_to_end(spark, tmp_path):
    """Round-10: the cluster-index shell surface — build+extend journal
    pairs through the dedup verbs, then fold-clusters bootstraps the
    assignment table and consumes the journal exactly-once;
    verify-clusters exits 0 (and a re-fold is a no-op)."""
    import os as _os

    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    words = [
        F.concat(
            F.lit("w"),
            ((F.col("id") * F.lit(7 + 13 * j) + F.lit(j * j)) % 97).cast(
                "string"
            ),
        )
        for j in range(20)
    ]
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )
    src1 = str(tmp_path / "cdocs1.parquet")
    src2 = str(tmp_path / "cdocs2.parquet")
    docs.where("doc_id < 20").write.parquet(src1)
    docs.where("doc_id >= 20").unionByName(
        docs.where("doc_id = 3").select(
            (F.col("doc_id") + 100).alias("doc_id"), "text"
        )
    ).write.parquet(src2)
    loc = str(tmp_path / "cdd")
    cloc = str(tmp_path / "cclusters")

    client, console = make_client()
    assert C.run(
        ["dedup", "build", "db.cdd", "--location", loc, "--input", src1,
         "--band-shards", "8", "--doc-shards", "4"],
        client, console, "u",
    ) == 0
    assert C.run(
        ["dedup", "extend", "db.cdd", "--location", loc, "--input", src2,
         "--pairs"],
        client, console, "u",
    ) == 0

    # missing flags → parse error
    with pytest.raises(C.CliError, match="fold-clusters needs"):
        C.parse_action(
            ["dedup", "fold-clusters", "db.cdd_pairs", "--location", loc]
        )

    console.out.clear()
    assert C.run(
        ["dedup", "fold-clusters", "db.cdd_pairs",
         "--location", loc + "_pairs",
         "--clusters-table", "db.cclusters", "--clusters-location", cloc,
         "--doc-shards", "4", "--cluster-shards", "4"],
        client, console, "u",
    ) == 0
    assert any("Bootstrapped empty cluster index" in l for l in console.out)
    assert any("Folded 1 new pairs batch" in l for l in console.out)

    assert C.run(
        ["dedup", "verify-clusters", "db.cclusters", "--location", cloc],
        client, console, "u",
    ) == 0
    assert any("agree" in l for l in console.out)

    # second sweep: nothing new
    console.out.clear()
    assert C.run(
        ["dedup", "fold-clusters", "db.cdd_pairs",
         "--location", loc + "_pairs",
         "--clusters-table", "db.cclusters", "--clusters-location", cloc],
        client, console, "u",
    ) == 0
    assert any("Folded 0 new pairs batches" in l for l in console.out)

    # the planted duplicate (3, 103) landed as one cluster
    from chronicles_spark.core.model import (
        PartitionSchema, TableDefinition, TableName,
    )
    from chronicles_spark.operators import cluster_index as CX
    from chronicles_spark.spark.reader import read_version

    assign = TableDefinition(
        TableName("db", "cclusters"), cloc, PartitionSchema(("doc_shard",))
    )
    rows = dict(
        (r["doc_id"], r["cluster_id"])
        for r in read_version(
            spark, assign,
            client.delegate.tracker.current_version(assign.name),
            infer_partition_types=False,
        ).collect()
    )
    assert rows.get(103) == 3 and rows.get(3) == 3


def test_dedup_semantic_cli_family(spark, tmp_path):
    """Round-10: the SEMANTIC family rides the same verbs — build
    --family semantic --dim fits and pins centroids, extend finds the
    planted same-cluster duplicate, verify audits, rebuild refuses a
    quantizer change."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    vecs = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            F.sin((F.col("id") % 20 + 1) * F.lit(0.3 + 0.7 * j)).cast("float")
            for j in range(8)
        ]).alias("embedding"),
    )
    src1 = str(tmp_path / "vecs1.parquet")
    src2 = str(tmp_path / "vecs2.parquet")
    vecs.where("vec_id < 40").write.parquet(src1)
    vecs.where("vec_id >= 40").write.parquet(src2)  # id%20 twins of 0..19
    loc = str(tmp_path / "sdd")

    client, console = make_client()
    with pytest.raises(C.CliError, match="needs --dim"):
        C.parse_action(
            ["dedup", "build", "db.sdd", "--location", loc, "--input", src1,
             "--family", "semantic"]
        )
    assert C.run(
        ["dedup", "build", "db.sdd", "--location", loc, "--input", src1,
         "--family", "semantic", "--dim", "8", "--n-clusters", "4",
         "--band-shards", "4", "--doc-shards", "2"],
        client, console, "u",
    ) == 0
    assert any("Built semantic dedup index" in l for l in console.out)

    assert C.run(
        ["dedup", "extend", "db.sdd", "--location", loc, "--input", src2,
         "--family", "semantic", "--threshold", "0.99"],
        client, console, "u",
    ) == 0
    ext = [l for l in console.out if "Extended semantic dedup index" in l]
    assert ext and ", 0 verified" not in ext[0]  # the id%20 twins pair

    assert C.run(
        ["dedup", "verify", "db.sdd", "--location", loc,
         "--family", "semantic"],
        client, console, "u",
    ) == 0
    console.err.clear()
    assert C.run(
        ["dedup", "rebuild", "db.sdd", "--location", loc,
         "--family", "semantic", "--n-clusters", "8"],
        client, console, "u",
    ) == 1
    assert any("--n-clusters cannot change" in l for l in console.err)
    assert C.run(
        ["dedup", "rebuild", "db.sdd", "--location", loc,
         "--family", "semantic", "--band-shards", "8"],
        client, console, "u",
    ) == 0


def test_dedup_compact_pairs_cli(spark, tmp_path):
    """Round-11: ``dedup compact-pairs`` consolidates the journal's
    folded batch partitions from the shell — declines below the
    candidate floor, reports the consolidated partition, preserves the
    verify-clusters outcome, and validates its flags."""
    from pyspark.sql import functions as F

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    words = [
        F.concat(
            F.lit("w"),
            ((F.col("id") * F.lit(7 + 13 * j) + F.lit(j * j)) % 97).cast(
                "string"
            ),
        )
        for j in range(20)
    ]
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )
    src1 = str(tmp_path / "kdocs1.parquet")
    src2 = str(tmp_path / "kdocs2.parquet")
    src3 = str(tmp_path / "kdocs3.parquet")
    docs.where("doc_id < 15").write.parquet(src1)
    docs.where("doc_id >= 15 AND doc_id < 25").unionByName(
        docs.where("doc_id = 3").select(
            (F.col("doc_id") + 100).alias("doc_id"), "text"
        )
    ).write.parquet(src2)
    docs.where("doc_id >= 25").unionByName(
        docs.where("doc_id = 7").select(
            (F.col("doc_id") + 200).alias("doc_id"), "text"
        )
    ).write.parquet(src3)
    loc = str(tmp_path / "kdd")
    cloc = str(tmp_path / "kclusters")

    client, console = make_client()
    assert C.run(
        ["dedup", "build", "db.kdd", "--location", loc, "--input", src1,
         "--band-shards", "8", "--doc-shards", "4"],
        client, console, "u",
    ) == 0
    for src in (src2, src3):
        assert C.run(
            ["dedup", "extend", "db.kdd", "--location", loc, "--input", src,
             "--pairs"],
            client, console, "u",
        ) == 0

    with pytest.raises(C.CliError, match="compact-pairs needs"):
        C.parse_action(
            ["dedup", "compact-pairs", "db.kdd_pairs", "--location", loc]
        )

    # nothing folded yet → declined
    console.out.clear()
    assert C.run(
        ["dedup", "compact-pairs", "db.kdd_pairs",
         "--location", loc + "_pairs",
         "--clusters-table", "db.kclusters", "--clusters-location", cloc],
        client, console, "u",
    ) == 0
    assert any("Nothing to compact" in l for l in console.out)

    assert C.run(
        ["dedup", "fold-clusters", "db.kdd_pairs",
         "--location", loc + "_pairs",
         "--clusters-table", "db.kclusters", "--clusters-location", cloc,
         "--doc-shards", "4", "--cluster-shards", "4"],
        client, console, "u",
    ) == 0

    console.out.clear()
    assert C.run(
        ["dedup", "compact-pairs", "db.kdd_pairs",
         "--location", loc + "_pairs",
         "--clusters-table", "db.kclusters", "--clusters-location", cloc],
        client, console, "u",
    ) == 0
    assert any("Compacted folded journal partitions" in l for l in console.out)

    from chronicles_spark.core.model import (
        PartitionSchema, TableDefinition, TableName,
    )
    from chronicles_spark.operators import cluster_index as CX

    pt = TableDefinition(
        TableName("db", "kdd_pairs"), loc + "_pairs",
        PartitionSchema((CX.PAIRS_BATCH_COL,)),
    )
    st = client.delegate.tracker.current_version(pt.name)
    labels = [
        dict(p.column_values)[CX.PAIRS_BATCH_COL]
        for p in st.partition_versions
    ]
    assert len(labels) == 1 and labels[0].startswith(CX.FOLDED_BATCH_PREFIX)

    assert C.run(
        ["dedup", "verify-clusters", "db.kclusters", "--location", cloc],
        client, console, "u",
    ) == 0


def test_changes_verb():
    """Round-11: the CDC ops surface from the shell — one line per
    metastore operation in the (from, to] diff; default --to is head;
    unknown ids exit 1."""
    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import (
        AddPartitionVersion,
        RemovePartition,
        TableUpdate,
        TableUpdateMetadata,
    )
    from chronicles_spark.core.version import generate_version

    from chronicles_spark.core.model import TableName

    client, console = make_client()
    tracker = client.delegate.tracker
    T = TableName("db", "ch")
    tracker.init_table(T, is_snapshot=False, user_id="u")
    v1, v2, v3 = generate_version(), generate_version(), generate_version()
    m1 = TableUpdateMetadata.new("u", "c1")
    tracker.commit(
        T, TableUpdate(m1, (AddPartitionVersion(Partition.parse("d=1"), v1),))
    )
    m2 = TableUpdateMetadata.new("u", "c2")
    tracker.commit(
        T,
        TableUpdate(
            m2,
            (
                AddPartitionVersion(Partition.parse("d=2"), v2),
                AddPartitionVersion(Partition.parse("d=1"), v3),
            ),
        ),
    )
    m3 = TableUpdateMetadata.new("u", "c3")
    tracker.commit(
        T, TableUpdate(m3, (RemovePartition(Partition.parse("d=2")),))
    )

    console.out.clear()
    assert C.run(
        ["changes", "db.ch", "--from", m1.commit_id], client, console, "u"
    ) == 0
    out = "\n".join(console.out)
    assert f"update\td=1\t{v3.label}" in out
    assert "d=2" not in out or "add\td=2" not in out  # added then removed

    console.out.clear()
    assert C.run(
        ["changes", "db.ch", "--from", m1.commit_id, "--to", m2.commit_id],
        client, console, "u",
    ) == 0
    out = "\n".join(console.out)
    assert f"add\td=2\t{v2.label}" in out
    assert f"update\td=1\t{v3.label}" in out

    console.out.clear()
    assert C.run(
        ["changes", "db.ch", "--from", m3.commit_id], client, console, "u"
    ) == 0
    assert any("No changes" in l for l in console.out)

    assert C.run(
        ["changes", "db.ch", "--from", "nope"], client, console, "u"
    ) == 1


# -- archive verb (extension; trackers/files.py commit-log archival) ---------


def test_archive_parses_and_defaults_to_dry_run():
    _, action = C.parse_action(["archive", "db.t"])
    assert action == C.ArchiveAction(TableName("db", "t"), 2, None, False)
    _, action = C.parse_action(
        ["archive", "db.t", "--retain-checkpoints", "1",
         "--through-seq", "42", "--apply"]
    )
    assert action == C.ArchiveAction(TableName("db", "t"), 1, 42, True)


def test_archive_refuses_non_files_tracker():
    client, _ = make_client()  # in-memory tracker: nothing to archive
    with pytest.raises(C.CliError, match="files-backed"):
        client.archive(C.ArchiveAction(TableName("db", "t"), 2, None, True))


def test_archive_dry_run_then_apply(tmp_path):
    """End-to-end over a real commit-log directory: dry-run reports and
    deletes nothing; --apply packs the prefix, the current view is
    unchanged, and the live directory shrank."""
    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import (
        AddPartitionVersion,
        TableUpdate,
        TableUpdateMetadata,
    )
    from chronicles_spark.core.version import generate_version
    from chronicles_spark.trackers import FileBackedVersionTracker
    from chronicles_spark.versioned_metastore import VersionedMetastore

    console = C.CapturingConsole()
    tracker = FileBackedVersionTracker(str(tmp_path), checkpoint_interval=5)
    client = C.CliClient(
        VersionedMetastore(tracker, C.StubMetastore()), console
    )
    t = TableName("db", "ev")
    tracker.init_table(t, is_snapshot=False, user_id="u")
    for i in range(24):
        tracker.commit(
            t,
            TableUpdate(
                TableUpdateMetadata.new("u", f"w{i}"),
                (AddPartitionVersion(
                    Partition.parse(f"date=2019-01-{(i % 9) + 1:02d}"),
                    generate_version(),
                ),),
            ),
        )
    before = tracker.current_version(t)
    d = tracker._table_dir(t)
    n_live_before = sum(
        1 for n in tracker.fs.list_dir(d) if n.startswith("table_update_")
    )

    client.archive(C.ArchiveAction(t, 1, None, False))  # dry run
    assert "Would archive" in console.out[-1]
    assert sum(
        1 for n in tracker.fs.list_dir(d) if n.startswith("table_update_")
    ) == n_live_before

    client.archive(C.ArchiveAction(t, 1, None, True))  # apply
    assert "Archived" in console.out[-1]
    n_live_after = sum(
        1 for n in tracker.fs.list_dir(d) if n.startswith("table_update_")
    )
    assert n_live_after < n_live_before
    assert tracker.current_version(t) == before


# -- maintain verb (round 13: lake-wide maintenance sweep) --------------------


def test_maintain_parses_and_validates():
    _, action = C.parse_action(["maintain"])
    assert action == C.MaintainAction(False)
    _, action = C.parse_action(
        ["maintain", "--apply", "--retain-checkpoints", "1",
         "--keep-last", "2", "--location", "db.t=/data/t",
         "--skip-vacuum"]
    )
    assert action.apply and action.retain_checkpoints == 1
    assert action.keep_last == 2 and action.skip_vacuum
    assert action.locations == (("db.t", "/data/t"),)
    with pytest.raises(C.CliError, match="NAME=VALUE"):
        C.parse_action(["maintain", "--location", "no-equals-sign"])
    # compact mappings need locations for BOTH sides
    with pytest.raises(C.CliError, match="--location entries"):
        C.parse_action(
            ["maintain", "--compact-pairs", "db.p=db.a",
             "--location", "db.p=/data/p"]
        )


def test_maintain_memory_tracker_notes_archive_unsupported():
    client, console = make_client()
    client.delegate.init_table(TableName("db", "x"), False, "u", "init")
    client.maintain(C.MaintainAction(False), "u")
    assert any("archive: skipped" in line for line in console.out)
    assert any("db.x: would maintain" in line for line in console.out)


def test_maintain_dry_run_then_apply_sweeps_lake(tmp_path):
    """End-to-end over two real commit-log tables, one with a storage
    location: dry-run mutates nothing and reports; apply archives both
    logs and vacuums the located table's superseded version dirs."""
    import os

    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import (
        AddPartitionVersion,
        TableUpdate,
        TableUpdateMetadata,
    )
    from chronicles_spark.core.version import generate_version
    from chronicles_spark.trackers import FileBackedVersionTracker
    from chronicles_spark.versioned_metastore import VersionedMetastore

    console = C.CapturingConsole()
    tracker = FileBackedVersionTracker(
        str(tmp_path / "log"), checkpoint_interval=5
    )
    client = C.CliClient(
        VersionedMetastore(tracker, C.StubMetastore()), console
    )
    ta, tb = TableName("db", "a"), TableName("db", "b")
    data_root = str(tmp_path / "data_a")
    p = Partition.of(("p", "z"))
    versions = [generate_version() for _ in range(3)]
    tracker.init_table(ta, is_snapshot=False, user_id="u")
    tracker.init_table(tb, is_snapshot=False, user_id="u")
    for v in versions:  # superseded versions with real dirs (vacuum bait)
        tracker.commit(
            ta,
            TableUpdate(
                TableUpdateMetadata.new("u", "w"),
                (AddPartitionVersion(p, v),),
            ),
        )
        vd = os.path.join(data_root, "p=z", f"_version={v.label}")
        os.makedirs(vd)
        with open(os.path.join(vd, "part-0.parquet"), "wb") as f:
            f.write(b"x")
    for i in range(20):  # push checkpoints past the writes, both tables
        for t in (ta, tb):
            tracker.commit(
                t,
                TableUpdate(
                    TableUpdateMetadata.new("u", f"w{i}"),
                    (AddPartitionVersion(
                        Partition.of(("p", str(i % 4))), generate_version()
                    ),),
                ),
            )
    before_a = tracker.current_version(ta)
    before_b = tracker.current_version(tb)
    d_a = tracker._table_dir(ta)
    n_live = sum(
        1 for n in tracker.fs.list_dir(d_a) if n.startswith("table_update_")
    )

    dry = C.MaintainAction(
        False, retain_checkpoints=1, keep_last=1,
        locations=(("db.a", data_root),),
    )
    client.maintain(dry, "u")
    assert sum(
        1 for n in tracker.fs.list_dir(d_a) if n.startswith("table_update_")
    ) == n_live  # nothing deleted
    assert os.path.exists(
        os.path.join(data_root, "p=z", f"_version={versions[0].label}")
    )
    out = "\n".join(console.out)
    assert "db.a: would maintain" in out and "db.b: would maintain" in out
    assert "vacuum 2 version dir(s)" in out  # 3 versions, keep_last=1

    console.out.clear()
    client.maintain(
        C.MaintainAction(
            True, retain_checkpoints=1, keep_last=1,
            locations=(("db.a", data_root),),
        ),
        "u",
    )
    out = "\n".join(console.out)
    assert "db.a: maintained" in out and "db.b: maintained" in out
    assert sum(
        1 for n in tracker.fs.list_dir(d_a) if n.startswith("table_update_")
    ) < n_live  # archived
    assert not os.path.exists(
        os.path.join(data_root, "p=z", f"_version={versions[0].label}")
    )  # vacuumed
    assert os.path.exists(
        os.path.join(data_root, "p=z", f"_version={versions[-1].label}")
    )  # live version kept
    assert tracker.current_version(ta) == before_a
    assert tracker.current_version(tb) == before_b


def test_maintain_sweeps_dedup_sidecars_and_folds_journal(spark, tmp_path):
    """Round-14 directive #3: the fleet cron must also reclaim the DEDUP
    families' aged sidecars (one geometry sidecar per micro-batch at
    streaming cadence — running only `maintain` re-accumulated exactly
    those orphans) and catch the assignment table up with pending
    journal batches via --fold-clusters.  Dry-run reports the fold
    backlog from metadata alone and mutates nothing; apply folds
    exactly that backlog and sweeps the superseded build's sidecar."""
    from pyspark.sql import functions as F

    from chronicles_spark.core.model import (
        PartitionSchema,
        TableDefinition,
    )
    from chronicles_spark.operators import cluster_index as CX
    from chronicles_spark.operators import dedup_index as DX
    from chronicles_spark.trackers import FileBackedVersionTracker
    from chronicles_spark.versioned_metastore import VersionedMetastore

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    console = C.CapturingConsole()
    tracker = FileBackedVersionTracker(
        str(tmp_path / "log"), checkpoint_interval=5
    )
    client = C.CliClient(
        VersionedMetastore(tracker, C.StubMetastore()), console
    )
    words = [
        F.concat(
            F.lit("w"),
            ((F.col("id") * F.lit(7 + 13 * j) + F.lit(j * j)) % 97).cast(
                "string"
            ),
        )
        for j in range(20)
    ]
    docs = spark.range(30).select(
        F.col("id").alias("doc_id"), F.concat_ws(" ", *words).alias("text")
    )
    idx = TableDefinition(
        TableName("db", "mdd"), str(tmp_path / "mdd"),
        PartitionSchema((DX.BAND_SHARD_COL,)),
    )
    tracker.init_table(idx.name, is_snapshot=False, user_id="u")
    pt = DX.dedup_pairs_table(idx)
    _, a1 = DX.build_dedup_index(
        docs.where("doc_id < 20"), idx, tracker,
        band_shards=8, doc_shards=4,
    )
    _, _ = DX.build_dedup_index(  # supersedes a1: its sidecar becomes bait
        docs.where("doc_id < 20"), idx, tracker,
        band_shards=8, doc_shards=4, message="rebuild",
    )
    batch2 = docs.where("doc_id >= 20 AND doc_id < 25").unionByName(
        docs.where("doc_id = 3").select(
            (F.col("doc_id") + 100).alias("doc_id"), "text"
        )  # a real near-dup so the journal batch is non-empty
    )
    batch3 = docs.where("doc_id >= 25").unionByName(
        docs.where("doc_id = 7").select(
            (F.col("doc_id") + 200).alias("doc_id"), "text"
        )
    )
    DX.extend_dedup_index(  # lands TWO pending journal batches (the
        batch2, idx, tracker, threshold=0.5, pairs_table=pt,
    )  # second also feeds the same-sweep compaction below)
    DX.extend_dedup_index(
        batch3, idx, tracker, threshold=0.5, pairs_table=pt,
    )
    assign = TableDefinition(
        TableName("db", "massign"), str(tmp_path / "massign"),
        PartitionSchema((CX.DOC_SHARD_COL,)),
    )
    tracker.init_table(assign.name, is_snapshot=False, user_id="u")
    CX.build_dedup_clusters(
        None, assign, tracker, doc_shards=4, cluster_shards=4
    )
    fs, p1 = DX._artifact_path(idx, a1.version_label)
    assert fs.exists(p1)
    assert len(CX.pending_fold_labels(tracker, pt, assign)) == 2

    locs = (
        ("db.mdd", idx.location),
        ("db.mdd_pairs", pt.location),
        ("db.massign", assign.location),
    )
    fold = (("db.mdd_pairs", "db.massign"),)

    client.maintain(
        C.MaintainAction(
            False, retain_checkpoints=1, keep_last=1,
            locations=locs, fold_clusters=fold,
        ),
        "u",
    )
    out = "\n".join(console.out)
    assert (
        "db.mdd_pairs: would fold 2 pending journal batch(es) "
        "into db.massign"
    ) in out
    # dry-run mutated nothing: backlog still pending, sidecar still there
    assert len(CX.pending_fold_labels(tracker, pt, assign)) == 2
    assert fs.exists(p1)

    # ONE apply sweep: fold runs BEFORE compact, so the two batches it
    # folds are exactly what the same sweep's compaction consolidates
    console.out.clear()
    client.maintain(
        C.MaintainAction(
            True, retain_checkpoints=1, keep_last=1,
            locations=locs, fold_clusters=fold, compact_pairs=fold,
        ),
        "u",
    )
    out = "\n".join(console.out)
    assert "db.mdd_pairs: folded 2 journal batch(es) into db.massign" in out
    assert "db.mdd_pairs: compacted folded journal" in out
    assert not fs.exists(p1)  # superseded build's dedup sidecar reclaimed
    assert CX.pending_fold_labels(tracker, pt, assign) == []
    assert CX.verify_dedup_clusters(spark, assign, tracker).count() == 0
    # the journal is now ONE consolidated folded- partition
    jstate = tracker.current_version(pt.name)
    jvals = sorted(
        dict(p.column_values)["batch"] for p in jstate.partition_versions
    )
    assert len(jvals) == 1 and jvals[0].startswith(CX.FOLDED_BATCH_PREFIX)

    # steady state: the next sweep has nothing to fold or reclaim
    console.out.clear()
    client.maintain(
        C.MaintainAction(
            True, retain_checkpoints=1, keep_last=1,
            locations=locs, fold_clusters=fold,
        ),
        "u",
    )
    assert "db.mdd_pairs: no pending journal batches" in "\n".join(
        console.out
    )


def test_maintain_and_archive_report_lease_skip(tmp_path):
    """A sweep blocked by a competing archiver's live lease must say so —
    'archive 0 commit(s)' is indistinguishable from a genuine no-op, and
    an operator cannot tell the fleet cron was blocked by a (possibly
    crashed-and-not-yet-stale) competitor (r13 advice)."""
    import json as _json
    import time as _time

    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import (
        AddPartitionVersion,
        TableUpdate,
        TableUpdateMetadata,
    )
    from chronicles_spark.core.version import generate_version
    from chronicles_spark.trackers import FileBackedVersionTracker
    from chronicles_spark.versioned_metastore import VersionedMetastore

    console = C.CapturingConsole()
    tracker = FileBackedVersionTracker(
        str(tmp_path / "log"), checkpoint_interval=5
    )
    client = C.CliClient(
        VersionedMetastore(tracker, C.StubMetastore()), console
    )
    t = TableName("db", "busy")
    tracker.init_table(t, is_snapshot=False, user_id="u")
    for i in range(12):
        tracker.commit(
            t,
            TableUpdate(
                TableUpdateMetadata.new("u", f"w{i}"),
                (AddPartitionVersion(
                    Partition.of(("p", str(i % 4))), generate_version()
                ),),
            ),
        )
    lease = tracker.fs.join(tracker._table_dir(t), "_archive_lease")
    tracker.fs.write_text(
        lease, _json.dumps({"ts": _time.time(), "owner": "competitor"})
    )

    client.maintain(C.MaintainAction(True, retain_checkpoints=1), "u")
    out = "\n".join(console.out)
    assert "archive skipped (lease held)" in out
    assert "archive 0 commit(s)" not in out

    console.out.clear()
    client.archive(C.ArchiveAction(t, 1, None, apply=True))
    assert any("Archive skipped" in line and "lease" in line
               for line in console.out)

    # once the competitor releases, the same sweep archives for real
    tracker.fs.remove_file(lease)
    console.out.clear()
    client.maintain(C.MaintainAction(True, retain_checkpoints=1), "u")
    assert "archive skipped" not in "\n".join(console.out)


def test_maintain_is_fail_soft_per_table(tmp_path):
    """One torn table reports an ERROR line but the sweep continues to
    the remaining tables; the verb exits non-zero at the end."""
    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import (
        AddPartitionVersion,
        TableUpdate,
        TableUpdateMetadata,
    )
    from chronicles_spark.core.version import generate_version
    from chronicles_spark.trackers import FileBackedVersionTracker
    from chronicles_spark.versioned_metastore import VersionedMetastore

    console = C.CapturingConsole()
    tracker = FileBackedVersionTracker(
        str(tmp_path / "log"), checkpoint_interval=5
    )
    client = C.CliClient(
        VersionedMetastore(tracker, C.StubMetastore()), console
    )
    ta, tb = TableName("db", "bad"), TableName("db", "good")
    for t in (ta, tb):
        tracker.init_table(t, is_snapshot=False, user_id="u")
        for i in range(12):
            tracker.commit(
                t,
                TableUpdate(
                    TableUpdateMetadata.new("u", f"w{i}"),
                    (AddPartitionVersion(
                        Partition.of(("p", str(i % 4))), generate_version()
                    ),),
                ),
            )

    real = tracker.archive_commits

    def exploding(table, **kw):
        if table == ta:
            raise RuntimeError("torn log (injected)")
        return real(table, **kw)

    tracker.archive_commits = exploding
    with pytest.raises(C.CliError, match="1 error"):
        client.maintain(C.MaintainAction(True, retain_checkpoints=1), "u")
    out = "\n".join(console.out)
    assert "db.bad: maintained — ERROR RuntimeError" in out
    assert "db.good: maintained — archive" in out  # sweep continued


def test_maintain_compact_pairs_dry_run_reports_skip():
    client, console = make_client()
    action = C.MaintainAction(
        False, locations=(("db.p", "/x"), ("db.a", "/y")),
        compact_pairs=(("db.p", "db.a"),), skip_archive=True,
    )
    client.maintain(action, "u")
    assert any("compact-pairs skipped in dry-run" in line
               for line in console.out)


def test_maintain_compact_pairs_apply_dispatch(spark, tmp_path, monkeypatch):
    """The apply-path compact leg hands compact_dedup_pairs the right
    TableDefinitions (journal partitioned by batch, assignment by
    doc_shard, locations from the --location map) and reports the
    consolidated label; the heavy end-to-end compaction semantics live
    in tests/test_cluster_index.py."""
    from chronicles_spark.operators import cluster_index as CX
    from chronicles_spark.trackers import FileBackedVersionTracker
    from chronicles_spark.versioned_metastore import VersionedMetastore

    console = C.CapturingConsole()
    tracker = FileBackedVersionTracker(str(tmp_path / "log"))
    client = C.CliClient(
        VersionedMetastore(tracker, C.StubMetastore()), console
    )
    seen = {}

    def fake_compact(spark_, pairs_table, table, tracker_, user_id="x", **kw):
        seen["pairs"] = pairs_table
        seen["assign"] = table
        seen["user"] = user_id
        return "folded-v123"

    monkeypatch.setattr(CX, "compact_dedup_pairs", fake_compact)
    client.maintain(
        C.MaintainAction(
            True,
            locations=(("db.p", str(tmp_path / "p")),
                       ("db.a", str(tmp_path / "a"))),
            compact_pairs=(("db.p", "db.a"),),
            skip_archive=True, skip_vacuum=True,
        ),
        "maintainer",
    )
    assert seen["pairs"].name == TableName("db", "p")
    assert seen["pairs"].partition_schema.columns == (CX.PAIRS_BATCH_COL,)
    assert seen["assign"].name == TableName("db", "a")
    assert seen["assign"].partition_schema.columns == (CX.DOC_SHARD_COL,)
    assert seen["user"] == "maintainer"
    assert any("batch=folded-v123" in line for line in console.out)


def test_maintain_consolidate_rechunks_archives(tmp_path):
    """--consolidate re-chunks each table's existing archive generation
    in the sweep (the OPTIMIZE cadence at fleet scope)."""
    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import (
        AddPartitionVersion,
        TableUpdate,
        TableUpdateMetadata,
    )
    from chronicles_spark.core.version import generate_version
    from chronicles_spark.trackers import FileBackedVersionTracker
    from chronicles_spark.versioned_metastore import VersionedMetastore

    console = C.CapturingConsole()
    tracker = FileBackedVersionTracker(
        str(tmp_path / "log"), checkpoint_interval=5
    )
    client = C.CliClient(
        VersionedMetastore(tracker, C.StubMetastore()), console
    )
    t = TableName("db", "ev")
    tracker.init_table(t, is_snapshot=False, user_id="u")

    def grow(n):
        for i in range(n):
            tracker.commit(
                t,
                TableUpdate(
                    TableUpdateMetadata.new("u", f"w{i}"),
                    (AddPartitionVersion(
                        Partition.of(("p", str(i % 4))), generate_version()
                    ),),
                ),
            )

    grow(30)
    tracker.archive_commits(t, retain_checkpoints=1, max_chunk_bytes=4096)
    grow(30)
    tracker.archive_commits(t, retain_checkpoints=1, max_chunk_bytes=4096)
    d = tracker._table_dir(t)
    gen1 = {n for n in tracker.fs.list_dir(d) if n.startswith("archive_")}
    assert len(gen1) >= 2
    before = tracker.current_version(t)

    client.maintain(
        C.MaintainAction(True, retain_checkpoints=1, consolidate=True),
        "u",
    )
    gen2 = {n for n in tracker.fs.list_dir(d) if n.startswith("archive_")}
    assert gen2.isdisjoint(gen1) and len(gen2) == 1  # re-chunked at 32 MiB
    assert tracker.current_version(t) == before


def test_maintain_sweep_orphans_end_to_end(tmp_path):
    """--sweep-orphans extends the vacuum leg to crashed-write debris
    (version directories no commit ever recorded) once aged past
    --orphan-min-age-days; without the flag they are left alone."""
    import os

    from chronicles_spark.core.model import Partition
    from chronicles_spark.core.ops import (
        AddPartitionVersion,
        TableUpdate,
        TableUpdateMetadata,
    )
    from chronicles_spark.core.version import generate_version
    from chronicles_spark.trackers import FileBackedVersionTracker
    from chronicles_spark.versioned_metastore import VersionedMetastore

    console = C.CapturingConsole()
    tracker = FileBackedVersionTracker(
        str(tmp_path / "log"), checkpoint_interval=5
    )
    client = C.CliClient(
        VersionedMetastore(tracker, C.StubMetastore()), console
    )
    t = TableName("db", "ev")
    data_root = str(tmp_path / "data")
    tracker.init_table(t, is_snapshot=False, user_id="u")
    v_live = generate_version()
    tracker.commit(
        t,
        TableUpdate(
            TableUpdateMetadata.new("u", "w"),
            (AddPartitionVersion(Partition.of(("p", "z")), v_live),),
        ),
    )
    live_dir = os.path.join(data_root, "p=z", f"_version={v_live.label}")
    os.makedirs(live_dir)
    # crashed-write debris: a version directory no commit ever recorded
    orphan = os.path.join(
        data_root, "p=z", f"_version={generate_version().label}"
    )
    os.makedirs(orphan)
    with open(os.path.join(orphan, "part-0.parquet"), "wb") as f:
        f.write(b"x")

    base = dict(
        locations=(("db.ev", data_root),), skip_archive=True,
    )
    client.maintain(C.MaintainAction(True, **base), "u")
    assert os.path.exists(orphan)  # no flag: debris untouched

    client.maintain(
        C.MaintainAction(
            True, **base, sweep_orphans=True, orphan_min_age_days=0.0
        ),
        "u",
    )
    assert not os.path.exists(orphan)  # swept
    assert os.path.exists(live_dir)  # the committed version survives
