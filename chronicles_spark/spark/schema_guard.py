"""Schema enforcement for the versioned write path.

The reference scopes schema EVOLUTION out entirely (README.md:48-50) and
keeps whatever schema each engine's DDL declares (§1.3 of SURVEY).  That
is fine for a metastore-fronted table, but the metastore-free read path
(`read_current`) unions version directories directly — and Parquet scans
take their schema from one footer unless ``mergeSchema`` is on, so a
write that silently changes a column's type (or drops one) breaks every
subsequent current-view read in a way the writer never sees.

This module adds Delta-style schema enforcement as an OPT-IN write guard:

* ``schema_mode="strict"``   — the incoming DataFrame must carry exactly
  the recorded columns (order-insensitive, case-insensitive names, exact
  Spark types).  Any add / drop / type change raises
  :class:`SchemaDriftError` BEFORE any bytes are written.
* ``schema_mode="additive"`` — new columns are allowed (old files read
  back with nulls under ``mergeSchema``); drops and type changes raise.
* ``schema_mode="off"``      — reference behavior, nothing recorded.

State lives in ONE JSON file at ``<table>/_chronicles_schema.json``
(underscore-prefixed, so Spark's data scans ignore it; the vacuum orphan
sweep only descends into ``col=`` directories, so it never touches it).
The file holds the current schema plus an audit trail of every schema
CHANGE (not every write), each stamped with the data version label that
introduced it.

Scale note: the guard is one tiny FS read + an in-driver dict compare —
O(#columns), zero Spark jobs, zero data scans.  It adds no work to the
100 TB write itself.
"""

from __future__ import annotations

import json
from typing import List, Optional, Tuple

from pyspark.sql import types as T

from ..core.model import TableDefinition
from ..core.paths import VERSION_COLUMN
from ..trackers.fs import filesystem_for

SCHEMA_FILE = "_chronicles_schema.json"
SCHEMA_MODES = ("off", "additive", "strict")


class SchemaDriftError(ValueError):
    """Incoming DataFrame schema is incompatible with the recorded table
    schema under the requested ``schema_mode``."""

    def __init__(self, table_name, problems: List[str], mode: str):
        self.problems = list(problems)
        super().__init__(
            f"schema drift on {table_name} (mode={mode}): " + "; ".join(problems)
        )


def _schema_path(table: TableDefinition) -> Tuple[object, str]:
    """Sidecar path — keyed by BRANCH for branch tables, so a guarded
    branch write can never advance main's recorded schema before the
    branch is audited and merged (branch isolation extends to schema
    state)."""
    from ..branching import parse_branch

    fs, root = filesystem_for(table.location)
    parsed = parse_branch(table.name)
    if parsed is None:
        return fs, fs.join(root, SCHEMA_FILE)
    stem, ext = SCHEMA_FILE.rsplit(".", 1)
    return fs, fs.join(root, f"{stem}__branch_{parsed[1]}.{ext}")


def _normalized_fields(schema: T.StructType) -> dict:
    """name(lower) → canonical type JSON, excluding the ``_version`` stamp.

    Nullability is deliberately ignored: Parquet round-trips make
    everything nullable, so enforcing it would reject every re-write of
    data that was just read back.
    """
    out = {}
    for f in schema.fields:
        if f.name == VERSION_COLUMN:
            continue
        out[f.name.lower()] = f.dataType.json()
    return out


def stored_schema(table: TableDefinition) -> Optional[T.StructType]:
    """The recorded current schema, or None if never recorded."""
    doc = _load(table)
    if doc is None:
        return None
    return T.StructType.fromJson(doc["current"])


def schema_history(table: TableDefinition) -> List[dict]:
    """Audit trail: one entry per schema change, oldest first, each
    ``{"version": <data version label>, "schema": <StructType json>}``."""
    doc = _load(table)
    return list(doc["history"]) if doc else []


def _load(table: TableDefinition) -> Optional[dict]:
    fs, path = _schema_path(table)
    if not fs.exists(path):
        # a branch with no sidecar of its own INHERITS the source table's
        # recorded schema — the first guarded branch write is checked
        # against what main enforces, not against a blank slate
        from ..branching import parse_branch

        parsed = parse_branch(table.name)
        if parsed is not None:
            main_path = fs.join(
                filesystem_for(table.location)[1], SCHEMA_FILE
            )
            if fs.exists(main_path):
                return json.loads(fs.read_text(main_path))
        return None
    return json.loads(fs.read_text(path))


def check_schema(table: TableDefinition, df_schema: T.StructType, mode: str) -> bool:
    """Validate ``df_schema`` against the recorded schema.

    Returns True when the recorded schema must be updated after the write
    (first write, or an additive change); raises SchemaDriftError on any
    incompatible change.  ``mode="off"`` always returns False.
    """
    if mode not in SCHEMA_MODES:
        raise ValueError(f"schema_mode must be one of {SCHEMA_MODES}, got {mode!r}")
    if mode == "off":
        return False
    doc = _load(table)
    if doc is None:
        return True  # first guarded write records the schema
    recorded = _normalized_fields(T.StructType.fromJson(doc["current"]))
    incoming = _normalized_fields(df_schema)

    problems: List[str] = []
    added = sorted(set(incoming) - set(recorded))
    dropped = sorted(set(recorded) - set(incoming))
    changed = sorted(
        n for n in set(incoming) & set(recorded) if incoming[n] != recorded[n]
    )
    for n in changed:
        old_t = T._parse_datatype_json_string(recorded[n]).simpleString()
        new_t = T._parse_datatype_json_string(incoming[n]).simpleString()
        problems.append(f"column {n!r} type changed {old_t} -> {new_t}")
    if dropped:
        problems.append(f"columns dropped: {', '.join(dropped)}")
    if added and mode == "strict":
        problems.append(f"columns added: {', '.join(added)}")
    if problems:
        raise SchemaDriftError(table.name, problems, mode)
    return bool(added)


def promote_schema(
    main_table: TableDefinition, branch_table: TableDefinition, label: str
) -> bool:
    """Adopt a branch's recorded schema as main's on publish (merge).

    Returns True when main's sidecar was advanced; no-op when the branch
    never recorded one or both already agree."""
    fs, branch_path = _schema_path(branch_table)
    if not fs.exists(branch_path):
        return False
    bdoc = json.loads(fs.read_text(branch_path))
    mdoc = _load(main_table)
    if mdoc is not None and mdoc["current"] == bdoc["current"]:
        return False
    record_schema(
        main_table, T.StructType.fromJson(bdoc["current"]), label
    )
    return True


def drop_branch_schema(branch_table: TableDefinition) -> None:
    """Remove a branch's sidecar (branch deleted or published)."""
    fs, path = _schema_path(branch_table)
    if fs.exists(path):
        fs.remove_file(path)


def record_schema(
    table: TableDefinition, df_schema: T.StructType, version_label: str
) -> None:
    """Persist ``df_schema`` as the current schema, appending to the audit
    trail.  Call AFTER the commit succeeds so a failed write never
    advances the recorded schema.

    Concurrency: this is a read-modify-write of one small JSON file and
    follows the tracker's documented stance — last-writer-wins by default.
    Two concurrent ADDITIVE writers that each pass the guard can race the
    sidecar update; the loser's column reappears in the record on its next
    write (data files are unaffected — the guard gates writes, the record
    is advisory state).  Serialized-commit backends (files+flock, sqlite)
    serialize the whole write path around it."""
    fields = [f for f in df_schema.fields if f.name != VERSION_COLUMN]
    clean = T.StructType(fields).jsonValue()
    doc = _load(table) or {"current": None, "history": []}
    doc["current"] = clean
    doc["history"].append({"version": version_label, "schema": clean})
    fs, path = _schema_path(table)
    fs.write_text(path, json.dumps(doc, indent=1, sort_keys=True))
