"""Commit-log (VersionTracker) backends.

Three interchangeable backends mirroring the reference's
(core/.../InMemoryVersionTracker.scala, files/.../FileBackedVersionTracker.scala,
db/.../DbVersionTracker.scala): in-memory dict, filesystem JSON commit
files, and sqlite (the serializable option).
"""

from .base import (
    CommitConflictError,
    TableState,
    UnknownCommitError,
    UnknownTableError,
    UnknownTagError,
    VersionTracker,
)
from .memory import InMemoryVersionTracker
from .files import FileBackedVersionTracker
from .sqlite import SqliteVersionTracker


def tracker_for_url(root: str) -> VersionTracker:
    """Commit-log root URL/path → tracker.

    * ``sqlite://<path>`` (path taken verbatim after the scheme) or a bare
      path ending in ``.db`` / ``.sqlite`` / ``.sqlite3`` →
      :class:`SqliteVersionTracker`
    * anything else (directory path, ``memory://``, fsspec URL) →
      :class:`FileBackedVersionTracker`

    This is the single string-configurable entry point used by surfaces
    that can only carry a string (the ``chronicles`` data source's ``root``
    option, CLI config), so both batch and streaming reads work against
    either log backend.
    """
    root = str(root)
    if root.startswith("sqlite://"):
        return SqliteVersionTracker(root[len("sqlite://"):] or ":memory:")
    # the suffix sniff applies ONLY to scheme-less local paths: a
    # memory://…/log.db or s3://…/x.db root is a FILE-backed log on that
    # store, and sqlite3.connect cannot open URLs anyway
    if "://" not in root and root.rsplit("/", 1)[-1].endswith(
        (".db", ".sqlite", ".sqlite3")
    ):
        return SqliteVersionTracker(root)
    return FileBackedVersionTracker(root)


__all__ = [
    "tracker_for_url",
    "VersionTracker",
    "TableState",
    "UnknownTableError",
    "UnknownCommitError",
    "UnknownTagError",
    "CommitConflictError",
    "InMemoryVersionTracker",
    "FileBackedVersionTracker",
    "SqliteVersionTracker",
]
