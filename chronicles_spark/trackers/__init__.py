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
    VersionTracker,
)
from .memory import InMemoryVersionTracker
from .files import FileBackedVersionTracker
from .sqlite import SqliteVersionTracker

__all__ = [
    "VersionTracker",
    "TableState",
    "UnknownTableError",
    "UnknownCommitError",
    "CommitConflictError",
    "InMemoryVersionTracker",
    "FileBackedVersionTracker",
    "SqliteVersionTracker",
]
