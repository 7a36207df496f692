"""Pair-marker protocol: the opaque commit-message suffix that binds a
paired table and its derived companion to one logical publish.

Lives in ``core`` (not ``operators.pairing``) because the trackers'
fold CHECKPOINTS record the newest marker of their folded prefix — the
piece that makes the index families' read-modify-write base resolution
O(tail) instead of O(commit history) (``head_resolution`` on the files
and sqlite trackers).  :mod:`chronicles_spark.operators.pairing`
re-exports these names; the marker spelling is a protocol property
shared by every family.

No reference counterpart: stettix/chronicles commits one table at a
time (core/.../VersionTracker.scala); pairing is this repo's extension.
"""

from __future__ import annotations

PAIR_MARKER_PREFIX = " [ann-pair:"


def pair_message(message: str, version_label: str) -> str:
    """Stamp a pair commit's message with the shared pair marker — the
    cheap hot-path pairing check reads it back from both heads."""
    return f"{message}{PAIR_MARKER_PREFIX}{version_label}]"


def pair_label(message: "str | None") -> "str | None":
    """The pair marker's label, or None for unmarked (pre-marker legacy
    or non-pair) commits."""
    if not message or not message.endswith("]"):
        return None
    i = message.rfind(PAIR_MARKER_PREFIX)
    if i < 0:
        return None
    return message[i + len(PAIR_MARKER_PREFIX):-1]
